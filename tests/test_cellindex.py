import numpy as np

from unmixing_ray import cellindex as ci


def test_roundtrip():
    rng = np.random.default_rng(3)
    for level in (0, 5, 12, 20, 28):
        n = 2 ** level
        ix = rng.integers(0, n, 100).astype(np.uint64)
        iy = rng.integers(0, n, 100).astype(np.uint64)
        cells = ci.cell_from_ixiy(ix, iy, level)
        jx, jy, lv = ci.cell_to_ixiy(cells)
        assert (jx == ix.astype(np.int64)).all()
        assert (jy == iy.astype(np.int64)).all()
        assert (lv == level).all()


def test_cell_of_xy_and_bounds():
    level = 12
    edge = ci.cell_edge(level)
    x = np.array([0.0, edge - 1, edge, 10 * edge + 5])
    y = np.array([0.0, 0.0, edge + 1, 3 * edge])
    cells = ci.cell_of_xy(x, y, level)
    ix, iy, lv = ci.cell_to_ixiy(cells)
    assert ix.tolist() == [0, 0, 1, 10]
    assert iy.tolist() == [0, 0, 1, 3]
    xmin, ymin, xmax, ymax = ci.cell_bounds(cells)
    assert (x >= xmin).all() and (x < xmax).all()
    assert (y >= ymin).all() and (y < ymax).all()


def test_parent_children_neighbors():
    c = int(ci.cell_from_ixiy(np.uint64(6), np.uint64(9), 5))
    p = int(ci.parent(np.uint64(c)))
    pix, piy, plv = ci.cell_to_ixiy(np.uint64(p))
    assert (int(pix), int(piy), int(plv)) == (3, 4, 4)
    kids = ci.children(p)
    assert c in kids and len(kids) == 4
    nb = ci.neighbors(c)
    assert len(nb) == 8 and c not in nb
    nb2 = ci.neighbors(c, ring=2)
    assert len(nb2) == 24


def test_cover_bbox():
    level = 10
    edge = ci.cell_edge(level)
    cells = ci.cover_bbox(0.5 * edge, 0.5 * edge, 2.5 * edge, 1.5 * edge,
                          level)
    assert len(cells) == 3 * 2
    # determinism
    assert cells == ci.cover_bbox(0.5 * edge, 0.5 * edge, 2.5 * edge,
                                  1.5 * edge, level)
