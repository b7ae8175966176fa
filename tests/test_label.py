"""Distributed raster connected-component labeling: the tile-wise
engine (local labels + halo-exchange border merge + distributed CC)
must equal an independent full-image union-find — including adversarial
serpentine masks that maximize propagation diameter."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from tests.test_focal import _tiles_table


def _full_ccl_stats(mask):
    """Independent union-find over a 2-D bool mask: (n_components,
    n_masked, max_size), or None if no masked pixel."""
    if not mask.any():
        return None
    H, W = mask.shape
    parent = np.arange(H * W, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    idx = np.arange(H * W).reshape(H, W)
    hm = mask[:, :-1] & mask[:, 1:]
    vm = mask[:-1, :] & mask[1:, :]
    for a, b in zip(idx[:, :-1][hm], idx[:, 1:][hm]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in zip(idx[:-1, :][vm], idx[1:, :][vm]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(x) for x in np.flatnonzero(mask.ravel())])
    _, counts = np.unique(roots, return_counts=True)
    return len(counts), int(counts.sum()), int(counts.max())


def _as_images(masks, lo=0, thr=1000):
    """bool masks -> single-band int16 images: masked px > thr."""
    out = {}
    for name, m in masks.items():
        img = np.where(m, np.int16(thr + 500), np.int16(lo))
        out[name] = img[None, :, :]
    return out


def _run(images, T, batch_size, thr=1000, **kw):
    from unmixing_ray.stages.label import raster_components
    t = _tiles_table(images, T)
    return raster_components(
        ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=batch_size),
        threshold=thr, **kw).to_pandas().set_index("image_id")


@pytest.mark.parametrize("batch_size", [1, 7, 64])
def test_components_match_full_image(ray_session, batch_size):
    rng = np.random.default_rng(21)
    masks = {
        "rand%d" % i: rng.random((24, 16)) < p
        for i, p in enumerate((0.3, 0.5, 0.7))}
    masks["full"] = np.ones((8, 8), bool)
    masks["empty"] = np.zeros((8, 8), bool)
    images = _as_images(masks)
    got = _run(images, T=8, batch_size=batch_size)
    n_expected = 0
    for name, m in masks.items():
        want = _full_ccl_stats(m)
        if want is None:
            assert name not in got.index
            continue
        n_expected += 1
        row = got.loc[name]
        assert (row["n_components"], row["n_masked"], row["max_size"]) \
            == want, name
    assert len(got) == n_expected


def test_components_serpentine(ray_session):
    """One snake winding through every tile: a single component whose
    merge chain crosses every border — the worst case for both the
    local propagation and the distributed merge."""
    H = W = 32
    m = np.zeros((H, W), bool)
    for r in range(0, H, 4):
        m[r, :] = True
        if r + 4 < H:
            m[r:r + 4, W - 1 if (r // 4) % 2 == 0 else 0] = True
    images = _as_images({"snake": m})
    got = _run(images, T=8, batch_size=3)
    want = _full_ccl_stats(m)
    row = got.loc["snake"]
    assert (row["n_components"], row["n_masked"], row["max_size"]) == want
    assert row["n_components"] == 1


def test_components_checkerboard_singletons(ray_session):
    """4-connectivity: a checkerboard is all singletons (8-conn would
    merge them)."""
    m = np.indices((16, 16)).sum(axis=0) % 2 == 0
    images = _as_images({"cb": m})
    got = _run(images, T=8, batch_size=64)
    row = got.loc["cb"]
    assert row["n_components"] == int(m.sum())
    assert row["max_size"] == 1


def test_components_distributed_resolve_path(ray_session):
    """driver_edge_cap=0 forces the border merge through the
    distributed connected-components resolver — result must be
    identical to the driver union-find fast path."""
    rng = np.random.default_rng(9)
    m = rng.random((16, 16)) < 0.55
    images = _as_images({"d": m})
    got = _run(images, T=8, batch_size=2, driver_edge_cap=0)
    row = got.loc["d"]
    want = _full_ccl_stats(m)
    assert (row["n_components"], row["n_masked"], row["max_size"]) == want


def test_label_stack_kernel():
    from unmixing_ray.stages.label import label_components_stack
    rng = np.random.default_rng(3)
    masks = rng.random((5, 12, 9)) < 0.55
    labs = label_components_stack(masks)
    for k in range(5):
        m, la = masks[k], labs[k]
        stats = _full_ccl_stats(m)
        got_roots = np.unique(la[m])
        assert len(got_roots) == stats[0]
        # label value is the component's min flat index
        for r in got_roots:
            assert m.ravel()[r]
