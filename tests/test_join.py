"""Spatial join stages through Ray, verified against brute force and
the DuckDB range-join oracle."""

import os

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from unmixing_ray.sources import images as src
from unmixing_ray.sources import synth
from unmixing_ray.stages import decode as dstage
from unmixing_ray.stages import join as jstage

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def tiles_and_polygons(small_corpus):
    ds = src.read_images(small_corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
    polygons = pq.read_table(os.path.join(small_corpus, "polygons.parquet"))
    return small_corpus, tiles, polygons


def test_broadcast_join_pip_matches_duckdb(tiles_and_polygons):
    corpus, tiles, polygons = tiles_and_polygons
    joined = jstage.broadcast_spatial_join(tiles, polygons, k=2)
    df = joined.to_pandas()
    pip = df[df["kind"] == "pip"][["tile_id", "poly_id"]]\
        .sort_values(["tile_id", "poly_id"]).reset_index(drop=True)
    oracle = duckdb.sql(f"""
        SELECT t.tile_id, p.poly_id
        FROM read_parquet('{corpus}/tiles_expected.parquet') t
        JOIN read_parquet('{corpus}/polygons.parquet') p
          ON t.cx BETWEEN p.xmin AND p.xmax
         AND t.cy BETWEEN p.ymin AND p.ymax
        ORDER BY t.tile_id, p.poly_id
    """).df()
    assert len(pip) == len(oracle)
    assert pip["tile_id"].tolist() == oracle["tile_id"].tolist()
    assert pip["poly_id"].tolist() == oracle["poly_id"].tolist()
    assert len(pip) > 0   # the corpus plants intersecting polygons


def test_broadcast_join_knn_matches_duckdb(tiles_and_polygons):
    corpus, tiles, polygons = tiles_and_polygons
    joined = jstage.broadcast_spatial_join(tiles, polygons, k=2)
    df = joined.to_pandas()
    knn = df[df["kind"] == "knn"][["tile_id", "rank", "poly_id", "dist"]]\
        .sort_values(["tile_id", "rank"]).reset_index(drop=True)
    oracle = duckdb.sql(f"""
        WITH d AS (
          SELECT t.tile_id, p.poly_id,
                 sqrt((t.cx-p.cx)*(t.cx-p.cx)+(t.cy-p.cy)*(t.cy-p.cy))
                   AS dist,
                 row_number() OVER (
                   PARTITION BY t.tile_id
                   ORDER BY sqrt((t.cx-p.cx)*(t.cx-p.cx)
                                +(t.cy-p.cy)*(t.cy-p.cy)), p.poly_id)
                   AS rn
          FROM read_parquet('{corpus}/tiles_expected.parquet') t
          CROSS JOIN read_parquet('{corpus}/polygons.parquet') p)
        SELECT tile_id, rn - 1 AS rank, poly_id, dist FROM d
        WHERE rn <= 2 ORDER BY tile_id, rn
    """).df()
    assert len(knn) == len(oracle)
    assert knn["poly_id"].tolist() == oracle["poly_id"].tolist()
    assert np.allclose(knn["dist"].to_numpy(), oracle["dist"].to_numpy())


def test_partitioned_join_pip_equals_broadcast(tiles_and_polygons):
    corpus, tiles, polygons = tiles_and_polygons
    b = jstage.broadcast_spatial_join(tiles, polygons, k=0).to_pandas()
    p = jstage.partitioned_spatial_join(
        tiles, polygons, synth.CELL_LEVEL, k=0).to_pandas()
    bp = b[b["kind"] == "pip"].sort_values(["tile_id", "poly_id"])
    pp = p[p["kind"] == "pip"].sort_values(["tile_id", "poly_id"])
    assert bp["tile_id"].tolist() == pp["tile_id"].tolist()
    assert bp["poly_id"].tolist() == pp["poly_id"].tolist()


def test_partitioned_join_knn_exact_equals_broadcast(tiles_and_polygons):
    """exact=True must reproduce the broadcast (ground-truth) kNN even
    with knn_ring=0, where ring replication alone misses most neighbors
    and nearly every tile takes the bounded re-probe path."""
    corpus, tiles, polygons = tiles_and_polygons
    b = jstage.broadcast_spatial_join(tiles, polygons, k=2).to_pandas()
    p = jstage.partitioned_spatial_join(
        tiles, polygons, synth.CELL_LEVEL, k=2, knn_ring=0,
        exact=True).to_pandas()
    bk = b[b["kind"] == "knn"].sort_values(["tile_id", "rank"])\
        .reset_index(drop=True)
    pk = p[p["kind"] == "knn"].sort_values(["tile_id", "rank"])\
        .reset_index(drop=True)
    assert (p["kind"] == "knn_miss").sum() == 0
    assert len(bk) == len(pk)
    assert bk["tile_id"].tolist() == pk["tile_id"].tolist()
    assert bk["poly_id"].tolist() == pk["poly_id"].tolist()
    assert np.allclose(bk["dist"].to_numpy(), pk["dist"].to_numpy())


def test_partitioned_join_knn_exact_ring1(tiles_and_polygons):
    """With the default ring the guard should mostly pass in-partition,
    and the result must still equal broadcast exactly."""
    corpus, tiles, polygons = tiles_and_polygons
    b = jstage.broadcast_spatial_join(tiles, polygons, k=2).to_pandas()
    p = jstage.partitioned_spatial_join(
        tiles, polygons, synth.CELL_LEVEL, k=2, knn_ring=1,
        exact=True).to_pandas()
    bk = b[b["kind"] == "knn"].sort_values(["tile_id", "rank"])\
        .reset_index(drop=True)
    pk = p[p["kind"] == "knn"].sort_values(["tile_id", "rank"])\
        .reset_index(drop=True)
    assert bk["poly_id"].tolist() == pk["poly_id"].tolist()


def _brute_box_pairs(polys):
    """Driver-side O(n²) oracle for the box-intersection join."""
    df = polys.to_pandas() if hasattr(polys, "to_pandas") else polys
    x0 = df["xmin"].to_numpy(); x1 = df["xmax"].to_numpy()
    y0 = df["ymin"].to_numpy(); y1 = df["ymax"].to_numpy()
    pid = df["poly_id"].to_numpy()
    ii, jj = np.triu_indices(len(df), 1)
    iw = np.minimum(x1[ii], x1[jj]) - np.maximum(x0[ii], x0[jj])
    ih = np.minimum(y1[ii], y1[jj]) - np.maximum(y0[ii], y0[jj])
    keep = (iw > 0) & (ih > 0)
    rows = []
    for i, j, w, h in zip(ii[keep], jj[keep], iw[keep], ih[keep]):
        a, b = sorted((pid[i], pid[j]))
        rows.append((a, b, int(round(w * 2)) * int(round(h * 2))))
    return sorted(rows)


def test_box_intersection_join_matches_brute_force(tiles_and_polygons):
    """Grid-partitioned pair set == driver all-pairs, at THREE grid
    levels (coarser/default/finer): the reference-point dedup must make
    the answer independent of the partitioning granularity."""
    import ray.data
    corpus, _tiles, polygons = tiles_and_polygons
    want = _brute_box_pairs(polygons)
    assert len(want) > 0
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    for level in (10, synth.CELL_LEVEL, 13):
        got = jstage.box_intersection_join(polys, level=level)\
            .to_pandas()
        rows = sorted(zip(got["poly_a"], got["poly_b"],
                          got["area_x4"].astype(int)))
        assert rows == want, level


def test_box_overlap_join_two_tables(tiles_and_polygons):
    """tiles × polygons overlap pairs == driver brute force, at two
    grid levels (dedup must make the answer level-independent); the
    total overlap area per polygon can never exceed the polygon area."""
    import ray.data
    corpus, tiles, polygons = tiles_and_polygons
    # tile extents from the lattice sidecar (driver-side truth)
    exp = pq.read_table(os.path.join(corpus, "tiles_expected.parquet"))\
        .to_pandas()
    t = {
        "id": exp["tile_id"].to_numpy(),
        "x0": exp["gt0"].to_numpy(),
        "x1": (exp["gt0"] + 32 * exp["gt1"]).to_numpy(),
        "y0": (exp["gt3"] + 32 * exp["gt5"]).to_numpy(),
        "y1": exp["gt3"].to_numpy()}
    p = polygons.to_pandas()
    want = set()
    for i in range(len(p)):
        iw = np.minimum(t["x1"], p["xmax"][i]) \
            - np.maximum(t["x0"], p["xmin"][i])
        ih = np.minimum(t["y1"], p["ymax"][i]) \
            - np.maximum(t["y0"], p["ymin"][i])
        hit = (iw > 0) & (ih > 0)
        for j in np.flatnonzero(hit):
            want.add((t["id"][j], p["poly_id"][i],
                      int(round(iw[j] * 2)) * int(round(ih[j] * 2))))
    assert len(want) > 0
    import pandas as _pd
    boxes = ray.data.from_pandas(_pd.DataFrame({
        "tile_id": t["id"], "xmin": t["x0"], "ymin": t["y0"],
        "xmax": t["x1"], "ymax": t["y1"]}))
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    for level in (11, 13):
        got = jstage.box_overlap_join(boxes, polys, level=level)\
            .to_pandas()
        rows = set(zip(got["tile_id"], got["poly_id"],
                       got["area_x4"].astype(int)))
        assert rows == want, level
    # per-polygon conservation: overlap sum <= polygon area (x4 units)
    per = got.groupby("poly_id")["area_x4"].sum()
    parea = {r["poly_id"]: int(round((r["xmax"] - r["xmin"]) * 2))
             * int(round((r["ymax"] - r["ymin"]) * 2))
             for _, r in p.iterrows()}
    for pid, s in per.items():
        assert s <= parea[pid]


def _union_area_brute(p):
    """Independent driver-side sweep: interval MERGING per slab (a
    different 1D-union algorithm than the engine's running max)."""
    x0 = np.rint(p["xmin"].to_numpy() * 2).astype(np.int64)
    y0 = np.rint(p["ymin"].to_numpy() * 2).astype(np.int64)
    x1 = np.rint(p["xmax"].to_numpy() * 2).astype(np.int64)
    y1 = np.rint(p["ymax"].to_numpy() * 2).astype(np.int64)
    ys = np.unique(np.concatenate([y0, y1]))
    total = 0
    for s0, s1 in zip(ys[:-1], ys[1:]):
        act = (y0 <= s0) & (y1 >= s1)
        if not act.any():
            continue
        ivals = sorted(zip(x0[act], x1[act]))
        merged = []
        for a, b in ivals:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        total += sum(b - a for a, b in merged) * int(s1 - s0)
    return total


def test_box_union_area_matches_independent_sweep(tiles_and_polygons):
    import ray.data
    corpus, _tiles, polygons = tiles_and_polygons
    p = polygons.to_pandas()
    want = _union_area_brute(p)
    assert want > 0
    # sanity: union < sum of areas (overlaps exist in this corpus)
    sum_areas = int(np.sum(
        np.rint((p["xmax"] - p["xmin"]) * 2)
        * np.rint((p["ymax"] - p["ymin"]) * 2)))
    assert want < sum_areas
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    for level in (10, 12):
        got = jstage.box_union_area(polys, level=level)
        assert int(got["union_area_x4"][0]) == want, level


def test_box_union_area_by_matches_per_key_sweep(tiles_and_polygons):
    """DISSOLVE form: per-key union areas must equal the independent
    driver sweep run separately on each key's rectangles, at two
    grid levels (level-independence is the partitioning proof)."""
    import ray.data
    corpus, _tiles, polygons = tiles_and_polygons
    p = polygons.to_pandas()
    grp = p["poly_id"].str[4:].astype(np.int64) % 3
    want = {g: _union_area_brute(p[grp == g]) for g in range(3)}
    assert all(v > 0 for v in want.values())

    def add_grp(df):
        df = df[["poly_id", "xmin", "ymin", "xmax", "ymax"]].copy()
        df["grp"] = df["poly_id"].str[4:].astype(np.int64) % 3
        return df

    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    for level in (10, 12):
        got = jstage.box_union_area_by(
            polys.map_batches(add_grp, batch_format="pandas"),
            level=level, key_col="grp").to_pandas()
        got = dict(zip(got["grp"], got["union_area_x4"]))
        assert got == want, level


def test_box_union_area_hand_case(ray_session):
    """Three overlapping unit-ish rectangles with a hand-computed
    union: [0,2]x[0,2] ∪ [1,3]x[1,3] ∪ [2,4]x[0,1] →
    4 + 4 - 1 + 2 = 9 map-units² = 144 in x4 (doubled) units."""
    import pandas as _pd
    import ray.data
    df = _pd.DataFrame({
        "poly_id": ["a", "b", "c"],
        "xmin": [0.0, 1.0, 2.0], "ymin": [0.0, 1.0, 0.0],
        "xmax": [2.0, 3.0, 4.0], "ymax": [2.0, 3.0, 1.0]})
    got = jstage.box_union_area(ray.data.from_pandas(df), level=4)
    assert int(got["union_area_x4"][0]) == 9 * 4


def test_zonal_median_matches_brute(ray_session):
    """zonal_median's histogram-cumsum medians == full-sort medians on
    a random lattice with NODATA holes, at two partitionings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from unmixing_ray.constants import NODATA
    from unmixing_ray.stages.join import zonal_median

    rng = np.random.default_rng(41)
    rows = {k: [] for k in ("tile_id", "cell", "cx", "cy", "h", "w",
                            "bands", "pixels")}
    vals_by_tile = {}
    for i in range(40):
        v = rng.integers(0, 300, (2, 8, 8)).astype(np.int16)
        v[0][rng.random((8, 8)) < 0.1] = NODATA
        tid = "t%02d" % i
        rows["tile_id"].append(tid)
        rows["cell"].append(0)
        rows["cx"].append(float(i % 10))
        rows["cy"].append(float(i // 10))
        rows["h"].append(8)
        rows["w"].append(8)
        rows["bands"].append(2)
        rows["pixels"].append(np.ascontiguousarray(v).tobytes())
        vals_by_tile[tid] = v[0][v[0] != NODATA].astype(np.int64)
    tiles = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "cell": pa.array(rows["cell"], pa.uint64()),
        "cx": pa.array(rows["cx"], pa.float64()),
        "cy": pa.array(rows["cy"], pa.float64()),
        "h": pa.array(rows["h"], pa.int32()),
        "w": pa.array(rows["w"], pa.int32()),
        "bands": pa.array(rows["bands"], pa.int32()),
        "pixels": pa.array(rows["pixels"], pa.binary())})
    def rect_ring(x0, y0, x1, y1):
        return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]

    boxes = {"A": (-0.5, -0.5, 4.5, 2.5), "B": (3.5, -0.5, 8.5, 3.5)}
    polys = pa.table({
        "poly_id": pa.array(["A", "B"], pa.string()),
        "xmin": pa.array([boxes["A"][0], boxes["B"][0]]),
        "ymin": pa.array([boxes["A"][1], boxes["B"][1]]),
        "xmax": pa.array([boxes["A"][2], boxes["B"][2]]),
        "ymax": pa.array([boxes["A"][3], boxes["B"][3]]),
        "cx": pa.array([2.0, 6.0]), "cy": pa.array([1.0, 1.5]),
        "ring": pa.array([rect_ring(*boxes["A"]), rect_ring(*boxes["B"])],
                         pa.list_(pa.list_(pa.float64())))})
    for parts in (1, 6):
        ds = ray.data.from_arrow(tiles).repartition(parts)
        got = zonal_median(ds, polys, band=0).to_pandas()\
            .set_index("poly_id")
        for pid in ("A", "B"):
            x0, y0, x1, y1 = boxes[pid]
            member = [vals_by_tile["t%02d" % i] for i in range(40)
                      if x0 <= (i % 10) <= x1 and y0 <= (i // 10) <= y1]
            v = np.sort(np.concatenate(member))
            r = got.loc[pid]
            assert int(r["n_px"]) == len(v)
            assert int(r["med_lo"]) == int(v[(len(v) - 1) // 2])
            assert int(r["med_hi"]) == int(v[len(v) // 2])
