"""Spatial join stages: tiles ⨝ polygons (PIP + kNN).

Two physical plans for the same logical join (SURVEY.md §2.4):

- ``SpatialJoinActor`` + ``broadcast_spatial_join``: the polygon side is
  small relative to the tile stream (the common case at any scale — vector
  layers are MBs, imagery is TBs), so it is ``ray.put`` once and each actor
  builds its STRtree ONCE in ``__init__``; tiles stream through
  ``map_batches`` with zero shuffle.
- ``partitioned_spatial_join``: both sides partitioned by cell — polygons
  replicated to every covering cell (flat map), tiles keyed by their cell,
  then a co-group ``groupby(cell).map_groups`` builds a per-partition
  STRtree and probes the partition's tiles. kNN within a partition uses
  ring expansion: polygons are replicated to ``knn_ring`` extra neighbor
  rings so each tile sees every polygon within that many cells (documented
  partitioning assumption; with rect cells of edge E the result is exact
  for neighbors within knn_ring*E of the cell border).

Join-row output schema: (tile_id, cell, poly_id, kind, rank, dist) where
kind ∈ {'pip', 'knn'}; pip rows have rank=-1, dist=0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .. import cellindex
from ..spatial import STRtree, knn_centroids, points_in_ring

JOIN_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("cell", pa.uint64()),
    ("poly_id", pa.string()),
    ("kind", pa.string()),
    ("rank", pa.int32()),
    ("dist", pa.float64()),
])


def _polygons_to_arrays(polygons):
    """polygons: pyarrow Table with poly_id, ring, cx, cy (+ bbox cols)."""
    ids = np.asarray(polygons["poly_id"].to_pylist())
    rings = [np.asarray(r, dtype=np.float64)
             for r in polygons["ring"].to_pylist()]
    if {"xmin", "ymin", "xmax", "ymax"} <= set(polygons.column_names):
        bboxes = np.stack([
            polygons[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax")
        ], axis=1)
    else:
        bboxes = np.array([[r[:, 0].min(), r[:, 1].min(),
                            r[:, 0].max(), r[:, 1].max()] for r in rings])
    if {"cx", "cy"} <= set(polygons.column_names):
        cx = polygons["cx"].to_numpy()
        cy = polygons["cy"].to_numpy()
    else:
        cx = (bboxes[:, 0] + bboxes[:, 2]) / 2
        cy = (bboxes[:, 1] + bboxes[:, 3]) / 2
    return ids, rings, bboxes, cx.astype(np.float64), cy.astype(np.float64)


def _probe(ids, rings, tree, cx, cy, tile_ids, cells, txs, tys, k,
           bboxes=None):
    """Shared probe body: PIP (vectorized bbox prefilter + per-polygon
    vectorized ray casting over its candidate probes) + kNN by centroid.
    ``tree`` (STRtree) is used when no bbox matrix is supplied."""
    out = {k_: [] for k_ in ("tile_id", "cell", "poly_id", "kind",
                             "rank", "dist")}
    n = len(tile_ids)
    tile_ids = np.asarray(tile_ids)
    cells = np.asarray(cells)
    if n and len(ids):
        txs = np.asarray(txs, dtype=np.float64)
        tys = np.asarray(tys, dtype=np.float64)
        if bboxes is not None:
            # vectorized candidate matrix: (n_probes, n_polys) bbox test —
            # faster than per-point tree descent for typical vector-layer
            # sizes; STRtree remains the path for very large polygon sets
            hit = ((txs[:, None] >= bboxes[None, :, 0])
                   & (txs[:, None] <= bboxes[None, :, 2])
                   & (tys[:, None] >= bboxes[None, :, 1])
                   & (tys[:, None] <= bboxes[None, :, 3]))
            probe_idx, poly_idx = np.nonzero(hit)
        else:
            pi, pj = [], []
            for i in range(n):
                for c in tree.query_point(float(txs[i]), float(tys[i])):
                    pi.append(i)
                    pj.append(c)
            probe_idx = np.asarray(pi, dtype=np.int64)
            poly_idx = np.asarray(pj, dtype=np.int64)
        # group candidate pairs by polygon; one vectorized PIP per polygon
        order = np.argsort(poly_idx, kind="stable")
        probe_idx, poly_idx = probe_idx[order], poly_idx[order]
        hit_probe = []
        hit_poly = []
        bounds = np.searchsorted(poly_idx,
                                 np.arange(len(ids) + 1), side="left")
        for c in range(len(ids)):
            sel = probe_idx[bounds[c]:bounds[c + 1]]
            if not len(sel):
                continue
            inside = points_in_ring(txs[sel], tys[sel], rings[c])
            hits = sel[inside]
            hit_probe.append(hits)
            hit_poly.append(np.full(len(hits), c, dtype=np.int64))
        ph = np.concatenate(hit_probe) if hit_probe else \
            np.empty(0, np.int64)
        pl = np.concatenate(hit_poly) if hit_poly else \
            np.empty(0, np.int64)
        ids_arr = np.asarray(ids)
        out["tile_id"].append(tile_ids[ph])
        out["cell"].append(cells[ph])
        out["poly_id"].append(ids_arr[pl])
        out["kind"].append(np.full(len(ph), "pip", dtype=object))
        out["rank"].append(np.full(len(ph), -1, dtype=np.int32))
        out["dist"].append(np.zeros(len(ph)))
        # kNN by centroid distance, poly_id tiebreak
        if k > 0:
            idx, dist = knn_centroids(txs, tys, cx, cy, k, tie_ids=ids)
            kk = idx.shape[1]
            out["tile_id"].append(np.repeat(tile_ids, kk))
            out["cell"].append(np.repeat(cells, kk))
            out["poly_id"].append(ids_arr[idx].ravel())
            out["kind"].append(np.full(n * kk, "knn", dtype=object))
            out["rank"].append(np.tile(np.arange(kk, dtype=np.int32), n))
            out["dist"].append(dist.ravel())

    def cat(parts, dtype=None):
        if not parts:
            return np.empty(0, dtype or object)
        return np.concatenate(parts)

    return pa.table({
        "tile_id": pa.array(cat(out["tile_id"]), pa.string()),
        "cell": pa.array(cat(out["cell"], np.uint64), pa.uint64()),
        "poly_id": pa.array(cat(out["poly_id"]), pa.string()),
        "kind": pa.array(cat(out["kind"]), pa.string()),
        "rank": pa.array(cat(out["rank"], np.int32), pa.int32()),
        "dist": pa.array(cat(out["dist"], np.float64), pa.float64()),
    }, schema=JOIN_SCHEMA)


class SpatialJoinActor:
    """Stateful map_batches stage: STRtree built once per actor from the
    broadcast polygon table (axis B actor-pool pattern)."""

    def __init__(self, polygons_ref, k=3):
        polygons = ray.get(polygons_ref) if not isinstance(
            polygons_ref, pa.Table) else polygons_ref
        (self.ids, self.rings, self.bboxes,
         self.cx, self.cy) = _polygons_to_arrays(polygons)
        self.tree = STRtree(self.bboxes)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _probe(
            self.ids, self.rings, self.tree, self.cx, self.cy,
            batch["tile_id"].to_pylist(),
            batch["cell"].to_numpy(zero_copy_only=False),
            batch["cx"].to_numpy(), batch["cy"].to_numpy(), self.k,
            bboxes=self.bboxes)


# Per-worker-process probe-state cache. A closure-held dict is
# re-deserialized with every TASK (the STRtree rebuilt per task — the
# round-2 advisory finding); a module-level cache keyed by the broadcast
# ref survives for the life of the worker process, so the tree builds
# once per worker like true actor state.
_PROBE_ACTOR_CACHE = {}


def cached_probe_actor(polygons_ref, k):
    """SpatialJoinActor built once per worker process per (ref, k)."""
    key = (polygons_ref.hex() if hasattr(polygons_ref, "hex")
           else id(polygons_ref), int(k))
    actor = _PROBE_ACTOR_CACHE.get(key)
    if actor is None:
        actor = SpatialJoinActor(polygons_ref, k)
        _PROBE_ACTOR_CACHE[key] = actor
    return actor


def broadcast_spatial_join(tiles, polygons, k=3, concurrency=None,
                           batch_size=2048, use_actors=False):
    """tiles: Dataset with (tile_id, cell, cx, cy); polygons: pa.Table.
    Returns the join-row Dataset.

    Default plan: stateless tasks sharing the broadcast polygon table via
    one ``ray.put`` ref (first use per worker process builds the probe
    arrays, ~ms). Actor-pool variant (``use_actors=True``) amortizes the
    STRtree across batches — worth it only when the polygon side is big
    enough that per-task setup dominates; for typical vector layers the
    task plan avoids multi-second pool startup entirely.
    """
    ref = ray.put(polygons)
    probe_cols = tiles.select_columns(["tile_id", "cell", "cx", "cy"])
    if use_actors:
        if concurrency is None:
            from .unmix import default_pool_size
            concurrency = default_pool_size()
        return probe_cols.map_batches(
            SpatialJoinActor,
            fn_constructor_args=(ref, k),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    def probe_task(batch: pa.Table) -> pa.Table:
        return cached_probe_actor(ref, k)(batch)

    return probe_cols.map_batches(probe_task, batch_format="pyarrow",
                                  batch_size=batch_size)


def replicate_polygons_to_cells(polygons, cell_level, knn_ring=1):
    """Driver-side flat map: one (cell, polygon row) per covering cell
    (+ ``knn_ring`` rings of neighbors for kNN correctness near borders).
    Polygons are small; this expansion is cheap and bounded."""
    ids, rings, bboxes, cx, cy = _polygons_to_arrays(polygons)
    rows = []
    for i in range(len(ids)):
        cover = set(cellindex.cover_bbox(*bboxes[i], cell_level))
        expand = set(cover)
        for _ in range(knn_ring):
            ring_cells = set()
            for c in expand:
                ring_cells.update(cellindex.neighbors(c))
            expand |= ring_cells
        for c in sorted(expand):
            rows.append({
                "cell": np.uint64(c), "poly_id": ids[i],
                "ring": rings[i].tolist(),
                "xmin": bboxes[i, 0], "ymin": bboxes[i, 1],
                "xmax": bboxes[i, 2], "ymax": bboxes[i, 3],
                "cx": cx[i], "cy": cy[i],
                "in_cover": bool(c in cover),
            })
    return rows


def partitioned_spatial_join(tiles, polygons, cell_level, k=3, knn_ring=1,
                             exact=False):
    """Explicit co-partitioned join: groupby(cell) over the union of tile
    probes and replicated polygon rows. Demonstrates the shuffle plan used
    when the polygon side is too large to broadcast.

    ``exact=True`` upgrades the ring-replication kNN from a documented
    approximation to an exact answer: inside each partition every tile's
    k-th neighbor distance is checked against its guaranteed-covered
    radius (knn_ring cell-edges plus the tile point's distance to its own
    cell border — any polygon centroid strictly inside that radius is
    provably replicated into the partition, since Chebyshev ≤ Euclidean
    distance and replication dilates covering cells by knn_ring rings).
    Tiles that fail the check (or see fewer than k polygons) emit a
    ``knn_miss`` marker instead of knn rows and are re-probed in one
    bounded second pass (broadcast kNN over only the failing tiles) —
    exactness without widening the ring for everyone."""
    poly_rows = replicate_polygons_to_cells(polygons, cell_level, knn_ring)
    poly_ds = ray.data.from_items([
        {"cell": r["cell"], "poly_id": r["poly_id"], "tile_id": "",
         "cx": r["cx"], "cy": r["cy"],
         "xmin": r["xmin"], "ymin": r["ymin"],
         "xmax": r["xmax"], "ymax": r["ymax"],
         "ring_flat": [float(v) for xy in r["ring"] for v in xy],
         "in_cover": r["in_cover"], "side": "poly"}
        for r in poly_rows
    ])
    probe = tiles.select_columns(["tile_id", "cell", "cx", "cy"])

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column(
            "side", pa.array(["tile"] * n, pa.string())
        ).append_column(
            "poly_id", pa.array([""] * n, pa.string())
        ).append_column(
            "ring_flat", pa.nulls(n, pa.list_(pa.float64()))
        ).append_column(
            "in_cover", pa.nulls(n, pa.bool_())
        ).append_column(
            "xmin", pa.nulls(n, pa.float64())
        ).append_column(
            "ymin", pa.nulls(n, pa.float64())
        ).append_column(
            "xmax", pa.nulls(n, pa.float64())
        ).append_column(
            "ymax", pa.nulls(n, pa.float64()))

    tagged = probe.map_batches(tag, batch_format="pyarrow")
    unioned = tagged.union(poly_ds)

    def join_group(df: pd.DataFrame) -> pd.DataFrame:
        tiles_g = df[df["side"] == "tile"]
        polys_g = df[df["side"] == "poly"]
        if not len(tiles_g) or not len(polys_g):
            if exact and len(tiles_g):
                # no polygons reached this partition: every tile here
                # needs the bounded re-probe
                return pd.DataFrame({
                    "tile_id": tiles_g["tile_id"].tolist(),
                    "cell": tiles_g["cell"].to_numpy(),
                    "poly_id": "", "kind": "knn_miss",
                    "rank": np.int32(-2), "dist": 0.0})
            return pd.DataFrame({c: [] for c in (
                "tile_id", "cell", "poly_id", "kind", "rank", "dist")})
        ids = polys_g["poly_id"].to_numpy()
        rings = [np.asarray(r, dtype=np.float64).reshape((-1, 2))
                 for r in polys_g["ring_flat"]]
        bboxes = polys_g[["xmin", "ymin", "xmax", "ymax"]].to_numpy(
            dtype=np.float64)
        in_cover = polys_g["in_cover"].to_numpy(dtype=bool)
        cx = polys_g["cx"].to_numpy(dtype=np.float64)
        cy = polys_g["cy"].to_numpy(dtype=np.float64)
        # PIP uses only covering polygons (a polygon can only contain
        # points of cells it covers); kNN uses cover + neighbor rings
        tree = STRtree(bboxes[in_cover])
        tbl = _probe(
            ids[in_cover], [r for r, c in zip(rings, in_cover) if c],
            tree, cx, cy, tiles_g["tile_id"].tolist(),
            tiles_g["cell"].to_numpy(), tiles_g["cx"].to_numpy(),
            tiles_g["cy"].to_numpy(), 0)
        pip_df = tbl.to_pandas()
        txs = tiles_g["cx"].to_numpy()
        tys = tiles_g["cy"].to_numpy()
        idx, dist = knn_centroids(txs, tys, cx, cy, k, tie_ids=ids)
        t_ids = tiles_g["tile_id"].tolist()
        t_cells = tiles_g["cell"].to_numpy()
        n_t = len(t_ids)
        if exact:
            # guaranteed-covered radius per tile: knn_ring cell edges
            # plus the point's distance to its own cell border
            E = cellindex.cell_edge(cell_level)
            xmn, ymn, xmx, ymx = np.empty(n_t), np.empty(n_t), \
                np.empty(n_t), np.empty(n_t)
            for i, c in enumerate(t_cells):
                xmn[i], ymn[i], xmx[i], ymx[i] = \
                    cellindex.cell_bounds(np.uint64(c))
            edge_d = np.minimum(np.minimum(txs - xmn, xmx - txs),
                                np.minimum(tys - ymn, ymx - tys))
            r_safe = knn_ring * E + np.maximum(edge_d, 0.0)
            short = idx.shape[1] < k
            unsafe = short | (dist[:, -1] >= r_safe) if idx.shape[1] \
                else np.ones(n_t, dtype=bool)
        else:
            unsafe = np.zeros(n_t, dtype=bool)
        rows = {"tile_id": [], "cell": [], "poly_id": [], "kind": [],
                "rank": [], "dist": []}
        for i in range(n_t):
            if unsafe[i]:
                rows["tile_id"].append(t_ids[i])
                rows["cell"].append(t_cells[i])
                rows["poly_id"].append("")
                rows["kind"].append("knn_miss")
                rows["rank"].append(-2)
                rows["dist"].append(0.0)
                continue
            for r in range(idx.shape[1]):
                rows["tile_id"].append(t_ids[i])
                rows["cell"].append(t_cells[i])
                rows["poly_id"].append(ids[idx[i, r]])
                rows["kind"].append("knn")
                rows["rank"].append(r)
                rows["dist"].append(float(dist[i, r]))
        return pd.concat([pip_df, pd.DataFrame(rows)], ignore_index=True)

    joined = unioned.groupby("cell").map_groups(
        join_group, batch_format="pandas")
    if not exact:
        return joined
    # bounded repair: re-probe ONLY the knn_miss tiles against the full
    # (broadcast) polygon table. The join output is materialized once —
    # it is O(tiles x k), the size the caller consumes anyway — so the
    # marker collect and the clean filter don't re-run the shuffle.
    joined = joined.materialize()
    import pyarrow.compute as pc

    miss = joined.filter(
        lambda r: r["kind"] == "knn_miss").take_all()
    clean = joined.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], "knn_miss")),
        batch_format="pyarrow")
    if not miss:
        return clean
    miss_ids = {m["tile_id"] for m in miss}

    def keep_miss(batch: pa.Table) -> pa.Table:
        mask = pa.array([t in miss_ids
                         for t in batch["tile_id"].to_pylist()],
                        pa.bool_())
        return batch.filter(mask)

    probe_miss = tiles.select_columns(["tile_id", "cell", "cx", "cy"])\
        .map_batches(keep_miss, batch_format="pyarrow")
    repaired = broadcast_spatial_join(probe_miss, polygons, k=k)\
        .map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "knn")),
        batch_format="pyarrow")
    return clean.union(repaired)


# ---------------------------------------------------------------------------
# zonal statistics (raster x vector)

def zonal_stats(tiles, polygons, band=0):
    """Zonal statistics, the classic raster×vector aggregate: per
    polygon, the sum and valid-pixel count of ``band`` over every tile
    whose center falls inside the polygon (reference analogue: the
    mask/summarize idiom of utils.binary_mask + spectra_at_idx, fused).

    One streaming pass, combiner-before-shuffle: each batch reduces its
    tiles to (tile_id, band_sum, n_valid) scalars, probes the broadcast
    polygon STRtree (built once per worker), and pre-aggregates by
    poly_id locally — the exchange carries at most |polygons| rows per
    batch and the final merge is a sum. Pixel payloads never shuffle.
    """
    from ..constants import NODATA
    from .decode import tiles_to_ndarray

    ref = ray.put(polygons)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays, uniform = tiles_to_ndarray(batch)
        if uniform is not None:
            b = uniform[:, band].reshape(n, -1).astype(np.int64)
            valid = b != NODATA
            sums = np.where(valid, b, 0).sum(axis=1)
            cnts = valid.sum(axis=1).astype(np.int64)
        else:
            sums = np.empty(n, dtype=np.int64)
            cnts = np.empty(n, dtype=np.int64)
            for i, a in enumerate(arrays):
                v = a[band].astype(np.int64)
                ok = v != NODATA
                sums[i] = v[ok].sum()
                cnts[i] = ok.sum()
        pip = cached_probe_actor(ref, 0)(
            batch.select(["tile_id", "cell", "cx", "cy"])).to_pandas()
        pip = pip[pip["kind"] == "pip"][["tile_id", "poly_id"]]
        stats = pd.DataFrame({
            "tile_id": batch["tile_id"].to_pylist(),
            "b_sum": sums, "b_n": cnts})
        m = pip.merge(stats, on="tile_id")
        agg = m.groupby("poly_id", as_index=False).agg(
            n_tiles=("tile_id", "size"), b_sum=("b_sum", "sum"),
            b_n=("b_n", "sum"))
        return pa.table({
            "poly_id": pa.array(agg["poly_id"], pa.string()),
            "n_tiles": pa.array(agg["n_tiles"].astype(np.int64)),
            "b_sum": pa.array(agg["b_sum"].astype(np.int64)),
            "b_n": pa.array(agg["b_n"].astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][["poly_id"]].copy().reset_index(drop=True)
        for c in ("n_tiles", "b_sum", "b_n"):
            out[c] = np.int64(g[c].sum())
        return out

    parts = tiles.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("poly_id").map_groups(
        merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# rasterize (vector burn-in)

def rasterize_count(tiles, polygons):
    """Rasterize polygons onto the tile pixel grid: for every PIP join
    pair, the number of pixel CENTERS inside the polygon's bbox (the
    burn-in/coverage primitive behind mask_by_query-style vector masks;
    reference analogue utils.py rasterization idiom via point_to_pixel).

    Per batch: probe the broadcast polygon index, then one vectorized
    per-pixel-center comparison per axis — x and y counts multiply, so
    the work is O(pairs × tile_edge), never O(pairs × pixels). The
    comparison `gt0 + (c + 0.5) * gt1 BETWEEN xmin AND xmax` is the
    exact IEEE expression the SQL oracle evaluates, so boundary pixels
    agree bit-for-bit. Pixel payloads are never read.
    """
    ref = ray.put(polygons)
    pol = _polygons_to_arrays(polygons)
    pol_ids = list(pol[0])
    pol_ix = {pid: i for i, pid in enumerate(pol_ids)}
    bx = pol[2]  # bboxes (n, 4): xmin, ymin, xmax, ymax

    def partial(batch: pa.Table) -> pa.Table:
        pip = cached_probe_actor(ref, 0)(
            batch.select(["tile_id", "cell", "cx", "cy"])).to_pandas()
        pip = pip[pip["kind"] == "pip"]
        if not len(pip):
            return pa.table({"tile_id": pa.array([], pa.string()),
                             "poly_id": pa.array([], pa.string()),
                             "n_px": pa.array([], pa.int64())})
        tid_ix = {t: i for i, t in
                  enumerate(batch["tile_id"].to_pylist())}
        ti = pip["tile_id"].map(tid_ix).to_numpy()
        pi = pip["poly_id"].map(pol_ix).to_numpy()
        gt = np.stack(batch["gt"].to_numpy(zero_copy_only=False))
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        if not ((ws == ws[0]).all() and (hs == hs[0]).all()):
            raise NotImplementedError("mixed tile shapes in a batch")
        w, h = int(ws[0]), int(hs[0])
        cs = np.arange(w, dtype=np.float64) + 0.5
        rs = np.arange(h, dtype=np.float64) + 0.5
        xc = gt[ti, 0][:, None] + cs[None, :] * gt[ti, 1][:, None]
        yc = gt[ti, 3][:, None] + rs[None, :] * gt[ti, 5][:, None]
        nx = ((xc >= bx[pi, 0][:, None])
              & (xc <= bx[pi, 2][:, None])).sum(axis=1)
        ny = ((yc >= bx[pi, 1][:, None])
              & (yc <= bx[pi, 3][:, None])).sum(axis=1)
        return pa.table({
            "tile_id": pa.array(pip["tile_id"], pa.string()),
            "poly_id": pa.array(pip["poly_id"], pa.string()),
            "n_px": pa.array((nx * ny).astype(np.int64))})

    return tiles.select_columns(
        ["tile_id", "cell", "cx", "cy", "gt", "w", "h"]).map_batches(
        partial, batch_format="pyarrow")


def polygon_metrics(polygons_ds):
    """Vector-side geometry analytics over a polygons Dataset: exact
    fixed-point shoelace area, L1 perimeter, vertex count, covering-cell
    count per polygon (the raster<->vector bridge's vector half — the
    reference only GENERATES pixel polygons, lsma.py:695-741; this is
    the analytics pass a polygon layer needs at scale). Stateless
    one-pass map_batches; no shuffle.

    Exactness: ring coordinates are doubled to integers (the corpus
    uses .5-quantized map coords; doubling any IEEE double <= 2^52 is
    exact), so the shoelace sum Σ(x_i·y_{i+1} − x_{i+1}·y_i) and the L1
    perimeter Σ(|dx|+|dy|) are exact int64 — ``area_x8 = 8·area``,
    ``perim_x2 = 2·L1-perimeter`` — and DuckDB replays them with the
    same CAST/arith (no float-summation-order hazard)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, a8, p2, nv, nc = [], [], [], [], []
        for pid, ring, cells in zip(df["poly_id"], df["ring"],
                                    df["cells"]):
            r = np.asarray([[p[0], p[1]] for p in ring], np.float64)
            xi = np.rint(r[:, 0] * 2).astype(np.int64)
            yi = np.rint(r[:, 1] * 2).astype(np.int64)
            area2 = int(np.sum(xi[:-1] * yi[1:] - xi[1:] * yi[:-1]))
            per = int(np.sum(np.abs(np.diff(xi)) + np.abs(np.diff(yi))))
            ids.append(pid)
            a8.append(abs(area2))      # (2x)^2 coords -> 8*area
            p2.append(per)
            nv.append(len(r) - 1)      # closed ring repeats the start
            nc.append(len(cells))
        return pd.DataFrame({
            "poly_id": ids,
            "area_x8": pd.Series(a8, dtype="int64"),
            "perim_x2": pd.Series(p2, dtype="int64"),
            "n_vertices": pd.Series(nv, dtype="int64"),
            "n_cells": pd.Series(nc, dtype="int64")})

    return polygons_ds.map_batches(fn, batch_format="pandas")


def polygon_cover(polygons_ds, level):
    """Covering-cell computation for a polygon layer — the spatial-
    index build step (the same cover the partitioned join plans key
    on): one stateless pass emits (poly_id, cell_ix, cell_iy) for every
    level-``level`` grid cell intersecting each polygon's bbox
    (cellindex.cover_bbox semantics: floor grid arithmetic, clipped to
    the level's lattice). The DuckDB oracle replays the identical
    closed-form grid arithmetic — a match pins the engine's cell cover
    (and therefore every cover-keyed partition plan) to the spec."""
    from .. import cellindex

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, oxs, oys = [], [], []
        for pid, xmin, ymin, xmax, ymax in zip(
                df["poly_id"], df["xmin"], df["ymin"], df["xmax"],
                df["ymax"]):
            cells = cellindex.cover_bbox(float(xmin), float(ymin),
                                         float(xmax), float(ymax),
                                         level)
            ix, iy, _lv = cellindex.cell_to_ixiy(
                np.asarray(cells, np.uint64))
            ids.extend([pid] * len(cells))
            oxs.extend(int(v) for v in ix)
            oys.extend(int(v) for v in iy)
        return pd.DataFrame({
            "poly_id": ids,
            "cell_ix": pd.Series(oxs, dtype="int64"),
            "cell_iy": pd.Series(oys, dtype="int64")})

    return polygons_ds.map_batches(fn, batch_format="pandas")


def box_intersection_join(polygons_ds, level):
    """Distributed rectangle-intersection self-join (range join on two
    dimensions): every unordered polygon pair whose bboxes overlap with
    positive area, plus the exact intersection area. The reference has
    no polygon-polygon overlay at all (its only vector op GENERATES
    pixel polygons, lsma.py:695-741); this is the engine-new overlay
    join a vector layer needs at scale.

    Scale design (the classic grid spatial join):

    1. one stateless pass replicates each box to its covering grid
       cells at ``level`` (bounded: ceil(w/E)·ceil(h/E) cells per box);
    2. ``groupby(cell)`` co-locates boxes that could possibly touch —
       the only shuffle, and it moves (poly_id, 4 doubles) per replica,
       never geometry payloads;
    3. within each cell a vectorized triangular all-pairs overlap test
       runs over LOCAL rows only (cost bounded by local density², not
       corpus²);
    4. a pair overlapping in several shared cells is emitted exactly
       once, by the cell containing the intersection's min corner —
       the standard reference-point dedup, so no second distinct
       shuffle is needed.

    Exactness: corpus bounds are .5-quantized, so doubled widths/
    heights are exact int64 and ``area_x4 = (2w)·(2h)`` replays in SQL
    with no float hazard. The group key is the Morton index (level
    stripped) as int64 < 2^53 — safe through any pandas hop.
    """
    edge = cellindex.cell_edge(level)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ids, keys = [], []
        xs0, ys0, xs1, ys1 = [], [], [], []
        for pid, xmin, ymin, xmax, ymax in zip(
                df["poly_id"], df["xmin"], df["ymin"], df["xmax"],
                df["ymax"]):
            cells = cellindex.cover_bbox(float(xmin), float(ymin),
                                         float(xmax), float(ymax),
                                         level)
            for c in cells:
                keys.append(int(c) & cellindex._MORTON_MASK)
            ids.extend([pid] * len(cells))
            xs0.extend([float(xmin)] * len(cells))
            ys0.extend([float(ymin)] * len(cells))
            xs1.extend([float(xmax)] * len(cells))
            ys1.extend([float(ymax)] * len(cells))
        return pd.DataFrame({
            "pcell": pd.Series(keys, dtype="int64"), "poly_id": ids,
            "xmin": xs0, "ymin": ys0, "xmax": xs1, "ymax": ys1})

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        empty = pd.DataFrame({
            "poly_a": pd.Series([], dtype="object"),
            "poly_b": pd.Series([], dtype="object"),
            "w_x2": pd.Series([], dtype="int64"),
            "h_x2": pd.Series([], dtype="int64"),
            "area_x4": pd.Series([], dtype="int64")})
        if n < 2:
            return empty
        pid = group["poly_id"].to_numpy()
        x0 = group["xmin"].to_numpy()
        y0 = group["ymin"].to_numpy()
        x1 = group["xmax"].to_numpy()
        y1 = group["ymax"].to_numpy()
        ii, jj = np.triu_indices(n, 1)
        # identical poly_id replicas cannot co-occur in one cell (cover
        # emits each cell once per box), so ii/jj are distinct boxes.
        iw = np.minimum(x1[ii], x1[jj]) - np.maximum(x0[ii], x0[jj])
        ih = np.minimum(y1[ii], y1[jj]) - np.maximum(y0[ii], y0[jj])
        keep = (iw > 0) & (ih > 0)
        if not keep.any():
            return empty
        ii, jj, iw, ih = ii[keep], jj[keep], iw[keep], ih[keep]
        # reference-point dedup: only the cell containing the
        # intersection's min corner reports the pair.
        rx = np.maximum(x0[ii], x0[jj])
        ry = np.maximum(y0[ii], y0[jj])
        ref = (cellindex.cell_of_xy(rx, ry, level).astype(np.uint64)
               & np.uint64(cellindex._MORTON_MASK)).astype(np.int64)
        here = int(group["pcell"].iloc[0])
        keep2 = ref == here
        if not keep2.any():
            return empty
        ii, jj, iw, ih = ii[keep2], jj[keep2], iw[keep2], ih[keep2]
        a, b = pid[ii], pid[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        w2 = np.rint(iw * 2).astype(np.int64)
        h2 = np.rint(ih * 2).astype(np.int64)
        return pd.DataFrame({
            "poly_a": a2, "poly_b": b2,
            "w_x2": pd.Series(w2, dtype="int64"),
            "h_x2": pd.Series(h2, dtype="int64"),
            "area_x4": pd.Series(w2 * h2, dtype="int64")})

    rep = polygons_ds.map_batches(replicate, batch_format="pandas")
    return rep.groupby("pcell").map_groups(pairs, batch_format="pandas")


def box_overlap_join(left_ds, right_ds, level, left_id="tile_id",
                     right_id="poly_id"):
    """Two-table grid-partitioned rectangle-overlap join (the general
    form of ``box_intersection_join``): every (left, right) pair whose
    boxes intersect with positive area, plus the exact intersection
    area — the canonical distributed spatial overlay (area-weighted
    zonal statistics, coverage accounting). Same scale shape: replicate
    both sides to covering cells, ONE ``groupby(cell)`` shuffle over the
    tagged union, vectorized left×right overlap test per cell, and
    reference-point dedup (only the cell containing the intersection's
    min corner emits the pair). Both inputs need columns
    (``id``, xmin, ymin, xmax, ymax); .5-quantized bounds make the
    doubled widths/heights exact int64 (``area_x4 = (2w)·(2h)``)."""

    def make_replicate(id_col, side):
        def replicate(df: pd.DataFrame) -> pd.DataFrame:
            ids, keys = [], []
            xs0, ys0, xs1, ys1 = [], [], [], []
            for rid, xmin, ymin, xmax, ymax in zip(
                    df[id_col], df["xmin"], df["ymin"], df["xmax"],
                    df["ymax"]):
                cells = cellindex.cover_bbox(float(xmin), float(ymin),
                                             float(xmax), float(ymax),
                                             level)
                for c in cells:
                    keys.append(int(c) & cellindex._MORTON_MASK)
                ids.extend([rid] * len(cells))
                xs0.extend([float(xmin)] * len(cells))
                ys0.extend([float(ymin)] * len(cells))
                xs1.extend([float(xmax)] * len(cells))
                ys1.extend([float(ymax)] * len(cells))
            return pd.DataFrame({
                "pcell": pd.Series(keys, dtype="int64"), "rid": ids,
                "side": pd.Series([side] * len(ids), dtype="int8"),
                "xmin": xs0, "ymin": ys0, "xmax": xs1, "ymax": ys1})
        return replicate

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            left_id: pd.Series([], dtype="object"),
            right_id: pd.Series([], dtype="object"),
            "w_x2": pd.Series([], dtype="int64"),
            "h_x2": pd.Series([], dtype="int64"),
            "area_x4": pd.Series([], dtype="int64")})
        side = group["side"].to_numpy()
        li = np.flatnonzero(side == 0)
        rj = np.flatnonzero(side == 1)
        if not len(li) or not len(rj):
            return empty
        x0 = group["xmin"].to_numpy()
        y0 = group["ymin"].to_numpy()
        x1 = group["xmax"].to_numpy()
        y1 = group["ymax"].to_numpy()
        rid = group["rid"].to_numpy()
        ii = np.repeat(li, len(rj))
        jj = np.tile(rj, len(li))
        iw = np.minimum(x1[ii], x1[jj]) - np.maximum(x0[ii], x0[jj])
        ih = np.minimum(y1[ii], y1[jj]) - np.maximum(y0[ii], y0[jj])
        keep = (iw > 0) & (ih > 0)
        if not keep.any():
            return empty
        ii, jj, iw, ih = ii[keep], jj[keep], iw[keep], ih[keep]
        rx = np.maximum(x0[ii], x0[jj])
        ry = np.maximum(y0[ii], y0[jj])
        ref = (cellindex.cell_of_xy(rx, ry, level).astype(np.uint64)
               & np.uint64(cellindex._MORTON_MASK)).astype(np.int64)
        here = int(group["pcell"].iloc[0])
        keep2 = ref == here
        if not keep2.any():
            return empty
        ii, jj, iw, ih = ii[keep2], jj[keep2], iw[keep2], ih[keep2]
        w2 = np.rint(iw * 2).astype(np.int64)
        h2 = np.rint(ih * 2).astype(np.int64)
        return pd.DataFrame({
            left_id: rid[ii], right_id: rid[jj],
            "w_x2": pd.Series(w2, dtype="int64"),
            "h_x2": pd.Series(h2, dtype="int64"),
            "area_x4": pd.Series(w2 * h2, dtype="int64")})

    lrep = left_ds.map_batches(make_replicate(left_id, 0),
                               batch_format="pandas")
    rrep = right_ds.map_batches(make_replicate(right_id, 1),
                                batch_format="pandas")
    return lrep.union(rrep).groupby("pcell").map_groups(
        pairs, batch_format="pandas")


def box_union_area(polygons_ds, level):
    """Total area covered by the UNION of all rectangles — the measure
    problem (Bentley's sweep) as a distributed operator. Grid cells
    partition the plane, so clipping each box to its covering cells and
    summing per-cell union areas gives the exact global union with NO
    pair dedup at all: one replicate pass (boxes pre-clipped to each
    cell), one ``groupby(cell)`` shuffle, a per-cell slab sweep
    (y coordinate compression → 1D x-union per slab via sorted running
    max), then a tiny scalar sum. Per-cell cost is O(local² log) in the
    worst case but bounded by local density, never corpus size.

    All sweep arithmetic runs on doubled integer coordinates
    (.5-quantized bounds → exact int64), so ``union_area_x4`` replays
    exactly in SQL with a window-function sweep."""

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        keys = []
        xs0, ys0, xs1, ys1 = [], [], [], []
        for xmin, ymin, xmax, ymax in zip(
                df["xmin"], df["ymin"], df["xmax"], df["ymax"]):
            for c in cellindex.cover_bbox(float(xmin), float(ymin),
                                          float(xmax), float(ymax),
                                          level):
                cx0, cy0, cx1, cy1 = cellindex.cell_bounds(np.uint64(c))
                keys.append(int(c) & cellindex._MORTON_MASK)
                # clip to the cell: per-cell unions are disjoint pieces
                # of the global union (no double counting by design)
                xs0.append(int(np.rint(max(float(xmin), cx0) * 2)))
                ys0.append(int(np.rint(max(float(ymin), cy0) * 2)))
                xs1.append(int(np.rint(min(float(xmax), cx1) * 2)))
                ys1.append(int(np.rint(min(float(ymax), cy1) * 2)))
        return pd.DataFrame({
            "pcell": pd.Series(keys, dtype="int64"),
            "x0": pd.Series(xs0, dtype="int64"),
            "y0": pd.Series(ys0, dtype="int64"),
            "x1": pd.Series(xs1, dtype="int64"),
            "y1": pd.Series(ys1, dtype="int64")})

    def cell_union(group: pd.DataFrame) -> pd.DataFrame:
        x0 = group["x0"].to_numpy()
        y0 = group["y0"].to_numpy()
        x1 = group["x1"].to_numpy()
        y1 = group["y1"].to_numpy()
        ys = np.unique(np.concatenate([y0, y1]))
        total = 0
        for s0, s1 in zip(ys[:-1], ys[1:]):
            act = (y0 <= s0) & (y1 >= s1)
            if not act.any():
                continue
            ax0, ax1 = x0[act], x1[act]
            order = np.lexsort((ax1, ax0))
            ax0, ax1 = ax0[order], ax1[order]
            run = np.maximum.accumulate(ax1)
            prev = np.concatenate(([np.int64(-2 ** 62)], run[:-1]))
            seg = np.maximum(
                0, ax1 - np.maximum(ax0, prev)).sum()
            total += int(seg) * int(s1 - s0)
        return pd.DataFrame({"area_x4": pd.Series([total],
                                                  dtype="int64")})

    rep = polygons_ds.map_batches(replicate, batch_format="pandas")
    parts = rep.groupby("pcell").map_groups(cell_union,
                                            batch_format="pandas")
    total = parts.sum("area_x4")
    return pd.DataFrame({"union_area_x4": pd.Series(
        [int(total or 0)], dtype="int64")})


def box_union_area_by(polygons_ds, level, key_col):
    """DISSOLVE: union-of-rectangles area PER ATTRIBUTE KEY — the
    GROUP BY form of :func:`box_union_area` (GIS "dissolve by
    attribute" reduced to per-key measure sums). Identical scale
    shape: boxes pre-clipped to covering cells, ONE
    ``groupby(cell, key)`` shuffle (cells partition the plane, so
    per-(cell, key) slab sweeps sum exactly to each key's global
    union), then a tiny per-key aggregate — rectangles of different
    keys never co-sweep. Doubled-integer arithmetic throughout; the
    SQL replay is the same window-function sweep partitioned by key.
    """
    from ray.data.aggregate import Sum

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        keys, grps = [], []
        xs0, ys0, xs1, ys1 = [], [], [], []
        for xmin, ymin, xmax, ymax, grp in zip(
                df["xmin"], df["ymin"], df["xmax"], df["ymax"],
                df[key_col]):
            for c in cellindex.cover_bbox(float(xmin), float(ymin),
                                          float(xmax), float(ymax),
                                          level):
                cx0, cy0, cx1, cy1 = cellindex.cell_bounds(np.uint64(c))
                keys.append(int(c) & cellindex._MORTON_MASK)
                grps.append(grp)
                xs0.append(int(np.rint(max(float(xmin), cx0) * 2)))
                ys0.append(int(np.rint(max(float(ymin), cy0) * 2)))
                xs1.append(int(np.rint(min(float(xmax), cx1) * 2)))
                ys1.append(int(np.rint(min(float(ymax), cy1) * 2)))
        return pd.DataFrame({
            "pcell": pd.Series(keys, dtype="int64"),
            key_col: pd.Series(grps, dtype="int64"),
            "x0": pd.Series(xs0, dtype="int64"),
            "y0": pd.Series(ys0, dtype="int64"),
            "x1": pd.Series(xs1, dtype="int64"),
            "y1": pd.Series(ys1, dtype="int64")})

    def cell_union(group: pd.DataFrame) -> pd.DataFrame:
        x0 = group["x0"].to_numpy()
        y0 = group["y0"].to_numpy()
        x1 = group["x1"].to_numpy()
        y1 = group["y1"].to_numpy()
        ys = np.unique(np.concatenate([y0, y1]))
        total = 0
        for s0, s1 in zip(ys[:-1], ys[1:]):
            act = (y0 <= s0) & (y1 >= s1)
            if not act.any():
                continue
            ax0, ax1 = x0[act], x1[act]
            order = np.lexsort((ax1, ax0))
            ax0, ax1 = ax0[order], ax1[order]
            run = np.maximum.accumulate(ax1)
            prev = np.concatenate(([np.int64(-2 ** 62)], run[:-1]))
            seg = np.maximum(
                0, ax1 - np.maximum(ax0, prev)).sum()
            total += int(seg) * int(s1 - s0)
        return pd.DataFrame({
            key_col: pd.Series([group[key_col].iloc[0]], dtype="int64"),
            "area_x4": pd.Series([total], dtype="int64")})

    rep = polygons_ds.map_batches(replicate, batch_format="pandas")
    parts = rep.groupby(["pcell", key_col]).map_groups(
        cell_union, batch_format="pandas")
    out = parts.groupby(key_col).aggregate(
        Sum("area_x4", alias_name="union_area_x4"))
    return out.map_batches(
        lambda df: df.astype({key_col: "int64",
                              "union_area_x4": "int64"}),
        batch_format="pandas")


def zonal_majority(tiles, polygons, div=800, n_classes=8):
    """Zonal MAJORITY — per polygon, the most frequent band-0 class
    (``clip(b0 // div, 0, n_classes−1)``, NODATA excluded) over tiles
    whose center falls inside the polygon; deterministic tiebreak =
    smallest class. The categorical sibling of :func:`zonal_stats`
    (land-cover share reporting).

    Combiner-before-shuffle: each batch reduces its tiles to
    n_classes-long count vectors, probes the broadcast polygon STRtree
    (built once per worker), and pre-aggregates (poly, class) counts
    locally — the exchange carries ≤ |polygons|·n_classes rows per
    batch; pixels never shuffle. Output: poly_id, maj_cls, maj_n,
    n_px (total classified pixels in the zone).
    """
    from ..constants import NODATA
    from .decode import binary_views

    ref = ray.put(polygons)

    def partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        n = batch.num_rows
        counts = np.zeros((n, n_classes), dtype=np.int64)
        for i in range(n):
            npx = int(hs[i]) * int(ws[i])
            b0 = values[offsets[i]:offsets[i] + npx].astype(np.int64)
            b0 = b0[b0 != NODATA]
            cls = np.clip(b0 // div, 0, n_classes - 1)
            counts[i] = np.bincount(cls, minlength=n_classes)
        pip = cached_probe_actor(ref, 0)(
            batch.select(["tile_id", "cell", "cx", "cy"])).to_pandas()
        pip = pip[pip["kind"] == "pip"][["tile_id", "poly_id"]]
        stats = pd.DataFrame({
            "tile_id": batch["tile_id"].to_pylist(),
            **{"c%d" % c: counts[:, c] for c in range(n_classes)}})
        m = pip.merge(stats, on="tile_id")
        agg = m.groupby("poly_id", as_index=False)[
            ["c%d" % c for c in range(n_classes)]].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["c%d" % c for c in range(n_classes)]
        tot = g[cols].sum(axis=0).to_numpy(np.int64)
        maj = int(np.argmax(tot))          # first max = smallest class
        return pd.DataFrame({
            "poly_id": g["poly_id"].iloc[:1].reset_index(drop=True),
            "maj_cls": pd.Series([maj], dtype="int64"),
            "maj_n": pd.Series([int(tot[maj])], dtype="int64"),
            "n_px": pd.Series([int(tot.sum())], dtype="int64")})

    parts = tiles.select_columns(
        ["tile_id", "cell", "cx", "cy", "h", "w", "bands", "pixels"])\
        .map_batches(partial, batch_format="pyarrow")
    return parts.groupby("poly_id").map_groups(
        merge, batch_format="pandas")


def polygon_centroids(polygons_ds):
    """Exact polygon centroid INGREDIENTS per polygon (the companion
    to :func:`polygon_metrics`): with ring coordinates doubled to
    exact int64 (x̂ = 2x), emits the signed shoelace sum ``area2_s =
    Σ(x̂ᵢŷᵢ₊₁ − x̂ᵢ₊₁ŷᵢ)`` and the centroid numerators ``cx_num =
    Σ(x̂ᵢ + x̂ᵢ₊₁)·crossᵢ`` / ``cy_num`` — the true centroid is
    (cx_num, cy_num) / (3·area2_s) / 2, float postprocessing the
    caller does; the distributed result stays integer so the DuckDB
    replay is hash-exact. Stateless one-pass map_batches; no
    shuffle."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, a2, cx, cy = [], [], [], []
        for pid, ring in zip(df["poly_id"], df["ring"]):
            r = np.asarray([[p[0], p[1]] for p in ring], np.float64)
            xi = np.rint(r[:, 0] * 2).astype(np.int64)
            yi = np.rint(r[:, 1] * 2).astype(np.int64)
            cross = xi[:-1] * yi[1:] - xi[1:] * yi[:-1]
            ids.append(pid)
            a2.append(int(cross.sum()))
            cx.append(int(((xi[:-1] + xi[1:]) * cross).sum()))
            cy.append(int(((yi[:-1] + yi[1:]) * cross).sum()))
        return pd.DataFrame({
            "poly_id": ids,
            "area2_s": pd.Series(a2, dtype="int64"),
            "cx_num": pd.Series(cx, dtype="int64"),
            "cy_num": pd.Series(cy, dtype="int64")})

    return polygons_ds.map_batches(fn, batch_format="pandas")


def zonal_median(tiles, polygons, band=0):
    """EXACT zonal median — per polygon, the lower/upper median of
    ``band`` over every tile whose center falls inside (NODATA
    excluded). The order-statistic sibling of :func:`zonal_stats`,
    computed by the bounded-range histogram algorithm: quantile over
    int16 raster values needs no sampling and no sort — a sparse
    (poly, value, count) histogram is an associative partial.

    Combiner-before-shuffle: each batch reduces its tiles to sparse
    per-tile value counts (``np.unique`` — ≤ h·w rows, usually far
    fewer), probes the broadcast polygon STRtree (built once per
    worker), and pre-merges (poly, val) counts locally; the exchange
    carries sparse histogram rows, never pixels. The per-polygon merge
    sorts its ≤ value-range rows and reads both medians off the
    cumsum: med_lo = value at sorted 0-based index (n−1)//2, med_hi at
    index n//2 (equal for odd n). All int64 — hash-checkable against
    an independent full-sort replay."""
    from ..constants import NODATA
    from .decode import binary_views

    ref = ray.put(polygons)

    def partial(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        tids = batch["tile_id"].to_pylist()
        rows_t, rows_v, rows_n = [], [], []
        for i in range(batch.num_rows):
            npx = int(hs[i]) * int(ws[i])
            off = offsets[i] + band * npx
            v = values[off:off + npx].astype(np.int64)
            assert band < int(bands[i])
            v = v[v != NODATA]
            if not len(v):
                continue
            uv, un = np.unique(v, return_counts=True)
            rows_t.extend([tids[i]] * len(uv))
            rows_v.append(uv)
            rows_n.append(un.astype(np.int64))
        if not rows_t:
            return pa.table({
                "poly_id": pa.array([], pa.string()),
                "val": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        hist = pd.DataFrame({
            "tile_id": rows_t,
            "val": np.concatenate(rows_v),
            "n": np.concatenate(rows_n)})
        pip = cached_probe_actor(ref, 0)(
            batch.select(["tile_id", "cell", "cx", "cy"])).to_pandas()
        pip = pip[pip["kind"] == "pip"][["tile_id", "poly_id"]]
        m = pip.merge(hist, on="tile_id")
        agg = m.groupby(["poly_id", "val"], as_index=False)["n"].sum()
        return pa.table({
            "poly_id": pa.array(agg["poly_id"], pa.string()),
            "val": pa.array(agg["val"].astype(np.int64)),
            "n": pa.array(agg["n"].astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("val", as_index=False)["n"].sum()\
            .sort_values("val")
        vals = h["val"].to_numpy(np.int64)
        cum = h["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(vals[np.searchsorted(cum, n // 2 + 1)])
        return pd.DataFrame({
            "poly_id": g["poly_id"].iloc[:1].reset_index(drop=True),
            "n_px": pd.Series([n], dtype="int64"),
            "med_lo": pd.Series([lo], dtype="int64"),
            "med_hi": pd.Series([hi], dtype="int64")})

    parts = tiles.select_columns(
        ["tile_id", "cell", "cx", "cy", "h", "w", "bands", "pixels"])\
        .map_batches(partial, batch_format="pyarrow")
    return parts.groupby("poly_id").map_groups(
        merge, batch_format="pandas")
