"""Terrain analysis over tiled rasters: Horn (1981) slope gradients via
the cross-tile halo exchange.

Horn's method (the de-facto standard for slope/aspect/hillshade, used by
gdaldem) estimates per-pixel gradients from the 3x3 neighborhood:

    dzdx_num = (z[r-1,c+1] + 2 z[r,c+1] + z[r+1,c+1])
             - (z[r-1,c-1] + 2 z[r,c-1] + z[r+1,c-1])
    dzdy_num = (z[r+1,c-1] + 2 z[r+1,c] + z[r+1,c+1])
             - (z[r-1,c-1] + 2 z[r-1,c] + z[r-1,c+1])

The engine keeps the INTEGER numerators (the /(8*cellsize) and the trig
of slope/aspect are monotone per-pixel postprocessing — floats would
cost hash-exactness and add nothing to the distributed semantics), plus
the integer ruggedness proxy dzdx_num^2 + dzdy_num^2. Border rule:
pixels whose full 3x3 neighborhood leaves the IMAGE get 0 in all three
outputs (gdaldem's default skips edges unless -compute_edges).

Scale shape: band 0 (the DEM band) is sliced out of the payload BEFORE
the halo exchange — the exchange carries 1/bands of the corpus plus the
~13% halo strips, never the full spectral payload. Stage A is the
shared ``make_halo_explode`` from stages/focal.py; stage B assembles
the padded DEM and computes the gradients with vectorized shifts.

No reference analogue to copy: the reference operates on whole in-RAM
rasters and has no terrain kernels; this operator exists for the
tiled-at-scale regime (same contract as stages/focal.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import bounded_blocks
import pyarrow as pa

from .decode import binary_views
from .focal import make_halo_explode


def dem_only(batch: pa.Table) -> pa.Table:
    """Slice band 0 out of the (bands, h, w) payload so the halo
    exchange never carries the other bands."""
    values, offsets = binary_views(batch["pixels"], np.int16)
    hs = batch["h"].to_numpy()
    ws = batch["w"].to_numpy()
    bands = batch["bands"].to_numpy()
    payloads = []
    for i in range(batch.num_rows):
        n = int(hs[i]) * int(ws[i])
        arr = values[offsets[i]:offsets[i] + n * int(bands[i])]
        payloads.append(arr[:n].tobytes())
    cols = {name: batch[name] for name in batch.column_names
            if name not in ("pixels", "bands")}
    cols["bands"] = pa.array(np.ones(batch.num_rows, np.int32))
    cols["pixels"] = pa.array(payloads, pa.binary())
    return pa.table(cols)


def horn_gradients(dem, valid):
    """Vectorized Horn numerators over a padded DEM.

    dem: (H+2, W+2) int64 (invalid cells zero); valid: same-shape 0/1.
    Returns (dzdx_num, dzdy_num, ok) each (H, W); ok is 1 where the
    full 3x3 neighborhood is inside the image.
    """
    hp, wp = dem.shape
    H, W = hp - 2, wp - 2

    def sh(dr, dc):
        return dem[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]

    def vs(dr, dc):
        return valid[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]

    ok = np.ones((H, W), dtype=np.int64)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            ok &= vs(dr, dc)
    dzdx = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
            - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))) * ok
    dzdy = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
            - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))) * ok
    return dzdx, dzdy, ok


def _padded_dem(g: pd.DataFrame):
    """Assemble one group's padded DEM from the make_halo_explode layout
    (kind 0 = self tile, kind 1 = neighbor strip at pos_r/pos_c).
    Returns (self_row, dem, valid) or None for self-less groups (strips
    addressed beyond the image border)."""
    me = g[g["kind"] == 0]
    if not len(me):
        return None
    m = me.iloc[0]
    H, W = int(m["h"]), int(m["w"])
    dem = np.zeros((H + 2, W + 2), dtype=np.int64)
    valid = np.zeros((H + 2, W + 2), dtype=np.int64)
    dem[1:1 + H, 1:1 + W] = np.frombuffer(
        m["payload"], dtype=np.int16).reshape((1, H, W))[0]
    valid[1:1 + H, 1:1 + W] = 1
    for _, s in g[g["kind"] == 1].iterrows():
        sh_, sw = int(s["h"]), int(s["w"])
        arr = np.frombuffer(s["payload"], dtype=np.int16).reshape(
            (1, sh_, sw))[0]
        pr, pc = int(s["pos_r"]), int(s["pos_c"])
        rs = slice(0, 1) if pr < 0 else (
            slice(1 + H, 2 + H) if pr > 0 else slice(1, 1 + H))
        cs = slice(0, 1) if pc < 0 else (
            slice(1 + W, 2 + W) if pc > 0 else slice(1, 1 + W))
        dem[rs, cs] = arr
        valid[rs, cs] = 1
    return m, dem, valid


def make_terrain_assemble():
    """Stage B: one DEM tile + halo strips -> per-tile gradient sums.

    Group layout contract is make_halo_explode's (kind 0 = self tile,
    kind 1 = neighbor strip at pos_r/pos_c); strips addressed beyond
    the image border form self-less groups and are dropped.
    """

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "sum_abs_dzdx": pd.Series([], dtype="int64"),
            "sum_abs_dzdy": pd.Series([], dtype="int64"),
            "sum_rugged": pd.Series([], dtype="int64"),
            "n_valid": pd.Series([], dtype="int64")}
        got = _padded_dem(g)
        if got is None:
            return pd.DataFrame(empty)
        m, dem, valid = got
        dzdx, dzdy, ok = horn_gradients(dem, valid)
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "sum_abs_dzdx": pd.Series([int(np.abs(dzdx).sum())],
                                      dtype="int64"),
            "sum_abs_dzdy": pd.Series([int(np.abs(dzdy).sum())],
                                      dtype="int64"),
            "sum_rugged": pd.Series(
                [int((dzdx * dzdx + dzdy * dzdy).sum())], dtype="int64"),
            "n_valid": pd.Series([int(ok.sum())], dtype="int64")})

    return assemble


def hillshade_u(dzdx, dzdy, ok, cellsize, azimuth_deg=315.0,
                altitude_deg=45.0):
    """Per-pixel hillshade from integer Horn numerators, floored to
    integer 1/255 units (gdaldem's Horn hillshade, z_factor = 1).

    DETERMINISM CONTRACT: the sidecar oracle replicates this exact
    sequence of float64 elementwise ops from the same int64 numerators
    (synth.generate_hillshade_expected) — identical inputs + identical
    elementwise expressions give bit-identical float64, so the floored
    integers (and their per-tile sums) are hash-exact. Keep both sides
    in lockstep when editing.
    """
    dx = dzdx / (8.0 * cellsize)
    dy = dzdy / (8.0 * cellsize)
    slope = np.arctan(np.hypot(dx, dy))
    aspect = np.arctan2(dy, -dx)
    az = np.deg2rad(360.0 - azimuth_deg + 90.0)
    alt = np.deg2rad(altitude_deg)
    hs = (np.sin(alt) * np.cos(slope)
          + np.cos(alt) * np.sin(slope) * np.cos(az - aspect))
    return np.floor(np.maximum(hs, 0.0) * 255.0).astype(np.int64) * ok


def make_hillshade_assemble(cellsize, azimuth_deg=315.0,
                            altitude_deg=45.0):
    """Stage B variant: padded DEM -> per-tile hillshade sum (1/255
    units, int64) + valid-pixel count. Border rule matches
    make_terrain_assemble: pixels whose 3x3 neighborhood leaves the
    image contribute 0 and don't count in n_valid."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "sum_hs_u": pd.Series([], dtype="int64"),
            "n_valid": pd.Series([], dtype="int64")}
        got = _padded_dem(g)
        if got is None:
            return pd.DataFrame(empty)
        m, dem, valid = got
        dzdx, dzdy, ok = horn_gradients(dem, valid)
        hs = hillshade_u(dzdx, dzdy, ok, cellsize, azimuth_deg,
                         altitude_deg)
        return pd.DataFrame({
            "tile_id": [m["tile_id"]],
            "sum_hs_u": pd.Series([int(hs.sum())], dtype="int64"),
            "n_valid": pd.Series([int(ok.sum())], dtype="int64")})

    return assemble


def hillshade_tiles(tiles, cellsize, azimuth_deg=315.0,
                    altitude_deg=45.0):
    """Distributed Horn hillshade summary per tile: same halo-exchange
    shape as terrain_slope_tiles (DEM band sliced out before the
    exchange), per-pixel shading floored to 1/255 integer units so the
    per-tile sum is order-independent and hash-checkable against the
    full-image sidecar oracle."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(dem_only, batch_format="pyarrow") \
        .map_batches(make_halo_explode(1), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_hillshade_assemble(cellsize, azimuth_deg,
                                            altitude_deg),
                    batch_format="pandas")


def terrain_slope_tiles(tiles):
    """Distributed Horn gradient summary per tile (see module
    docstring). Returns (tile_id, sum_abs_dzdx, sum_abs_dzdy,
    sum_rugged, n_valid) — all int64, batching/partitioning-invariant
    and hash-checkable against the full-image sidecar oracle."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(dem_only, batch_format="pyarrow") \
        .map_batches(make_halo_explode(1), batch_format="pyarrow")
    return exploded.groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_terrain_assemble(), batch_format="pandas")


# ---------------------------------------------------------------------------
# D8 flow direction (steepest descent), exact integer slope comparison

# neighbor precedence order with ESRI D8 codes: E, SE, S, SW, W, NW, N,
# NE — ties keep the EARLIER code (strict-greater update)
_D8 = ((0, 1, 1, False), (1, 1, 2, True), (1, 0, 4, False),
       (1, -1, 8, True), (0, -1, 16, False), (-1, -1, 32, True),
       (-1, 0, 64, False), (-1, 1, 128, True))


def d8_flow(dem, valid):
    """Per-pixel D8 steepest-descent code over a padded DEM.

    dem: (H+2, W+2) int64 (invalid cells zero); valid: same-shape 0/1.
    For each existing (valid) neighbor with a POSITIVE drop d = z−zₙ,
    the slope is d/1 (cardinal) or d/√2 (diagonal); the steepest is
    chosen by the EXACT integer surrogate score = 2·d² (cardinal) vs
    d² (diagonal) — slope_c > slope_d ⟺ 2·d_c² > d_d² for positive
    drops, and same-type comparisons reduce to comparing drops, so no
    float (or √2) ever enters. Neighbors outside the image are
    excluded (the window is intersected with the image, matching the
    focal-stat edge rule); pits/flats (no positive drop) get code 0.
    Ties keep the first code in the fixed E,SE,S,SW,W,NW,N,NE order.
    Returns (H, W) int64 codes.
    """
    hp, wp = dem.shape
    H, W = hp - 2, wp - 2
    z = dem[1:1 + H, 1:1 + W]
    best_score = np.zeros((H, W), dtype=np.int64)
    best_code = np.zeros((H, W), dtype=np.int64)
    for dr, dc, code, diag in _D8:
        zn = dem[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        vn = valid[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        drop = z - zn
        pos = (drop > 0) & (vn > 0)
        score = np.where(pos, drop * drop * (1 if diag else 2), 0)
        upd = score > best_score
        best_code = np.where(upd, code, best_code)
        best_score = np.where(upd, score, best_score)
    return best_code


def make_flow_assemble():
    """Stage B: one DEM tile + halo strips → per-(tile, code) counts of
    the D8 flow-direction raster (the compact hash-checkable summary).
    Group layout contract is make_halo_explode's."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "tile_id": pd.Series([], dtype=object),
            "code": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64")}
        got = _padded_dem(g)
        if got is None:
            return pd.DataFrame(empty)
        m, dem, valid = got
        codes = d8_flow(dem, valid)
        uniq, cnt = np.unique(codes, return_counts=True)
        return pd.DataFrame({
            "tile_id": [m["tile_id"]] * len(uniq),
            "code": pd.Series(uniq, dtype="int64"),
            "n": pd.Series(cnt, dtype="int64")})

    return assemble


def flow_direction_tiles(tiles):
    """Distributed D8 flow direction over tiled DEMs: band 0 pruned
    out of the payload BEFORE the radius-1 halo exchange (the same
    byte discipline as terrain_slope_tiles), then a vectorized exact
    integer steepest-descent kernel per assembled tile."""
    exploded = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]).map_batches(
        dem_only, batch_format="pyarrow").map_batches(
        make_halo_explode(1), batch_format="pyarrow")
    return exploded.groupby(
        ["image_id", "key_row", "key_col"]).map_groups(
        make_flow_assemble(), batch_format="pandas")


# ---------------------------------------------------------------------------
# lattice flow accumulation (functional-graph mass propagation)

FLOW_ELEV_MX = 1000003
FLOW_ELEV_MY = 7919
FLOW_ELEV_MOD = 104729
_LAT_PACK = np.int64(1) << 21


def lattice_elevation(v):
    """Deterministic synthetic elevation of a packed lattice node
    ``v = ix·2²¹ + iy`` — a pure int64 function both the engine and
    the SQL oracle compute identically (same contract as the
    cell_sssp arc weights): ``(ix·1000003 + iy·7919) mod 104729``."""
    v = np.asarray(v, dtype=np.int64)
    ix = v // _LAT_PACK
    iy = v % _LAT_PACK
    return (ix * FLOW_ELEV_MX + iy * FLOW_ELEV_MY) % FLOW_ELEV_MOD


def flow_downstream_edges(nodes):
    """The D8-style downstream edge set over the occupied cell
    LATTICE: each node flows to its lowest strictly-lower occupied
    4-neighbor (tie-break by direction precedence E, N, W, S =
    +ix, +iy, −ix, −iy); nodes with no lower occupied neighbor are
    pits (no out-edge).

    Scale shape: candidates are generated per batch (4 per node),
    occupancy-filtered by one :func:`semi_join` against the node set,
    and the per-source argmin is an ASSOCIATIVE packed-int64 min
    (``elev_t·4 + precedence``) — one ``groupby(s).min`` exchange, no
    per-node map_groups (the 0.4 ms/group hazard, see stages/label.py).
    The winning target is reconstructed from (source, precedence), so
    only (s, packed) travels through the aggregate."""
    from ray.data.aggregate import Min
    from .relational import semi_join

    offs = np.array([_LAT_PACK, 1, -_LAT_PACK, -1], dtype=np.int64)

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        iy = v % _LAT_PACK
        ix = v // _LAT_PACK
        parts_s, parts_t, parts_p = [], [], []
        ok_by_prec = [
            np.ones(len(v), dtype=bool),          # +ix
            iy < _LAT_PACK - 1,                   # +iy (no wrap up)
            ix > 0,                               # -ix (no negative)
            iy > 0,                               # -iy (no wrap down)
        ]
        for prec in range(4):
            ok = ok_by_prec[prec]
            parts_s.append(v[ok])
            parts_t.append(v[ok] + offs[prec])
            parts_p.append(np.full(int(ok.sum()), prec, dtype=np.int64))
        return pd.DataFrame({
            "s": np.concatenate(parts_s),
            "t": np.concatenate(parts_t),
            "prec": np.concatenate(parts_p)})

    occ = semi_join(nodes.map_batches(cands, batch_format="pandas"),
                    nodes, "t", right_key="v")

    def pack_lower(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        prec = df["prec"].to_numpy(np.int64)
        es = lattice_elevation(s)
        et = lattice_elevation(t)
        keep = et < es
        return pd.DataFrame({
            "s": s[keep],
            "packed": et[keep] * 4 + prec[keep]})

    best = occ.map_batches(pack_lower, batch_format="pandas")\
        .groupby("s").aggregate(Min("packed", alias_name="packed"))

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        prec = df["packed"].to_numpy(np.int64) % 4
        return pd.DataFrame({"s": s, "t": s + offs[prec]})

    return best.map_batches(unpack, batch_format="pandas")


def flow_accumulation_lattice(nodes, rounds=4):
    """Flow ACCUMULATION over the occupied cell lattice — per node,
    the number of upstream nodes within ``rounds`` hops along the
    :func:`flow_downstream_edges` functional graph (engine-new; the
    hydrology counterpart of the pixel-level D8 kernel in this
    module, run at the tile-lattice scale where the flow graph spans
    every partition).

    The fixed-round contract is the SQL-replayability discipline of
    ``pagerank_iters``/``sssp_rounds``: after round k every node holds
    the EXACT count of nodes exactly k hops upstream (out-degree ≤ 1
    makes each round a clean mass hop), so acc = Σₖ fₖ is bit-stable
    at any partitioning and a DuckDB oracle replays the rounds as
    stacked CTEs. Scale shape per round: ONE partitioned hash join
    (frontier ⨝ edges on source) + ONE groupby(dst) sum with a
    per-batch pandas combiner; the edge table is built once and
    materialized. Unbounded accumulation (to the basin outlet) is
    image-diameter many rounds — the cap is the scale design, same as
    stages/morphology.py's saturated distance transform.

    Returns (ix, iy, acc) for every node with ≥1 upstream neighbor
    within the cap."""
    from ray.data.aggregate import Sum
    from .relational import hash_join

    edges = bounded_blocks(flow_downstream_edges(nodes))

    f = edges.map_batches(
        lambda df: pd.DataFrame({
            "s": df["t"].astype("int64"),
            "m": np.ones(len(df), dtype=np.int64)}),
        batch_format="pandas")

    def combine_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("s", as_index=False)["m"].sum()
        return pd.DataFrame({"s": g["s"].to_numpy(np.int64),
                             "m": g["m"].to_numpy(np.int64)})

    f = bounded_blocks(
        f.map_batches(combine_sum, batch_format="pandas")
        .groupby("s").aggregate(Sum("m", alias_name="m"))
        .map_batches(lambda df: df.astype({"s": "int64", "m": "int64"}),
                     batch_format="pandas"))
    acc_parts = [f]
    for _ in range(rounds - 1):
        hop = hash_join(f, edges, "s", left_cols=["m"],
                        right_cols=["t"])
        f = bounded_blocks(
            hop.map_batches(
                lambda df: pd.DataFrame({
                    "s": df["t"].astype("int64"),
                    "m": df["m"].astype("int64")}),
                batch_format="pandas")
            .map_batches(combine_sum, batch_format="pandas")
            .groupby("s").aggregate(Sum("m", alias_name="m"))
            .map_batches(
                lambda df: df.astype({"s": "int64", "m": "int64"}),
                batch_format="pandas"))
        acc_parts.append(f)

    acc = acc_parts[0]
    for part in acc_parts[1:]:
        acc = acc.union(part)
    total = acc.groupby("s").aggregate(Sum("m", alias_name="acc"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "ix": s // _LAT_PACK,
            "iy": s % _LAT_PACK,
            "acc": df["acc"].to_numpy(np.int64)})

    return total.map_batches(finish, batch_format="pandas")


def basin_label_lattice(nodes, doublings=4):
    """Watershed BASIN labeling over the occupied cell lattice —
    every node labeled with the node its water reaches after
    ``2**doublings`` downstream hops along
    :func:`flow_downstream_edges` (pits point at themselves, so a
    converged node's label IS its basin outlet). Pointer DOUBLING is
    the scale design: each round composes the pointer table with
    itself through ONE partitioned hash join, so 2^k-hop reachability
    costs k exchanges instead of 2^k — the same log-round discipline
    as stages/label.py's pointer jumping, applied to a functional
    graph. The fixed cap keeps the operator SQL-replayable (stacked
    self-join CTEs) and bit-stable at any partitioning.

    Packed node ids are < 2^42, so the float64 hop through the left
    join's None padding is exact (the stages/label.py > 2^53 hazard
    does not apply; asserted below).

    Returns (ix, iy, basin_ix, basin_iy) for every node."""
    from .relational import hash_join

    edges = flow_downstream_edges(nodes)

    base = hash_join(
        nodes.map_batches(
            lambda df: pd.DataFrame({"s": df["v"].astype("int64")}),
            batch_format="pandas"),
        edges, "s", left_cols=[], right_cols=["t"], how="left")

    def to_ptr(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        assert (s < (1 << 53)).all()
        t = pd.to_numeric(df["t"]).to_numpy(np.float64)
        p = np.where(np.isnan(t), s, t).astype(np.int64)
        return pd.DataFrame({"v": s, "p": p})

    ptr = bounded_blocks(base.map_batches(to_ptr,
                                          batch_format="pandas"))

    for _ in range(doublings):
        lookup = ptr.map_batches(
            lambda df: pd.DataFrame({"p": df["v"].astype("int64"),
                                     "p2": df["p"].astype("int64")}),
            batch_format="pandas")
        ptr = bounded_blocks(
            hash_join(ptr, lookup, "p", left_cols=["v"],
                      right_cols=["p2"]).map_batches(
                lambda df: pd.DataFrame({"v": df["v"].astype("int64"),
                                         "p": df["p2"].astype("int64")}),
                batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        return pd.DataFrame({
            "ix": v // _LAT_PACK, "iy": v % _LAT_PACK,
            "basin_ix": p // _LAT_PACK, "basin_iy": p % _LAT_PACK})

    return ptr.map_batches(finish, batch_format="pandas")


def strahler_order_lattice(nodes, rounds=4):
    """STRAHLER STREAM ORDER over the occupied-cell flow graph
    (engine-new; the stream-network statistic downstream of
    :func:`flow_downstream_edges`): a source cell has order 1; a cell
    whose upstream neighbors reach maximum order m gets m + 1 when ≥ 2
    of them reach m, else m.

    The exact order needs longest-upstream-path many propagation
    rounds, so this computes the FIXED-ROUND iterate (the
    SQL-replayability contract shared with
    :func:`flow_accumulation_lattice` and ``sssp_rounds``): ord₀ = 1
    everywhere, and each round every cell with upstream neighbors
    recomputes from the previous iterate — after k rounds the value is
    exact for every cell whose longest upstream path is ≤ k, and the
    k-round iterate itself is a pure function of the graph, bit-stable
    at any partitioning. Per round: ONE partitioned hash join
    (orders ⨝ edges) + a (cell, ord) count aggregate (per-batch
    combiner first) + an associative packed Max — ``ord·2 + (c ≥ 2)``
    is monotone in ord, so one Min/Max-style reduce picks the max
    upstream order AND its ≥2-multiplicity flag together, no per-node
    map_groups (the 0.4 ms/group hazard, stages/label.py). Source
    cells (never an edge target) are re-unioned at order 1 each round.

    Returns (ix, iy, strahler) for every occupied cell."""
    from ray.data.aggregate import Max, Sum
    from .relational import anti_join, hash_join

    edges = bounded_blocks(flow_downstream_edges(nodes).map_batches(
        lambda df: df.astype({"s": "int64", "t": "int64"}),
        batch_format="pandas"))
    sources = anti_join(
        nodes.map_batches(lambda df: pd.DataFrame({
            "v": df["v"].astype("int64"),
            "ord": np.ones(len(df), dtype=np.int64)}),
            batch_format="pandas"),
        edges, "v", right_key="t").materialize()

    ord_ds = nodes.map_batches(
        lambda df: pd.DataFrame({
            "s": df["v"].astype("int64"),
            "ord": np.ones(len(df), dtype=np.int64)}),
        batch_format="pandas").materialize()

    def combine_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["t", "ord"], as_index=False).size()
        return pd.DataFrame({
            "t": g["t"].to_numpy(np.int64),
            "ord": g["ord"].to_numpy(np.int64),
            "c": g["size"].to_numpy(np.int64)})

    for _ in range(rounds):
        up = hash_join(ord_ds, edges, "s", left_cols=["ord"],
                       right_cols=["t"])
        cnt = up.map_batches(combine_counts, batch_format="pandas")\
            .groupby(["t", "ord"]).aggregate(Sum("c", alias_name="c"))

        def pack(df: pd.DataFrame) -> pd.DataFrame:
            o = df["ord"].to_numpy(np.int64)
            c = df["c"].to_numpy(np.int64)
            return pd.DataFrame({
                "t": df["t"].to_numpy(np.int64),
                "packed": o * 2 + (c >= 2).astype(np.int64)})

        upd = cnt.map_batches(pack, batch_format="pandas")\
            .groupby("t").aggregate(Max("packed", alias_name="packed"))\
            .map_batches(
            lambda df: pd.DataFrame({
                "s": df["t"].to_numpy(np.int64),
                "ord": (df["packed"].to_numpy(np.int64) >> 1)
                + (df["packed"].to_numpy(np.int64) & 1)}),
            batch_format="pandas")
        ord_ds = bounded_blocks(upd.union(sources.map_batches(
            lambda df: pd.DataFrame({
                "s": df["v"].astype("int64"),
                "ord": df["ord"].astype("int64")}),
            batch_format="pandas")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "ix": s // _LAT_PACK,
            "iy": s % _LAT_PACK,
            "strahler": df["ord"].to_numpy(np.int64)})

    return ord_ds.map_batches(finish, batch_format="pandas")


VIEW_DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1),
             (-1, 0), (-1, -1), (0, -1), (1, -1))


def viewshed_lattice(nodes, radius=4):
    """Bounded-radius VIEWSHED over the occupied cell lattice
    (engine-new; the GIS line-of-sight headline op): per cell, how
    many cells within ``radius`` steps along the 8 principal rays are
    VISIBLE — every intermediate ray cell is occupied AND sits below
    the sight line, with the LOS slope test as an exact integer
    cross-multiplication (eₘ − e_v)·d < (e_t − e_v)·t_d (no float
    slopes; elevations are the closed-form lattice elevation, so the
    oracle recomputes them in SQL).

    The radius cap is the scale design (the saturated-distance-
    transform contract): an unbounded viewshed needs image-diameter
    ray lengths, a bounded one needs exactly ONE occupancy exchange.
    Elevations cost nothing to ship — they are a pure function of the
    coordinates — so the only distributed work is ray-cell OCCUPANCY:
    each node emits its ≤ 8·radius ray targets once, one
    :func:`~.relational.semi_join` keeps the occupied ones, and one
    ``groupby(v)`` bit-OR-as-Sum collapses them into a single int64
    occupancy mask per node (bit dir·radius + (d−1) — distinct bits,
    so Sum ≡ OR; no per-(node, dir) groups). The finish stage is pure
    vectorized numpy over (node, dir, d). Returns (ix, iy,
    n_visible)."""
    from ray.data.aggregate import Sum
    from .relational import semi_join

    offs = [(np.int64(dx) * _LAT_PACK + np.int64(dy), dx, dy)
            for dx, dy in VIEW_DIRS]
    rad = int(radius)

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        iy = v % _LAT_PACK
        ix = v // _LAT_PACK
        parts_v, parts_t, parts_b = [], [], []
        for k, (off, dx, dy) in enumerate(offs):
            for d in range(1, rad + 1):
                ok = np.ones(len(v), dtype=bool)
                if dx > 0:
                    ok &= ix < (_LAT_PACK - 1) - (d - 1)
                elif dx < 0:
                    ok &= ix >= d
                if dy > 0:
                    ok &= iy < _LAT_PACK - d
                elif dy < 0:
                    ok &= iy >= d
                parts_v.append(v[ok])
                parts_t.append(v[ok] + off * d)
                parts_b.append(np.full(int(ok.sum()),
                                       np.int64(1) << (k * rad + d - 1),
                                       dtype=np.int64))
        # zero-bit self row: keeps isolated nodes (no occupied ray
        # cell at all) in the mask table with n_visible = 0
        parts_v.append(v)
        parts_t.append(v)
        parts_b.append(np.zeros(len(v), dtype=np.int64))
        return pd.DataFrame({
            "src": np.concatenate(parts_v),
            "t": np.concatenate(parts_t),
            "bit": np.concatenate(parts_b)})

    occ = semi_join(nodes.map_batches(cands, batch_format="pandas"),
                    nodes, "t", right_key="v")
    masks = occ.map_batches(
        lambda df: df.groupby("src", as_index=False)["bit"].sum()
        .astype({"src": "int64", "bit": "int64"}),
        batch_format="pandas")\
        .groupby("src").aggregate(Sum("bit", alias_name="mask"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        v = df["src"].to_numpy(np.int64)
        mask = df["mask"].to_numpy(np.int64)
        iy = v % _LAT_PACK
        ix = v // _LAT_PACK
        ev = lattice_elevation(v)
        n_vis = np.zeros(len(v), dtype=np.int64)
        for k, (off, _dx, _dy) in enumerate(offs):
            # occupancy prefix along ray k: all of 1..d present
            prefix_ok = np.ones(len(v), dtype=bool)
            for d in range(1, rad + 1):
                has = (mask >> (k * rad + d - 1)) & 1 == 1
                prefix_ok = prefix_ok & has
                if not prefix_ok.any():
                    break
                et = lattice_elevation(v + off * d)
                los = np.ones(len(v), dtype=bool)
                for td in range(1, d):
                    em = lattice_elevation(v + off * td)
                    los &= (em - ev) * d < (et - ev) * td
                n_vis += (prefix_ok & los).astype(np.int64)
        return pd.DataFrame({"ix": ix, "iy": iy, "n_visible": n_vis})

    return masks.map_batches(finish, batch_format="pandas")
