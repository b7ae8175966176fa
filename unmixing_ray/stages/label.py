"""Distributed raster connected-component labeling (polygonize) over
tiled images: the classic missing primitive for turning a raster mask
into regions when no tile ever sees the whole image.

Three-phase shape, every phase an exchange Ray Data already schedules:

1. LOCAL LABEL (map_batches, no exchange): per tile, mask = band 0 >
   threshold, then 4-connected components via vectorized min-label
   propagation + pointer jumping over the whole tile stack
   (O(log(h*w)) rounds, all numpy). Emits one NODE row per local
   component (node id, image, pixel count) and an int16 label-grid
   tile (-1 = unmasked) — the only payload that travels.
2. BORDER ADJACENCY (halo exchange, stages/focal.py plumbing): label
   tiles ride ``make_halo_explode(1)``; each group pairs its own
   border labels with the up/left neighbors' facing strips, emitting
   each cross-tile adjacency exactly once as an (node_a, node_b) edge.
3. GLOBAL MERGE: the edge list goes through the same distributed
   connected-components engine as near-dup clusters
   (``dedup.resolve_duplicate_clusters`` — min-label propagation +
   pointer jumping over the PAIR table, never the raster), then a
   tag-union shuffle attaches canonical labels to node rows and two
   narrow groupbys produce per-image component statistics.

Node ids are int64: ``imghash29 << 34 | ty << 22 | tx << 10 | label``
(local labels < 1024 for tiles up to 32x32 — asserted; ty/tx < 4096
asserted, i.e. images up to 131k px on a side at 32-px tiles). The
29-bit image hash only separates images — edges never cross images, so
a collision matters only if two colliding images ALSO have coinciding
border labels; at 10^8 images the expected number of colliding PAIRS
is ~1e-2 and the oracle would catch any effect at test scale.

Scale notes: the exchanges carry the label corpus (1/bands of the
pixel corpus) and the edge/node tables (border components only).
``resolve_duplicate_clusters`` collects the final (node, canon) map on
the driver — bounded by border-crossing components, the same contract
as the dedup path; the map re-enters the cluster as a Dataset for the
final joins, so no per-pixel data ever lands on the driver.

No reference analogue to copy: the reference labels whole in-RAM
rasters through GDAL/numpy; this operator exists for the
tiled-at-scale regime.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .decode import binary_views
from .focal import make_halo_explode

_IMG_BITS = 29
_TY_SHIFT = 22
_TX_SHIFT = 10
_IMG_SHIFT = 34


def _img_hash(image_id: str) -> int:
    return int(hashlib.md5(image_id.encode()).hexdigest()[:8], 16) \
        & ((1 << _IMG_BITS) - 1)


def node_id(image_id, ty, tx, label):
    """Compose the global int64 node id (see module docstring)."""
    assert 0 <= ty < 4096 and 0 <= tx < 4096, (ty, tx)
    assert 0 <= label < 1024, label
    return ((_img_hash(image_id) << _IMG_SHIFT)
            | (int(ty) << _TY_SHIFT) | (int(tx) << _TX_SHIFT)
            | int(label))


def label_components_stack(mask: np.ndarray) -> np.ndarray:
    """4-connected components over a (n, h, w) bool stack.

    Returns an int32 (n, h, w) array of WITHIN-TILE flat pixel indices
    (the component's minimum index); unmasked cells hold their own
    index (callers must re-mask). Min-label propagation with pointer
    jumping — O(log(h*w)) vectorized rounds, exact for any mask shape.
    """
    n, h, w = mask.shape
    hw = h * w
    lab = np.broadcast_to(
        np.arange(hw, dtype=np.int32).reshape(1, h, w), (n, h, w)).copy()
    big = np.int32(hw)
    while True:
        prev = lab.copy()
        for axis, sl_a, sl_b in (
                (1, (slice(None), slice(0, h - 1), slice(None)),
                 (slice(None), slice(1, h), slice(None))),
                (2, (slice(None), slice(None), slice(0, w - 1)),
                 (slice(None), slice(None), slice(1, w)))):
            both = mask[sl_a] & mask[sl_b]
            m = np.minimum(np.where(both, lab[sl_a], big),
                           np.where(both, lab[sl_b], big))
            lab[sl_a] = np.where(both, np.minimum(lab[sl_a], m), lab[sl_a])
            lab[sl_b] = np.where(both, np.minimum(lab[sl_b], m), lab[sl_b])
        flat = lab.reshape(n, hw)
        flat = np.take_along_axis(flat, flat, axis=1)
        flat = np.take_along_axis(flat, flat, axis=1)
        lab = flat.reshape(n, h, w)
        if np.array_equal(lab, prev):
            return lab


def make_local_label(threshold):
    """Stage 1: tiles -> union table of node rows (kind 0) and int16
    label-grid tiles (kind 1, schema-compatible with the halo
    exchange's input). Node rows also carry the component's spatial
    partials in GLOBAL image coordinates (sr/sc coordinate sums,
    r0/c0/r1/c1 bbox) — associative under the same border merge as
    ``px``, and ignored by callers that only need counts."""
    thr = int(threshold)

    def fn(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        bands = batch["bands"].to_numpy()
        row_off = batch["row_off"].to_numpy()
        col_off = batch["col_off"].to_numpy()
        image_id = batch["image_id"].to_pylist()
        tile_id = batch["tile_id"].to_pylist()
        cell = batch["cell"].to_numpy(zero_copy_only=False)

        out = {k: [] for k in (
            "kind", "node", "px", "sr", "sc", "r0", "c0", "r1", "c1",
            "tile_id", "image_id", "cell",
            "row_off", "col_off", "h", "w", "bands", "pixels")}

        def emit(kind, node, px, tid, img, cl, ro, co, h, w, payload,
                 props=(0, 0, 0, 0, 0, 0)):
            out["kind"].append(kind)
            out["node"].append(int(node))
            out["px"].append(int(px))
            for k, v in zip(("sr", "sc", "r0", "c0", "r1", "c1"),
                            props):
                out[k].append(int(v))
            out["tile_id"].append(tid)
            out["image_id"].append(img)
            out["cell"].append(int(cl))
            out["row_off"].append(int(ro))
            out["col_off"].append(int(co))
            out["h"].append(int(h))
            out["w"].append(int(w))
            out["bands"].append(1)
            out["pixels"].append(payload)

        # group the batch by (h, w) so the stack labeling vectorizes
        by_shape: dict = {}
        for i in range(batch.num_rows):
            by_shape.setdefault((int(hs[i]), int(ws[i])), []).append(i)
        for (h, w), idxs in by_shape.items():
            masks = np.empty((len(idxs), h, w), dtype=bool)
            for j, i in enumerate(idxs):
                arr = values[offsets[i]:offsets[i + 1]].reshape(
                    (int(bands[i]), h, w))
                masks[j] = arr[0] > thr
            labs = label_components_stack(masks)
            for j, i in enumerate(idxs):
                m, la = masks[j], labs[j]
                grid = np.full((h, w), -1, dtype=np.int16)
                img = image_id[i]
                ty = int(row_off[i]) // h
                tx = int(col_off[i]) // w
                if m.any():
                    roots, inv = np.unique(la[m], return_inverse=True)
                    if len(roots) >= 1024:
                        raise ValueError(
                            f"{len(roots)} local components in one "
                            f"{h}x{w} tile exceeds the 10-bit label "
                            "budget")
                    grid[m] = inv.astype(np.int16)
                    counts = np.bincount(inv, minlength=len(roots))
                    rs, cs = np.nonzero(m)
                    gr = rs.astype(np.int64) + int(row_off[i])
                    gc = cs.astype(np.int64) + int(col_off[i])
                    k = len(roots)
                    sr = np.bincount(inv, weights=gr,
                                     minlength=k).astype(np.int64)
                    sc = np.bincount(inv, weights=gc,
                                     minlength=k).astype(np.int64)
                    big = np.int64(1) << 40
                    r0 = np.full(k, big)
                    c0 = np.full(k, big)
                    r1 = np.full(k, -1, np.int64)
                    c1 = np.full(k, -1, np.int64)
                    np.minimum.at(r0, inv, gr)
                    np.minimum.at(c0, inv, gc)
                    np.maximum.at(r1, inv, gr)
                    np.maximum.at(c1, inv, gc)
                    for lbl, c in enumerate(counts):
                        emit(0, node_id(img, ty, tx, lbl), c, "", img,
                             0, 0, 0, 0, 0, b"",
                             (sr[lbl], sc[lbl], r0[lbl], c0[lbl],
                              r1[lbl], c1[lbl]))
                emit(1, 0, 0, tile_id[i], img, cell[i], row_off[i],
                     col_off[i], h, w, grid.tobytes())

        return pa.table({
            "kind": pa.array(out["kind"], pa.int8()),
            "node": pa.array(out["node"], pa.int64()),
            "px": pa.array(out["px"], pa.int64()),
            "sr": pa.array(out["sr"], pa.int64()),
            "sc": pa.array(out["sc"], pa.int64()),
            "r0": pa.array(out["r0"], pa.int64()),
            "c0": pa.array(out["c0"], pa.int64()),
            "r1": pa.array(out["r1"], pa.int64()),
            "c1": pa.array(out["c1"], pa.int64()),
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "cell": pa.array(out["cell"], pa.uint64()),
            "row_off": pa.array(out["row_off"], pa.int32()),
            "col_off": pa.array(out["col_off"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
            "bands": pa.array(out["bands"], pa.int32()),
            "pixels": pa.array(out["pixels"], pa.binary())})

    return fn


def make_edge_assemble():
    """Stage 2B: one label tile + halo strips -> cross-tile adjacency
    edges, each emitted once (up and left neighbors only)."""

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        me = g[g["kind"] == 0]
        empty = pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64")})
        if not len(me):
            return empty
        m = me.iloc[0]
        H, W = int(m["h"]), int(m["w"])
        img = m["image_id"]
        ty = int(m["key_row"]) // H
        tx = int(m["key_col"]) // W
        mine = np.frombuffer(m["payload"], dtype=np.int16).reshape(
            (1, H, W))[0]
        a_list, b_list = [], []
        for _, s in g[g["kind"] == 1].iterrows():
            pr, pc = int(s["pos_r"]), int(s["pos_c"])
            if (pr, pc) not in ((-1, 0), (0, -1)):
                continue
            strip = np.frombuffer(s["payload"], dtype=np.int16).reshape(
                (1, int(s["h"]), int(s["w"])))[0]
            if pr == -1:                       # neighbor above
                own, theirs = mine[0, :], strip[0, :]
                nty, ntx = ty - 1, tx
            else:                              # neighbor to the left
                own, theirs = mine[:, 0], strip[:, 0]
                nty, ntx = ty, tx - 1
            both = (own >= 0) & (theirs >= 0)
            if not both.any():
                continue
            pairs = {(int(a), int(b))
                     for a, b in zip(own[both], theirs[both])}
            for a, b in sorted(pairs):
                a_list.append(node_id(img, ty, tx, a))
                b_list.append(node_id(img, nty, ntx, b))
        if not a_list:
            return empty
        return pd.DataFrame({
            "doc_a": pd.Series(a_list, dtype="int64"),
            "doc_b": pd.Series(b_list, dtype="int64")})

    return assemble


def _driver_components(edges_pd: pd.DataFrame) -> pd.DataFrame:
    """Union-find (by min root) over a driver-resident edge list —
    the fast path for edge tables under the driver cap. Same contract
    as ``resolve_duplicate_clusters``: (doc_id, canon_id) for every
    node appearing in the edges, canon = the component's min id."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in zip(edges_pd["doc_a"].to_numpy(),
                    edges_pd["doc_b"].to_numpy()):
        a, b = int(a), int(b)
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    ns = sorted(nodes)
    return pd.DataFrame({
        "doc_id": pd.Series(ns, dtype="int64"),
        "canon_id": pd.Series([find(n) for n in ns], dtype="int64")})


def raster_components(tiles, threshold=1300, driver_edge_cap=1_000_000):
    """Per-image connected-component statistics over the mask
    ``band 0 > threshold`` (see module docstring). Returns a Dataset of
    (image_id, n_components, n_masked, max_size), all exact int64 —
    batching/partitioning-invariant and hash-checkable against a
    full-image sidecar oracle.

    The border-edge merge runs as a driver union-find while the edge
    table is under ``driver_edge_cap`` rows (bounded memory — the same
    class as the (node, canon) map the distributed resolver collects
    anyway) and falls back to the distributed
    ``resolve_duplicate_clusters`` beyond it; ``driver_edge_cap=0``
    forces the distributed path (pinned in pytest)."""
    import ray.data

    from .dedup import resolve_duplicate_clusters

    union = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(make_local_label(threshold), batch_format="pyarrow") \
        .materialize()
    nodes = union.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 0)).select(
            ["node", "image_id", "px"]),
        batch_format="pyarrow")
    labtiles = union.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 1)).select(
            ["tile_id", "image_id", "cell", "row_off", "col_off",
             "h", "w", "bands", "pixels"]),
        batch_format="pyarrow")
    def prune_strips(df: pd.DataFrame) -> pd.DataFrame:
        # the assembler reads only the up/left strips; drop the other
        # 6 (down, right, corners) BEFORE the exchange — halves the
        # strip bytes shuffled
        keep = (df["kind"] == 0) | \
            ((df["pos_r"] == -1) & (df["pos_c"] == 0)) | \
            ((df["pos_r"] == 0) & (df["pos_c"] == -1))
        return df[keep]

    edges = labtiles.map_batches(
        make_halo_explode(1), batch_format="pyarrow") \
        .map_batches(prune_strips, batch_format="pandas") \
        .groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_edge_assemble(), batch_format="pandas") \
        .materialize()

    n_edges = edges.count()
    if not n_edges:
        canon_pd = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "canon_id": pd.Series([], dtype="int64")})
    elif n_edges <= driver_edge_cap:
        canon_pd = _driver_components(edges.to_pandas())
    else:
        canon_pd = resolve_duplicate_clusters(edges)

    # The (node, canon) map is driver-resident on BOTH paths (the
    # distributed resolver collects it too — bounded by border-crossing
    # components); ship it once via ray.put as SORTED ARRAYS (int64
    # node ids exceed 2^53, so no pandas map/float path — searchsorted
    # is exact and vectorized). A node is in the map iff it belongs to
    # a border-crossing component; every other node IS a whole
    # component, so per-batch pandas groupbys reduce those to per-image
    # partial stats and only (image, canon, px) border rows ride the
    # final exchange — one group per IMAGE (not per component), keeping
    # Ray's per-group cost off the component cardinality.
    ck = canon_pd["doc_id"].to_numpy(np.int64)
    cv = canon_pd["canon_id"].to_numpy(np.int64)
    order = np.argsort(ck)
    canon_ref = ray.put((ck[order], cv[order]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ck_s, cv_s = ray.get(canon_ref)
        nv = df["node"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        if len(ck_s):
            pos = np.searchsorted(ck_s, nv)
            safe = np.minimum(pos, len(ck_s) - 1)
            hit = ck_s[safe] == nv
        else:
            safe = np.zeros(len(nv), np.int64)
            hit = np.zeros(len(nv), bool)
        single = pd.DataFrame({
            "image_id": df["image_id"].to_numpy()[~hit],
            "px": px[~hit]})
        g = single.groupby("image_id", sort=False)["px"]
        agg = pd.DataFrame({
            "image_id": g.sum().index,
            "canon": np.int64(-1),
            "cnt": g.count().to_numpy(np.int64),
            "s": g.sum().to_numpy(np.int64),
            "mx": g.max().to_numpy(np.int64)})
        border = pd.DataFrame({
            "image_id": df["image_id"].to_numpy()[hit],
            "canon": cv_s[safe[hit]],
            "cnt": np.int64(0),
            "s": px[hit],
            "mx": np.int64(0)})
        return pd.concat([agg, border], ignore_index=True).astype(
            {"canon": "int64", "cnt": "int64", "s": "int64",
             "mx": "int64"})

    def per_image(g: pd.DataFrame) -> pd.DataFrame:
        sing = g[g["canon"] < 0]
        bord = g[g["canon"] >= 0]
        n = int(sing["cnt"].sum())
        masked = int(sing["s"].sum())
        mx = int(sing["mx"].max()) if len(sing) else 0
        if len(bord):
            sizes = bord.groupby("canon", sort=False)["s"].sum()
            n += len(sizes)
            masked += int(sizes.sum())
            mx = max(mx, int(sizes.max()))
        return pd.DataFrame({
            "image_id": g["image_id"].iloc[:1],
            "n_components": pd.Series([n], dtype="int64"),
            "n_masked": pd.Series([masked], dtype="int64"),
            "max_size": pd.Series([mx], dtype="int64")})

    return nodes.map_batches(partial, batch_format="pandas") \
        .groupby("image_id").map_groups(per_image, batch_format="pandas")


def region_props(tiles, threshold=1300, driver_edge_cap=1_000_000):
    """Per-image REGION PROPERTIES of the largest connected component
    of the mask ``band 0 > threshold`` — area, centroid numerators
    (Σrow, Σcol) and bounding box, all exact int64 in global image
    coordinates (the raster analogue of skimage regionprops, engine-new
    for the tiled-at-scale regime).

    Same three-phase shape as :func:`raster_components` (local label →
    border-adjacency halo exchange → global merge); the spatial
    partials ride the node rows and merge associatively per canonical
    component (sums add, bbox mins/maxes combine). The winner per
    image is the lexicographic max of (px, sr, sc, r0, c0, r1, c1) —
    the OUTPUT IS the ordering tuple, so even a full tie is
    deterministic and oracle-stable.
    """
    import ray.data

    from .dedup import resolve_duplicate_clusters

    PROPS = ["px", "sr", "sc", "r0", "c0", "r1", "c1"]
    union = tiles.select_columns(
        ["tile_id", "image_id", "cell", "row_off", "col_off", "h", "w",
         "bands", "pixels"]) \
        .map_batches(make_local_label(threshold), batch_format="pyarrow") \
        .materialize()
    nodes = union.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 0)).select(
            ["node", "image_id"] + PROPS),
        batch_format="pyarrow")
    labtiles = union.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], 1)).select(
            ["tile_id", "image_id", "cell", "row_off", "col_off",
             "h", "w", "bands", "pixels"]),
        batch_format="pyarrow")

    def prune_strips(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["kind"] == 0) | \
            ((df["pos_r"] == -1) & (df["pos_c"] == 0)) | \
            ((df["pos_r"] == 0) & (df["pos_c"] == -1))
        return df[keep]

    edges = labtiles.map_batches(
        make_halo_explode(1), batch_format="pyarrow") \
        .map_batches(prune_strips, batch_format="pandas") \
        .groupby(["image_id", "key_row", "key_col"]) \
        .map_groups(make_edge_assemble(), batch_format="pandas") \
        .materialize()

    n_edges = edges.count()
    if not n_edges:
        canon_pd = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "canon_id": pd.Series([], dtype="int64")})
    elif n_edges <= driver_edge_cap:
        canon_pd = _driver_components(edges.to_pandas())
    else:
        canon_pd = resolve_duplicate_clusters(edges)
    ck = canon_pd["doc_id"].to_numpy(np.int64)
    cv = canon_pd["canon_id"].to_numpy(np.int64)
    order = np.argsort(ck)
    canon_ref = ray.put((ck[order], cv[order]))

    _MAXK = ("px", "sr", "sc", "r1", "c1")   # combine by max/sum
    _SUMK = ("px", "sr", "sc")
    _MINK = ("r0", "c0")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ck_s, cv_s = ray.get(canon_ref)
        nv = df["node"].to_numpy(np.int64)
        if len(ck_s):
            pos = np.searchsorted(ck_s, nv)
            safe = np.minimum(pos, len(ck_s) - 1)
            hit = ck_s[safe] == nv
        else:
            safe = np.zeros(len(nv), np.int64)
            hit = np.zeros(len(nv), bool)
        # whole (non-border) components: reduce per image to the local
        # best tuple NOW — the exchange carries one candidate row per
        # (batch, image) plus the border rows
        sing = df[~hit]
        best_rows = []
        for img, g in sing.groupby("image_id", sort=False):
            t = g[PROPS].astype("int64")
            win = t.sort_values(PROPS, ascending=False).iloc[0]
            best_rows.append({"image_id": img, "canon": np.int64(-1),
                              **{k: np.int64(win[k]) for k in PROPS}})
        bord = df[hit]
        out = pd.DataFrame(best_rows + [
            {"image_id": r["image_id"],
             "canon": np.int64(cv_s[safe[i]]),
             **{k: np.int64(r[k]) for k in PROPS}}
            for i, (_, r) in zip(np.nonzero(hit)[0],
                                 bord.iterrows())])
        if not len(out):
            out = pd.DataFrame({k: pd.Series([], dtype=(
                "object" if k == "image_id" else "int64"))
                for k in ["image_id", "canon"] + PROPS})
        return out.astype({k: "int64" for k in ["canon"] + PROPS})

    def per_image(g: pd.DataFrame) -> pd.DataFrame:
        cands = [g[g["canon"] < 0]]
        bord = g[g["canon"] >= 0]
        if len(bord):
            agg = bord.groupby("canon", sort=False).agg(
                {**{k: "sum" for k in _SUMK},
                 **{k: "min" for k in _MINK},
                 "r1": "max", "c1": "max"}).reset_index()
            cands.append(agg)
        allc = pd.concat(cands, ignore_index=True)
        if not len(allc):
            return pd.DataFrame({k: pd.Series([], dtype=(
                "object" if k == "image_id" else "int64"))
                for k in ["image_id"] + PROPS})
        win = allc[PROPS].astype("int64")\
            .sort_values(PROPS, ascending=False).iloc[0]
        return pd.DataFrame({
            "image_id": g["image_id"].iloc[:1],
            **{k: pd.Series([np.int64(win[k])], dtype="int64")
               for k in PROPS}})

    return nodes.map_batches(partial, batch_format="pandas") \
        .groupby("image_id").map_groups(per_image, batch_format="pandas")
