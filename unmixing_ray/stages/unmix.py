"""Distributed endmember induction + FCLS unmixing stages.

- ``collect_endmember_candidates``: per-TILE extreme-pixel candidates
  (deterministic regardless of batching — candidates depend only on tile
  content), pooled on the driver, refined with NFINDR. The engine analogue
  of per-partition NFINDR → driver refinement (SURVEY.md §2.7).
- ``ppi_global``: distributed PPI — per-batch skewer extremes with
  (value, tile_id, pixel) merge keys so the global extremity counts are
  independent of batching; same shared seeded skewer matrix everywhere.
- ``FCLSUnmixActor``: the stateful actor-pool stage (axis B): endmember
  matrix + dimension-drop (k = q-1, reference lsma.py:190-197) prepared
  once in ``__init__``; every batch collapses all tiles' pixels into one
  (N, k) matrix for ONE vectorized exact-FCLS solve, then re-splits to
  per-tile abundance payloads. Deterministic at any parallelism
  (reference pin: test/tests.py:62-82).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..kernels import endmembers as em_k
from ..kernels import nnls
from .mnf import mnf_pixels_view


# ---------------------------------------------------------------------------
# endmember candidates → driver NFINDR
#
# ALL induce paths now run through the bounded associative reduce — no
# code path collects per-tile candidate rows on the driver (VERDICT r02
# item 5 retired the legacy to_pandas() collect).

POOL_SHIFT = 4   # candidates reduce per (cell >> POOL_SHIFT, role)

# random-direction candidate roles: extremes along N_DIRS fixed seeded
# directions, in addition to per-band extremes + max-norm. Every vertex
# of the (projected) convex hull is the argmax of SOME direction, so
# direction sampling widens hull coverage of the pool — the per-band
# extremes alone are not guaranteed to contain the MNF-space simplex
# vertices (round-2 advisory finding on the fused induce pool).
N_DIRS = 8


def _role_dirs(p, n_dirs=N_DIRS):
    rng = np.random.default_rng(
        np.random.SeedSequence([20250817, p, n_dirs]))
    d = rng.normal(size=(n_dirs, p))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def induce_endmembers_nfindr(tiles_mnf, q=3, pool_shift=POOL_SHIFT):
    """Bounded MNF-space induce over tiles carrying an ``mnf`` column:
    per-batch candidates (per-band extremes + max-norm + random-direction
    extremes) reduced per (cell >> pool_shift, role) with the associative
    reduce, merged on the driver as O(coarse-cells x roles) reduced
    pools, then NFINDR-refined directly in MNF space. Deterministic and
    batching-invariant (same reduce as the flagship side channel)."""
    import pickle

    def fn(batch: pa.Table) -> pa.Table:
        cand = reflectance_candidates_batch(batch, input_col="mnf")
        red = reduce_candidates([cand], pool_shift)
        return pa.table({"blob": pa.array([pickle.dumps(red)],
                                          pa.binary())})

    lean = tiles_mnf.select_columns(
        ["tile_id", "cell", "bands", "h", "w", "mnf"])
    rows = lean.map_batches(fn, batch_format="pyarrow").take_all()
    pool = merge_side_pools([pickle.loads(r["blob"]) for r in rows],
                            pool_shift)
    idx, _vol = em_k.nfindr(pool["spectra"], q=q)
    return pool["spectra"][np.sort(idx)]


# ---------------------------------------------------------------------------
# fused induce path: reflectance-space candidates as a side channel
#
# The round-1 induce pass was a THIRD full Dataset execution (re-read the
# checkpoint, project MNF, collect candidates). Candidates are instead
# collected in REFLECTANCE space (per-band extremes + max-norm pixel —
# the mixture simplex's vertices are extreme in reflectance space too)
# during the checkpoint-write pass, reduced per (cell, role) with an
# associative merge (driver memory O(n_cells x (2p+1)), VERDICT item 10),
# then projected with the fitted MNF rotation and refined with NFINDR on
# the driver. Batching-invariant: candidates are a per-tile function and
# the (value, tile_id, pixel) merge is associative + commutative.

def reflectance_candidates_batch(batch: pa.Table, input_col="pixels",
                                 n_dirs=N_DIRS, pre_zeroed=None):
    """Per-tile candidates (dict of numpy arrays) from the ``pixels``
    (raw reflectance, int16) or ``mnf`` (projected, float32) column.
    Roles: 2b = argmin of band b, 2b+1 = argmax of band b, 2p = max
    squared L2 norm, 2p+1+d = argmax along seeded random direction d.
    For the reflectance column NoData is zeroed exactly as the MNF
    projection zeroes it, so candidate spectra match the projected
    pixels. Fully vectorized: one row block of (2p+1+n_dirs) candidates
    per tile, no per-tile Python loop."""
    from ..constants import NODATA
    from .decode import tiles_to_ndarray
    if pre_zeroed is not None:
        # shared side-channel fast path: the caller already holds the
        # zeroed float64 batch array (one conversion serves both the
        # MNF-stats and candidate side channels)
        arrays, uniform = None, pre_zeroed
    elif input_col == "mnf":
        arrays, uniform = mnf_pixels_view(batch)
    else:
        arrays, uniform = tiles_to_ndarray(batch)
    tile_ids = np.asarray(batch["tile_id"].to_pylist())
    cells = batch["cell"].to_numpy(zero_copy_only=False)\
        .astype(np.uint64)
    if uniform is None:
        # mixed tile shapes: fall back to per-tile extraction
        col_dtype = np.float32 if input_col == "mnf" else np.int16
        parts = []
        for i, arr in enumerate(arrays):
            one = pa.table({
                "tile_id": pa.array([tile_ids[i]]),
                "cell": pa.array([cells[i]], pa.uint64()),
                "bands": pa.array([arr.shape[0]], pa.int32()),
                "h": pa.array([arr.shape[1]], pa.int32()),
                "w": pa.array([arr.shape[2]], pa.int32()),
                input_col: pa.array([arr.astype(col_dtype).tobytes()],
                                    pa.binary()),
            })
            parts.append(reflectance_candidates_batch(one, input_col,
                                                      n_dirs))
        return _concat_candidates(parts)
    n, p, h, w = uniform.shape
    if pre_zeroed is not None:
        a = uniform                      # already float64 with NoData=0
    else:
        a = uniform.astype(np.float64)   # astype copies
        if input_col != "mnf":
            a[a == NODATA] = 0.0  # the MNF projection zeroes NoData too
    # roles must fit the 6-bit pool-key field
    n_dirs = min(n_dirs, max(0, 63 - (2 * p + 1)))
    X = a.reshape(n, p, h * w)
    mins = X.argmin(axis=2)                        # (n, p)
    maxs = X.argmax(axis=2)                        # (n, p)
    vmin = np.take_along_axis(X, mins[:, :, None], 2)[:, :, 0]
    vmax = np.take_along_axis(X, maxs[:, :, None], 2)[:, :, 0]
    norm = (X ** 2).sum(axis=1)                    # (n, hw)
    inorm = norm.argmax(axis=1)
    vnorm = norm[np.arange(n), inorm]
    r = 2 * p + 1 + n_dirs
    roles = np.empty(r, dtype=np.int16)
    roles[:p] = 2 * np.arange(p)                   # mins
    roles[p:2 * p] = 2 * np.arange(p) + 1          # maxs
    roles[2 * p] = 2 * p                           # norm
    pix_parts = [mins, maxs, inorm[:, None]]
    val_parts = [vmin, vmax, vnorm[:, None]]
    if n_dirs:
        roles[2 * p + 1:] = 2 * p + 1 + np.arange(n_dirs)
        dirs = _role_dirs(p, n_dirs)               # (d, p)
        dproj = np.einsum("dp,nph->ndh", dirs, X)  # (n, d, hw)
        dmax = dproj.argmax(axis=2)                # (n, d)
        dval = np.take_along_axis(dproj, dmax[:, :, None], 2)[:, :, 0]
        pix_parts.append(dmax)
        val_parts.append(dval)
    pixel_mat = np.concatenate(pix_parts, axis=1).astype(np.int32)
    value_mat = np.concatenate(val_parts, axis=1)
    spectra = np.swapaxes(
        np.take_along_axis(X, pixel_mat[:, None, :].astype(np.int64), 2),
        1, 2).reshape(n * r, p)                    # (n*r, p)
    return {
        "cell": np.repeat(cells, r),
        "role": np.tile(roles, n),
        "value": value_mat.reshape(-1),
        "tile_id": np.repeat(tile_ids, r),
        "pixel": pixel_mat.reshape(-1),
        "spectra": spectra,
        "p": p,
    }


def _concat_candidates(parts):
    parts = [c for c in parts if c is not None and len(c["cell"])]
    if not parts:
        return None
    return {
        "cell": np.concatenate([c["cell"] for c in parts]),
        "role": np.concatenate([c["role"] for c in parts]),
        "value": np.concatenate([c["value"] for c in parts]),
        "tile_id": np.concatenate([c["tile_id"] for c in parts]),
        "pixel": np.concatenate([c["pixel"] for c in parts]),
        "spectra": np.vstack([c["spectra"] for c in parts]),
        "p": parts[0]["p"],
    }


def _pack_pool_key(cells, roles, pool_shift):
    """Key = (morton >> pool_shift, level, role) packed into uint64.

    The cell id stores its level at bits 58-63 (cellindex layout); the
    level bits MUST be separated from the morton bits before coarsening,
    else level bit 4 (levels >= 16 shifted by pool_shift=4) silently
    wraps past bit 63 and distinct coarse cells collide. Roles get 6
    bits; coarse morton gets the remaining 52 (enough for any level <=
    28 at pool_shift >= 4 — guarded loudly, not silently)."""
    from ..cellindex import _LEVEL_SHIFT, _MORTON_MASK
    cells = np.asarray(cells, dtype=np.uint64)
    roles = np.asarray(roles).astype(np.uint64)
    if roles.size and int(roles.max()) >= 64:
        raise ValueError("candidate role %d exceeds the 6-bit key field"
                         % int(roles.max()))
    level = cells >> np.uint64(_LEVEL_SHIFT)
    morton = cells & np.uint64(_MORTON_MASK)
    coarse = morton >> np.uint64(pool_shift)
    if coarse.size and int(coarse.max()) >= (1 << 52):
        raise ValueError(
            "coarse morton overflows the 52-bit key field "
            "(cell level too deep for pool_shift=%d)" % pool_shift)
    return (coarse << np.uint64(12)) | (level << np.uint64(6)) | roles


def reduce_candidates(parts, pool_shift=POOL_SHIFT):
    """Vectorized associative reduce of candidate parts: per
    (cell >> pool_shift, role) keep the extreme value (min for even
    band-roles, max otherwise), ties to the lowest (tile_id, pixel).
    Associative + commutative, so reduce(reduce(a), b) == reduce(a, b):
    the side-channel path (one reduce over all parts) and the streaming
    recompute path (chunked reduces) give identical pools."""
    c = _concat_candidates(parts)
    if c is None:
        raise ValueError("no endmember candidates collected")
    p = c["p"]
    key = _pack_pool_key(c["cell"], c["role"], pool_shift)
    is_min = (c["role"] < 2 * p) & (c["role"] % 2 == 0)
    picked = []
    for sense in (True, False):
        sel = np.nonzero(is_min == sense)[0]
        if not len(sel):
            continue
        v = c["value"][sel] if sense else -c["value"][sel]
        order = np.lexsort((c["pixel"][sel], c["tile_id"][sel], v,
                            key[sel]))
        ks = key[sel][order]
        _uniq, first = np.unique(ks, return_index=True)
        picked.append(sel[order][first])
    idx = np.concatenate(picked)
    idx = idx[np.argsort(key[idx], kind="stable")]
    return {
        "key": key[idx],
        "value": c["value"][idx],
        "tile_id": c["tile_id"][idx],
        "pixel": c["pixel"][idx],
        "spectra": c["spectra"][idx],
        "p": p,
    }


def pool_to_part(red, pool_shift=POOL_SHIFT):
    """Convert a reduced pool back into a candidate part so reduced
    pools can be re-reduced (associativity: the representative cell
    reconstructed from the key lands in the same coarse bucket, with the
    level field restored to its bits 58-63 home)."""
    from ..cellindex import _LEVEL_SHIFT
    key = np.asarray(red["key"], dtype=np.uint64)
    morton = (key >> np.uint64(12)) << np.uint64(pool_shift)
    level = (key >> np.uint64(6)) & np.uint64(63)
    return {
        "cell": morton | (level << np.uint64(_LEVEL_SHIFT)),
        "role": (key & np.uint64(63)).astype(np.int16),
        "value": red["value"],
        "tile_id": red["tile_id"],
        "pixel": red["pixel"],
        "spectra": red["spectra"],
        "p": red["p"],
    }


def candidates_side_channel(batch: pa.Table, pool_shift=POOL_SHIFT,
                            pre_zeroed=None):
    """Side-channel form for the checkpoint-write pass: per-batch
    candidates already reduced, so each pickled blob is O(keys-in-batch),
    not O(tiles-in-batch). ``pre_zeroed``: the caller's already-zeroed
    float64 batch array (shared with the MNF-stats side channel — one
    conversion per batch instead of two)."""
    return reduce_candidates(
        [reflectance_candidates_batch(batch, pre_zeroed=pre_zeroed)],
        pool_shift)


def merge_side_pools(pools, pool_shift=POOL_SHIFT):
    """Re-reduce per-batch reduced pools into the global pool."""
    return reduce_candidates([pool_to_part(p, pool_shift) for p in pools],
                             pool_shift)


def nfindr_from_pool(pool, W, q=3):
    """Project the reduced candidate pool with the MNF rotation and
    refine with NFINDR. Pool rows arrive key-sorted — deterministic."""
    W = np.asarray(W, dtype=np.float64)
    Y = pool["spectra"] @ W                  # y = W.T @ x, row form
    idx, _vol = em_k.nfindr(Y, q=q)
    idx = np.sort(idx)
    return Y[idx]


def induce_endmembers_fused(tiles, W, q=3, pool_shift=POOL_SHIFT):
    """Standalone (non-side-channel) form of the fused induce path: one
    column-pruned streaming pass emitting the same per-tile candidates,
    reduced with the same associative reduce — bit-identical endmembers
    to the side-channel path, used on resumed runs where the side
    channel only covered fresh partitions."""
    import pickle

    def fn(batch: pa.Table) -> pa.Table:
        cand = reflectance_candidates_batch(batch)
        red = reduce_candidates([cand], pool_shift)
        return pa.table({"blob": pa.array([pickle.dumps(red)],
                                          pa.binary())})

    lean = tiles.select_columns(
        ["tile_id", "cell", "bands", "h", "w", "pixels"])
    rows = lean.map_batches(fn, batch_format="pyarrow").take_all()
    pool = merge_side_pools([pickle.loads(r["blob"]) for r in rows],
                            pool_shift)
    return nfindr_from_pool(pool, W, q=q)


def simplex_volume(ems, q=None):
    """|det| volume proxy of a (q, p) endmember set in its first q-1
    dims (the NFINDR objective)."""
    E = np.asarray(ems, dtype=np.float64)
    q = q or E.shape[0]
    return em_k._simplex_volume_matrix(E[:, : q - 1])


def induce_guard(tiles, W, q, fused_ems, sample_mod=50, ratio=0.9,
                 seed=0):
    """Volume guard for the fused induce path (round-2 advisory): the
    fused pool holds REFLECTANCE-space extremes per coarse cell, and
    extremity is not preserved under the MNF rotation — so compare the
    fused simplex volume against an NFINDR refinement of per-tile
    MNF-SPACE candidates over a deterministic ~1/sample_mod tile sample
    (one column-pruned pass; pool reduced per (cell, role), ungrouped
    coarsening). If the fused volume dropped materially, re-refine over
    the union of both candidate sets. Returns a dict with the (possibly
    replaced) endmembers and both volumes."""
    import hashlib
    import pickle
    from .mnf import make_apply_mnf
    apply_fn = make_apply_mnf(W)

    def fn(batch: pa.Table) -> pa.Table:
        keep = pa.array(
            [int.from_bytes(hashlib.blake2b(
                ("%s:%d" % (t, seed)).encode(),
                digest_size=8).digest(), "little") % sample_mod == 0
             for t in batch["tile_id"].to_pylist()], pa.bool_())
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return pa.table({"blob": pa.array([], pa.binary())})
        cand = reflectance_candidates_batch(apply_fn(sub),
                                            input_col="mnf")
        red = reduce_candidates([cand], pool_shift=0)
        return pa.table({"blob": pa.array([pickle.dumps(red)],
                                          pa.binary())})

    lean = tiles.select_columns(
        ["tile_id", "cell", "bands", "h", "w", "pixels"])
    rows = lean.map_batches(fn, batch_format="pyarrow").take_all()
    blobs = [pickle.loads(r["blob"]) for r in rows if r["blob"]]
    vol_fused = simplex_volume(fused_ems, q)
    if not blobs:
        return {"endmembers": fused_ems, "vol_fused": vol_fused,
                "vol_sample": 0.0, "fell_back": False}
    pool = merge_side_pools(blobs, pool_shift=0)
    idx, vol_sample = em_k.nfindr(pool["spectra"], q=q)
    out = {"endmembers": fused_ems, "vol_fused": vol_fused,
           "vol_sample": float(vol_sample), "fell_back": False}
    if vol_fused < ratio * vol_sample:
        union = np.vstack([np.asarray(fused_ems, dtype=np.float64),
                           pool["spectra"]])
        uidx, _ = em_k.nfindr(union, q=q)
        out["endmembers"] = union[np.sort(uidx)]
        out["fell_back"] = True
    return out


# ---------------------------------------------------------------------------
# distributed PPI

def ppi_global(tiles_mnf, q=3, num_skewers=2000, seed=99):
    """Distributed Pixel Purity Index over all tiles' MNF pixels.

    Per batch: per-tile skewer extremes are merged WITHIN the batch
    first, bucketed by band count p (tiles with different p use different
    skewer matrices and never compete — a mixed batch previously raised
    on the shape mismatch), so every batch emits 2*num_skewers rows per
    distinct p. The global merge is a ``groupby(p, skewer, kind)``
    tree-reduce (not a driver loop over O(n_batches) rows): the driver
    collects exactly one row per (p, skewer, kind) — O(num_skewers)
    regardless of tile or batch count. Deterministic (value, tile_id,
    pixel) tiebreaks at both levels make the answer batching-invariant.
    Returns (q, p) spectra of the top-q pixels by extremity count
    (count desc, then (tile_id, pixel) asc).
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        arrays, uniform = mnf_pixels_view(batch)
        tile_ids = batch["tile_id"].to_pylist()
        if uniform is None:
            mats = arrays
        else:
            mats = [uniform[i] for i in range(uniform.shape[0])]
        skewers = {}                        # p -> skewer matrix
        best = {}                           # p -> {kind: [v, tid, px, s]}
        for tid, a in zip(tile_ids, mats):
            p = a.shape[0]
            if p not in skewers:
                skewers[p] = em_k.ppi_skewers(p, num_skewers, seed)
                best[p] = {"min": None, "max": None}
            X = a.reshape(p, -1).T.astype(np.float64)
            imin, vmin, imax, vmax = em_k.ppi_block_extremes(X, skewers[p])
            for kind, ii, vv in (("min", imin, vmin), ("max", imax, vmax)):
                spec = X[ii]                       # (s, p)
                cur = best[p][kind]
                if cur is None:
                    best[p][kind] = [
                        vv.copy(),
                        np.full(num_skewers, tid, dtype=object),
                        ii.astype(np.int64), spec.copy()]
                    continue
                cv, ct, cp, cs = cur
                if kind == "min":
                    better = (vv < cv)
                else:
                    better = (vv > cv)
                # ties: lower (tile_id, pixel) wins — compare explicitly
                # to stay order-independent
                tie = vv == cv
                if tie.any():
                    lower = np.array(
                        [(tid, int(ii[s])) < (ct[s], int(cp[s]))
                         for s in np.nonzero(tie)[0]])
                    better = better.copy()
                    better[np.nonzero(tie)[0]] |= lower
                cv[better] = vv[better]
                ct[better] = tid
                cp[better] = ii[better]
                cs[better] = spec[better]
        rows = {"p": [], "skewer": [], "kind": [], "value": [],
                "tile_id": [], "pixel": [], "spectrum": []}
        s_idx = np.arange(num_skewers)
        for p in sorted(best):
            for kind in ("min", "max"):
                if best[p][kind] is None:
                    continue
                cv, ct, cp, cs = best[p][kind]
                rows["p"].extend([p] * num_skewers)
                rows["skewer"].extend(s_idx.tolist())
                rows["kind"].extend([kind] * num_skewers)
                rows["value"].extend(cv.tolist())
                rows["tile_id"].extend(ct.tolist())
                rows["pixel"].extend(cp.tolist())
                rows["spectrum"].extend(cs.tolist())
        return pa.table({
            "p": pa.array(rows["p"], pa.int32()),
            "skewer": pa.array(rows["skewer"], pa.int32()),
            "kind": pa.array(rows["kind"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "tile_id": pa.array(rows["tile_id"], pa.string()),
            "pixel": pa.array(rows["pixel"], pa.int32()),
            "spectrum": pa.array(rows["spectrum"],
                                 pa.list_(pa.float64())),
        })

    def merge_rows(tbl: pa.Table) -> pa.Table:
        """Vectorized associative merge: one winner row per
        (p, skewer, kind). A per-group map_groups spawned thousands of
        tiny pandas groups (~2 ms each — 9 s on a 400-tile corpus);
        one lexsort + first-per-key over the whole block is ms."""
        p_arr = tbl["p"].to_numpy()
        sk = tbl["skewer"].to_numpy()
        kinds = np.asarray(tbl["kind"].to_pylist())
        vals = tbl["value"].to_numpy()
        tids = np.asarray(tbl["tile_id"].to_pylist())
        pxs = tbl["pixel"].to_numpy()
        is_min = kinds == "min"
        # min rows sort by value asc, max rows by -value asc
        sortval = np.where(is_min, vals, -vals)
        key = (p_arr.astype(np.int64) * 2 + is_min.astype(np.int64)) \
            * (int(sk.max()) + 1 if len(sk) else 1) + sk.astype(np.int64)
        order = np.lexsort((pxs, tids, sortval, key))
        _uniq, first = np.unique(key[order], return_index=True)
        sel = np.sort(order[first])
        return tbl.take(sel)

    def merge_block(tbl: pa.Table) -> pa.Table:
        return merge_rows(tbl) if tbl.num_rows else tbl

    # tree-reduce: coalesce per-batch partials into a few blocks, merge
    # each vectorized, then one driver merge over O(num_skewers) rows
    parts = tiles_mnf.map_batches(fn, batch_format="pyarrow")\
        .repartition(16)\
        .map_batches(merge_block, batch_format="pyarrow",
                     batch_size=None)
    blocks = [b for b in parts.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    if not blocks:
        raise ValueError("ppi_global: no tiles")
    winners = merge_rows(pa.concat_tables(blocks)).to_pandas()
    counts = {}
    for _, r in winners.iterrows():
        key = (r["tile_id"], int(r["pixel"]))
        if key not in counts:
            counts[key] = [0, r["spectrum"]]
        counts[key][0] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))
    specs = [np.asarray(spec, dtype=np.float64)
             for (_k, (_c, spec)) in ranked[:q]]
    if specs and any(len(s) != len(specs[0]) for s in specs):
        return specs        # mixed band counts: ragged list of spectra
    return np.array(specs)


# ---------------------------------------------------------------------------
# FCLS actor

ABUNDANCE_FIELDS = [
    ("tile_id", pa.string()), ("image_id", pa.string()),
    ("cell", pa.uint64()), ("h", pa.int32()), ("w", pa.int32()),
    ("q", pa.int32()), ("abundance", pa.binary()),
    ("gt", pa.list_(pa.float64(), 6)), ("crs", pa.string()),
    ("caption", pa.string()), ("cx", pa.float64()), ("cy", pa.float64()),
]


class FCLSUnmixActor:
    """Actor-pool FCLS stage. Constructor args are broadcast by value
    (endmember matrix is tiny). Implements the reference's dimension-drop:
    q endmembers are located in k = q-1 spectral dims (lsma.py:190-197),
    so both the endmember matrix and the pixel matrix are truncated to the
    first k MNF components before the solve."""

    def __init__(self, endmembers, input_col="mnf", n_dims="qminus1",
                 dtype=np.float32):
        U = np.asarray(endmembers, dtype=np.float64)
        self.q = U.shape[0]
        # n_dims: "qminus1" = the reference's dimension-drop (MNF path);
        # None = use every band (reflectance-space unmixing against known
        # library spectra); int = explicit truncation.
        if n_dims == "qminus1":
            self.k = self.q - 1
        elif n_dims is None:
            self.k = U.shape[1]
        else:
            self.k = int(n_dims)
        self.U = U[:, : self.k]
        self.input_col = input_col
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .decode import binary_views
        values, offsets = binary_views(batch[self.input_col], self.dtype)
        bands = batch["bands"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        n = batch.num_rows
        per_tile = []
        sizes = np.empty(n, dtype=np.int64)
        if n and (bands == bands[0]).all() and (hs == hs[0]).all() \
                and (ws == ws[0]).all():
            p, h, w = int(bands[0]), int(hs[0]), int(ws[0])
            cube = values[offsets[0]:offsets[-1]].reshape((n, p, h * w))
            X = cube[:, : self.k, :].transpose(0, 2, 1)\
                .reshape(n * h * w, self.k).astype(np.float64)
            ab = nnls.fcls_pixels(X, self.U)            # (n*h*w, q)
            ab = ab.reshape(n, h * w, self.q).transpose(0, 2, 1)
            flat = ab.astype(np.float32).reshape(-1)
            sizes[:] = self.q * h * w
            all_values = flat
        else:
            for i in range(n):
                p, h, w = int(bands[i]), int(hs[i]), int(ws[i])
                a = values[offsets[i]:offsets[i + 1]].reshape((p, h * w))
                X = a[: self.k].T.astype(np.float64)
                ab = nnls.fcls_pixels(X, self.U).T      # (q, h*w)
                per_tile.append(ab.astype(np.float32).ravel())
                sizes[i] = ab.size
            all_values = np.concatenate(per_tile) if per_tile else \
                np.empty(0, np.float32)
        from .decode import binary_column
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        ab_col = binary_column(
            [all_values[offs[i]:offs[i + 1]] for i in range(n)])
        return pa.table({
            "tile_id": batch["tile_id"],
            "image_id": batch["image_id"],
            "cell": batch["cell"],
            "h": batch["h"], "w": batch["w"],
            "q": pa.array([self.q] * n, pa.int32()),
            "abundance": ab_col,
            "gt": batch["gt"], "crs": batch["crs"],
            "caption": batch["caption"],
            "cx": batch["cx"], "cy": batch["cy"],
        }, schema=pa.schema(ABUNDANCE_FIELDS))


def default_pool_size(reserve=2, cap=8):
    """Actor-pool size that (a) leaves ``reserve`` CPUs for the read /
    write stages — an all-CPU pool starves upstream operators and
    deadlocks the streaming executor (observed: 4 idle actors on a 4-CPU
    session hold every CPU while ReadParquet is backpressured) — and (b)
    caps the pool: Ray actor startup is ~0.5 s each per Dataset execution,
    so oversizing the pool costs more than it buys until per-actor work
    exceeds several seconds (measured on the sf0.1 FCLS stage: 8 actors
    5.4 s wall vs 30 actors 16.1 s). Pass ``cap=None`` for long-running
    jobs where startup amortizes."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if \
        ray.is_initialized() else 4
    size = max(1, cpus - reserve)
    return min(size, cap) if cap else size


def unmix(tiles_mnf, endmembers, concurrency=None, batch_size=64,
          input_col="mnf", n_dims="qminus1", dtype=np.float32):
    """Run the FCLS actor pool over MNF tiles → abundance-tile Dataset.

    ``input_col="pixels", n_dims=None, dtype=np.int16`` unmixes raw
    reflectance tiles against known library spectra (no MNF)."""
    if concurrency is None:
        concurrency = default_pool_size()
    return tiles_mnf.map_batches(
        FCLSUnmixActor,
        fn_constructor_args=(endmembers, input_col, n_dims, dtype),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
