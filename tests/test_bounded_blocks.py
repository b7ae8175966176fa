"""Row-aware block-count discipline for iterative operators (VERDICT
r04 item 5, generalizing the r4 cluster-resolution fix, commit
838f9e4): per-round union+sort/groupby cost scales with BLOCK count,
not rows, so a working set inherited as near-empty upstream blocks
must compact before the rounds. These tests feed each iterative
operator a 128-near-empty-block input and assert (a) the shared
helper's compaction bound directly, and (b) the operator's result is
identical to the compact-input run — the structural mechanism that
keeps per-round wall time flat, asserted deterministically instead of
by timing."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from unmixing_ray.util import bounded_blocks

pytestmark = pytest.mark.usefixtures("ray_session")


def _scatter(df, nblocks=128):
    """df as nblocks near-empty blocks (every block a few rows)."""
    return ray.data.from_pandas(np.array_split(df, nblocks))


def test_bounded_blocks_compacts_and_is_noop_when_large():
    df = pd.DataFrame({"x": np.arange(400, dtype=np.int64)})
    ds = bounded_blocks(_scatter(df, 128), rows_per_block=65536,
                        floor=8)
    assert ds.num_blocks() == 8
    assert ds.count() == 400
    # row-derived target above the incoming block count: no-op
    big = ray.data.from_pandas(np.array_split(df, 4))
    out = bounded_blocks(big, rows_per_block=10, floor=2)
    assert out.num_blocks() == 4


def _chain_edges(n=300):
    """A few chains + cross links: nontrivial components/levels."""
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    mask = (a % 7) != 0          # break into chains
    return pd.DataFrame({"a": a[mask], "b": b[mask]})


def _canon(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True) \
        .astype("int64")


def test_graph_components_tiny_blocks_invariant():
    from unmixing_ray.stages import relational as rel
    e = _chain_edges()
    got = rel.graph_components(_scatter(e), rounds=4).to_pandas()
    want = rel.graph_components(
        ray.data.from_pandas(e), rounds=4).to_pandas()
    pd.testing.assert_frame_equal(_canon(got, ["v", "comp"]),
                                  _canon(want, ["v", "comp"]))


def test_bfs_sssp_tiny_blocks_invariant():
    from unmixing_ray.stages import relational as rel
    e = _chain_edges()
    edges = pd.DataFrame({"s": e["a"], "t": e["b"]})
    seeds = pd.DataFrame({"v": np.array([0, 50, 200], dtype=np.int64)})
    got = rel.bfs_levels(_scatter(edges), _scatter(seeds, 16),
                         max_depth=3).to_pandas()
    want = rel.bfs_levels(ray.data.from_pandas(edges),
                          ray.data.from_pandas(seeds),
                          max_depth=3).to_pandas()
    pd.testing.assert_frame_equal(_canon(got, ["v", "level"]),
                                  _canon(want, ["v", "level"]))

    wedges = edges.assign(w=np.int64(3))
    got = rel.sssp_rounds(_scatter(wedges), _scatter(seeds, 16),
                          rounds=3).to_pandas()
    want = rel.sssp_rounds(ray.data.from_pandas(wedges),
                           ray.data.from_pandas(seeds),
                           rounds=3).to_pandas()
    pd.testing.assert_frame_equal(_canon(got, ["v", "dist"]),
                                  _canon(want, ["v", "dist"]))


def _lattice_nodes(n=240):
    """Occupied-cell lattice rows (v = packed ix,iy + elevation) the
    terrain flow ops consume."""
    from unmixing_ray.stages import terrain as ter
    rng = np.random.default_rng(7)
    ix = rng.integers(0, 24, n).astype(np.int64)
    iy = rng.integers(0, 24, n).astype(np.int64)
    keep = np.unique(ix * 1000 + iy)
    ix, iy = keep // 1000, keep % 1000
    return pd.DataFrame({
        "v": ix * ter._LAT_PACK + iy,
        "ix": ix, "iy": iy})


def test_flow_basin_strahler_tiny_blocks_invariant():
    from unmixing_ray.stages import terrain as ter
    nodes = _lattice_nodes()
    for op, cols in [
        (lambda ds: ter.flow_accumulation_lattice(ds, rounds=3),
         ["ix", "iy", "acc"]),
        (lambda ds: ter.basin_label_lattice(ds, doublings=3),
         ["ix", "iy", "basin_ix", "basin_iy"]),
        (lambda ds: ter.strahler_order_lattice(ds, rounds=3),
         ["ix", "iy", "strahler"]),
    ]:
        got = op(_scatter(nodes)).to_pandas()
        want = op(ray.data.from_pandas(nodes)).to_pandas()
        pd.testing.assert_frame_equal(_canon(got, cols),
                                      _canon(want, cols))
