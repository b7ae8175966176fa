"""End-to-end curation composition pipeline (VERDICT r03 item 9):
ledger/placement consistency, checkpoint-resume, image branch, and
compaction wiring."""

import os

import numpy as np
import pytest

import ray.data

from unmixing_ray.pipelines import curation
from unmixing_ray.state import manifest as ckpt

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curation_result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curation"))
    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])
    res = curation.run_curation(docs, out, seq_len=512, threshold=0.35)
    return out, res


def test_ledger_placement_consistent(curation_result):
    """Every kept doc (and only kept docs) appears in the placement
    table; drop sets are disjoint; verdict counts partition the
    corpus."""
    _out, res = curation_result
    led = ckpt.read_output(res["ledger_dir"]).to_pandas()
    pl = ckpt.read_output(res["placement_dir"]).to_pandas()
    n_docs = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet")).count()
    assert len(led) == n_docs
    kept = set(led.loc[led["verdict"] == "kept", "doc_id"])
    assert kept == set(pl["doc_id"])
    assert set(res["exact_drops"]) == set(
        led.loc[led["verdict"] == "exact_dup", "doc_id"])
    assert set(res["near_drops"]) == set(
        led.loc[led["verdict"] == "near_dup", "doc_id"])
    assert not set(res["exact_drops"]) & set(res["near_drops"])
    # the packed stream is gapless: tok_starts are the exclusive
    # prefix sum of n_tokens in doc_id order
    pl = pl.sort_values("doc_id").reset_index(drop=True)
    n = pl["n_tokens"].to_numpy(np.int64)
    start = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert (pl["tok_start"].to_numpy(np.int64) == start).all()


def test_keep_best_keeps_best(curation_result):
    """Within every near-dup cluster the kept member has the maximal
    token count (ties -> min doc_id)."""
    _out, res = curation_result
    kb = res["keep_best"]
    if not len(kb):
        pytest.skip("no near-dup clusters at this sf")
    for _canon, g in kb.groupby("canon_id"):
        best = g.sort_values(["n_tokens", "doc_id"],
                             ascending=[False, True]).iloc[0]
        winner = g.loc[g["kept"] == 1]
        assert len(winner) == 1
        assert winner.iloc[0]["doc_id"] == best["doc_id"]


def test_resume_skips_everything(curation_result):
    """A second run over the same input recomputes no partition: every
    checkpointed file is byte-identical (mtime unchanged)."""
    out, res = curation_result

    def state(d):
        return {os.path.join(p, f):
                os.stat(os.path.join(d, p, f)).st_mtime_ns
                for p in os.listdir(d) if p.startswith("part-")
                for f in os.listdir(os.path.join(d, p))
                if f.endswith(".parquet")}

    dirs = [res["placement_dir"], res["ledger_dir"]]
    before = {d: state(d) for d in dirs}
    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])
    res2 = curation.run_curation(docs, out, seq_len=512,
                                 threshold=0.35)
    assert {d: state(d) for d in dirs} == before
    assert res2["exact_drops"] == res["exact_drops"]
    assert res2["near_drops"] == res["near_drops"]


def test_antijoin_drop_route_matches_broadcast(tmp_path):
    """VERDICT r04 item 1: above ``drop_broadcast_cap`` the drop sets
    stay Datasets and survivors route through the tag-union anti_join —
    on an inflated-dup-mass corpus (every doc duplicated 3x) the
    anti-join route produces the identical ledger + placement, and the
    driver holds NO drop-id lists (``exact_drops`` is None)."""
    import pandas as pd
    from unmixing_ray.stages import dedup as dstage

    base = pd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"]).head(120)
    m = int(base["doc_id"].max()) + 1
    inflated = pd.concat(
        [base] + [base.assign(doc_id=base["doc_id"] + m * (i + 1))
                  for i in range(3)]).reset_index(drop=True)

    def run(out, cap):
        return curation.run_curation(
            ray.data.from_pandas(inflated).repartition(8), out,
            seq_len=512, threshold=0.35, drop_broadcast_cap=cap)

    res_b = run(str(tmp_path / "bcast"), curation.DROP_BROADCAST_CAP)
    res_d = run(str(tmp_path / "dist"), 5)
    assert res_b["drop_mode"] == {"exact": "broadcast",
                                  "near": "broadcast"}
    assert res_d["drop_mode"]["exact"] == "anti_join"
    # the cap bounds what the driver may hold: in anti-join mode the
    # id lists are never collected
    assert res_d["exact_drops"] is None
    assert res_d["exact_drop_count"] == len(res_b["exact_drops"]) > 5
    for sub in ("ledger", "placement"):
        a = ckpt.read_output(os.path.join(res_b[sub + "_dir"])) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = ckpt.read_output(os.path.join(res_d[sub + "_dir"])) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        cols = sorted(set(a.columns) & set(b.columns))
        pd.testing.assert_frame_equal(a[cols], b[cols])

    # the distributed keep-best (hash-join route) matches broadcast
    docs = ray.data.from_pandas(inflated).repartition(8)
    gated = curation.gated_documents(docs)
    pairs = dstage.minhash_lsh_pairs(gated, num_perm=64, bands=16,
                                     k=8, threshold=0.35,
                                     as_dataset=True).materialize()
    kb_b = dstage.keep_best_per_cluster(gated, pairs)
    kb_d = dstage.keep_best_per_cluster(gated, pairs, as_dataset=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    cols = ["doc_id", "canon_id", "n_tokens", "kept"]
    pd.testing.assert_frame_equal(kb_b[cols].reset_index(drop=True),
                                  kb_d[cols])


def test_resume_param_fingerprint(tmp_path):
    """ADVICE r04: resuming into an out_dir with different
    output-changing parameters refuses instead of mixing stale
    partitions with fresh drop sets."""
    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"]).limit(200)
    out = str(tmp_path / "fp")
    curation.run_curation(docs, out, seq_len=512, threshold=0.35)
    with pytest.raises(ValueError, match="different parameters"):
        curation.run_curation(docs, out, seq_len=256, threshold=0.35)
    with pytest.raises(ValueError, match="different parameters"):
        curation.run_curation(docs, out, seq_len=512, threshold=0.5)
    # same params: resume is allowed
    curation.run_curation(docs, out, seq_len=512, threshold=0.35)


def test_image_branch_and_compaction(small_corpus, tmp_path):
    """The image branch writes per-image verdicts through the same
    manifest machinery, and compact_max_files bounds file counts."""
    from unmixing_ray.sources import images as img_src
    from unmixing_ray.stages import curate as cstage
    out = str(tmp_path / "cur_img")
    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])
    res = curation.run_curation(
        docs, out, seq_len=512, threshold=0.35,
        images=img_src.read_images(small_corpus),
        compact_max_files=1)
    iv = ckpt.read_output(res["image_verdicts_dir"]).to_pandas()
    want = cstage.imageprep_decisions(
        img_src.read_images(small_corpus)).to_pandas()
    a = iv[["image_id", "verdict"]].sort_values("image_id")\
        .reset_index(drop=True)
    b = want.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)
    for d in (res["placement_dir"], res["ledger_dir"],
              res["image_verdicts_dir"]):
        for p in os.listdir(d):
            pdir = os.path.join(d, p)
            if p.startswith("part-") and os.path.isdir(pdir):
                n = len([f for f in os.listdir(pdir)
                         if f.endswith(".parquet")])
                assert n <= 1, (d, p, n)
