"""Multimodal (image + caption) training-corpus curation.

``imageprep_decisions`` is the image-side analogue of
``text.textprep_decisions``: one end-to-end per-IMAGE keep/drop verdict
with a reason code, the LAION-style curation pass a 10^12-image corpus
needs before training — decode-derived quality gates (NoData gaps, QA
cloud cover, radiometric saturation — the reference's own masking
primitives, kernels/masks.py: density_slice / saturation_mask / cfmask
family), a caption-topic gate, then exact keep-first dedup by phash
among the gate passers.

Scale shape: ONE vectorized decode+feature pass computes every gate per
batch (decode once, all gates off the same ndarray view); the single
shuffle then carries only (image_id, verdict, key) — pixels and
captions never enter the exchange, and gate failures ride the same
shuffle under per-image singleton keys so there is no second pass over
the corpus and no branch re-execution. Verdict = FIRST failing gate of
gap -> cloudy -> saturated -> topic, else 'duplicate' (a passing image
whose phash has a smaller passing image_id) or 'keep'.

Oracle: the corpus generator's per-image planted-feature sidecar
(images_expected.parquet — inline numpy, not engine kernels) supplies
the decode-derived counts; caption/dedup gates replay in plain SQL over
the images table (__ray_entry__.py: imageprep_decisions).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..constants import NODATA

TOPIC_PATTERN = "water|vegetation|urban|forest"


def imageprep_decisions(images, max_nodata=0, max_qa_masked=0,
                        max_saturated=0, topic_pattern=TOPIC_PATTERN):
    """Per-image curation verdicts over the raw images table (see
    module docstring). Returns (image_id, verdict)."""
    topic = re.compile(topic_pattern)

    def feats(batch: pa.Table) -> pa.Table:
        from ..kernels import masks as mk
        from .decode import binary_views, decode_batch, tiles_to_ndarray
        dec = decode_batch(batch)
        arrays, uniform = tiles_to_ndarray(dec)
        qa_vals, qa_off = binary_views(dec["qa"], np.uint8)
        hs = dec["h"].to_numpy()
        ws = dec["w"].to_numpy()
        caps = dec["caption"].to_pylist()
        phash = dec["phash"].to_numpy()
        ids = dec["image_id"].to_pylist()
        verdicts, keys = [], []
        for i in range(dec.num_rows):
            arr = uniform[i] if uniform is not None else arrays[i]
            qa = qa_vals[qa_off[i]:qa_off[i + 1]]\
                .reshape((int(hs[i]), int(ws[i])))
            if int((arr[0] == NODATA).sum()) > max_nodata:
                v = "gap"
            elif int(mk.cfmask(qa).sum()) > max_qa_masked:
                v = "cloudy"
            elif int(mk.saturation_mask(arr).sum()) > max_saturated:
                v = "saturated"
            elif not topic.search(caps[i]):
                v = "topic"
            else:
                v = ""
            verdicts.append(v)
            # failures get a singleton shuffle key so they ride the
            # same exchange without joining any dedup group
            keys.append(str(int(phash[i])) if v == "" else "f" + ids[i])
        return pa.table({
            "image_id": dec["image_id"],
            "verdict": pa.array(verdicts, pa.string()),
            "key": pa.array(keys, pa.string())})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["image_id", "verdict"]].copy()
        if (out["verdict"] == "").any():
            first = g["image_id"].min()
            out["verdict"] = np.where(g["image_id"] == first, "keep",
                                      "duplicate")
        return out

    return images.map_batches(feats, batch_format="pyarrow",
                              batch_size=32) \
        .groupby("key").map_groups(decide, batch_format="pandas")


def blur_scores(images, band=0):
    """Laplacian blur-detection ingredients per image — the classic
    blurry-image curation gate (variance of the discrete Laplacian:
    sharp images have heavy-tailed second derivatives; see e.g.
    Pech-Pacheco et al. 2000, "Diatom autofocusing in brightfield
    microscopy"): per image the EXACT int64 sums

        lap_sum  = Σ L,   lap_sq   = Σ L²,   n_lap = #interior px,
        L = 4·z − z↑ − z↓ − z← − z→   (NODATA pixels excluded)

    so the variance (lap_sq/n − (lap_sum/n)²) and any threshold on it
    are float postprocessing the caller does — the distributed result
    stays integer and hash-checks. One stateless decode+shift pass, no
    shuffle; interior = pixels whose 4-neighborhood is inside the
    image AND fully non-NODATA."""
    from ..codecs import decode_image
    from ..constants import NODATA

    def fn(t: pa.Table) -> pa.Table:
        ids, ls, lq, nl = [], [], [], []
        for i in range(t.num_rows):
            arr = decode_image(t["bytes"][i].as_py(),
                               t["fmt"][i].as_py(),
                               int(t["w"][i].as_py()),
                               int(t["h"][i].as_py()))
            z = arr[band].astype(np.int64)
            ok = (z != NODATA).astype(np.int64)
            c = z[1:-1, 1:-1]
            lap = (4 * c - z[:-2, 1:-1] - z[2:, 1:-1]
                   - z[1:-1, :-2] - z[1:-1, 2:])
            good = (ok[1:-1, 1:-1] & ok[:-2, 1:-1] & ok[2:, 1:-1]
                    & ok[1:-1, :-2] & ok[1:-1, 2:]).astype(bool)
            ids.append(t["image_id"][i].as_py())
            ls.append(int(lap[good].sum()))
            lq.append(int((lap[good] ** 2).sum()))
            nl.append(int(good.sum()))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "lap_sum": pa.array(ls, pa.int64()),
            "lap_sq": pa.array(lq, pa.int64()),
            "n_lap": pa.array(nl, pa.int64())})

    return images.map_batches(fn, batch_format="pyarrow", batch_size=64)


def letterbox_scores(images, band=0):
    """Uniform-border (letterbox/pillarbox) detection — the scanned-
    image / padded-thumbnail curation gate: per image the run length
    of CONSTANT rows from the top and bottom and constant columns from
    the left and right of the band-``band`` plane (a row/column counts
    as constant when every pixel equals its first value — NODATA
    included, so the synthetic NODATA strips register as letterboxing
    closed-form). Exact integers, stateless decode pass, no shuffle.

    Returns (image_id, n_top, n_bottom, n_left, n_right, boxed) where
    boxed = 1 iff any side's run ≥ 2."""
    import pyarrow as pa_

    from ..codecs import decode_image

    def runs(flags):
        n = len(flags)
        top = 0
        while top < n and flags[top]:
            top += 1
        bot = 0
        while bot < n - top and flags[n - 1 - bot]:
            bot += 1
        return top, bot

    def fn(batch: pa_.Table) -> pa_.Table:
        out = {"image_id": [], "n_top": [], "n_bottom": [],
               "n_left": [], "n_right": [], "boxed": []}
        for i in range(batch.num_rows):
            arr = decode_image(batch["bytes"][i].as_py(),
                               batch["fmt"][i].as_py(),
                               batch["w"][i].as_py(),
                               batch["h"][i].as_py())
            z = arr[band]
            row_const = (z == z[:, :1]).all(axis=1)
            col_const = (z == z[:1, :]).all(axis=0)
            t, b = runs(row_const)
            lf, r = runs(col_const)
            out["image_id"].append(batch["image_id"][i].as_py())
            out["n_top"].append(t)
            out["n_bottom"].append(b)
            out["n_left"].append(lf)
            out["n_right"].append(r)
            out["boxed"].append(int(max(t, b, lf, r) >= 2))
        return pa_.table({
            "image_id": pa_.array(out["image_id"], pa_.string()),
            "n_top": pa_.array(out["n_top"], pa_.int64()),
            "n_bottom": pa_.array(out["n_bottom"], pa_.int64()),
            "n_left": pa_.array(out["n_left"], pa_.int64()),
            "n_right": pa_.array(out["n_right"], pa_.int64()),
            "boxed": pa_.array(out["boxed"], pa_.int64())})

    return images.map_batches(fn, batch_format="pyarrow")
