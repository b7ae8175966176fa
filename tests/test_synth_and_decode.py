"""Corpus generation + decode/tile stage: the M0 slice.

Covers the per-row input invariants from BASELINE.json input_hint:
decoded-pixel allclose (exact for lossless, PSNR>=40dB for lossy) and
caption equality end-to-end, plus bit-exact tile/cell assignment vs the
closed-form lattice sidecar.
"""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from unmixing_ray import cellindex, codecs
from unmixing_ray.sources import synth
from unmixing_ray.stages import decode as dstage


def test_corpus_deterministic(tmp_path):
    d1 = synth.generate_corpus(str(tmp_path / "a"), n_images=12, seed=7)
    d2 = synth.generate_corpus(str(tmp_path / "b"), n_images=12, seed=7)
    t1 = synth.images_table(d1)
    t2 = synth.images_table(d2)
    assert t1.equals(t2)


def test_corpus_schema_and_duplicates(small_corpus):
    t = synth.images_table(small_corpus)
    names = t.column_names
    for c in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
        assert c in names
    ph = t["phash"].to_pylist()
    # at least one planted exact duplicate (seq%97==1 copies seq-1)
    assert len(ph) != len(set(ph))


def test_decode_invariants(small_corpus):
    t = synth.images_table(small_corpus)
    out = dstage.decode_batch(t)
    assert out.num_rows == t.num_rows
    # caption passthrough
    assert out["caption"].to_pylist() == t["caption"].to_pylist()
    fmts = t["fmt"].to_pylist()
    for i in range(t.num_rows):
        px = np.frombuffer(out["pixels"][i].as_py(), dtype=np.int16)
        arr = px.reshape((int(out["bands"][i].as_py()), 64, 64))
        # re-encode losslessly and compare against the original payload's
        # decode: lossless formats must be exact; q8 within PSNR>=40
        orig = codecs.decode_image(
            t["bytes"][i].as_py(), fmts[i], 64, 64)
        assert np.array_equal(arr, orig)


def test_decode_and_tile_matches_lattice(small_corpus):
    t = synth.images_table(small_corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = fn(t)
    exp = pq.read_table(os.path.join(small_corpus, "tiles_expected.parquet"))
    assert tiles.num_rows == exp.num_rows
    got = {tid: (int(c), cx, cy) for tid, c, cx, cy in zip(
        tiles["tile_id"].to_pylist(), tiles["cell"].to_pylist(),
        tiles["cx"].to_pylist(), tiles["cy"].to_pylist())}
    for i in range(exp.num_rows):
        tid = exp["tile_id"][i].as_py()
        assert tid in got
        cell, cx, cy = got[tid]
        assert cx == exp["cx"][i].as_py()
        assert cy == exp["cy"][i].as_py()
        ix, iy, lv = cellindex.cell_to_ixiy(np.uint64(cell))
        assert int(ix) == exp["cell_ix"][i].as_py()
        assert int(iy) == exp["cell_iy"][i].as_py()
        assert int(lv) == exp["cell_level"][i].as_py()


def test_tiles_to_ndarray_uniform(small_corpus):
    t = synth.images_table(small_corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = fn(t)
    arrays, uniform = dstage.tiles_to_ndarray(tiles)
    assert arrays is None
    assert uniform.shape == (tiles.num_rows, 6, synth.TILE, synth.TILE)
    # spot-check one tile against a direct decode
    i = 5
    row = tiles.slice(i, 1)
    img_idx = t["image_id"].to_pylist().index(
        row["image_id"][0].as_py())
    orig = codecs.decode_image(
        t["bytes"][img_idx].as_py(), t["fmt"][img_idx].as_py(), 64, 64)
    r0 = row["row_off"][0].as_py()
    c0 = row["col_off"][0].as_py()
    assert np.array_equal(
        uniform[i], orig[:, r0:r0 + synth.TILE, c0:c0 + synth.TILE])


def test_planted_feature_counts(small_corpus):
    exp = pq.read_table(
        os.path.join(small_corpus, "images_expected.parquet"))
    man = json.loads(
        open(os.path.join(small_corpus, "manifest.json")).read())
    assert man["n_images"] == 40
    by_id = {exp["image_id"][i].as_py(): i for i in range(exp.num_rows)}
    # image 0: water (0%3==0), saturation (0%5==0), nodata (0%7==0), qa
    i = by_id["img00000000"]
    # water region planted 16x16 but 4 NoData rows don't overlap rows 40:56
    assert exp["n_water"][i].as_py() >= 16 * 16
    assert exp["n_saturated"][i].as_py() == 8
    assert exp["n_nodata"][i].as_py() == 4 * 64
    assert exp["n_qa_masked"][i].as_py() == 8 * 16


@pytest.mark.usefixtures("ray_session")
def test_ray_read_and_tile(small_corpus):
    """End-to-end M0 through Ray Data: read → decode+tile → count."""
    from unmixing_ray.sources import images as src
    ds = src.read_images(small_corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
    n = tiles.count()
    assert n == 40 * 4
    s = tiles.schema()
    assert "pixels" in s.names and "cell" in s.names


def test_augment_flip_then_crop_semantics(ray_session):
    """Engine flip/crop vs a hand-built expectation on a tiny known
    array; checksum must be position-sensitive (transpose changes it)."""
    import hashlib
    import ray.data
    from unmixing_ray.codecs import encode_image
    from unmixing_ray.stages.augment import (augment_images,
                                             augment_params,
                                             weighted_checksum)
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 10000, (2, 8, 8)).astype(np.int16)
    crop = 4
    img_id = "aug_test_img"
    fh, fv, oy, ox = augment_params(img_id, 8, 8, crop)
    # independent expectation: explicit coordinate mapping
    exp = np.empty((2, crop, crop), dtype=np.int64)
    for b in range(2):
        for y in range(crop):
            sy = 8 - 1 - (oy + y) if fv else oy + y
            for x in range(crop):
                sx = 8 - 1 - (ox + x) if fh else ox + x
                exp[b, y, x] = arr[b, sy, sx]
    ds = ray.data.from_items([{
        "image_id": img_id, "bytes": encode_image(arr, "tiff"),
        "w": 8, "h": 8, "fmt": "tiff", "caption": "a caption"}])
    out = augment_images(ds, crop=crop).to_pandas()
    assert len(out) == 1
    assert out["aug_checksum"][0] == weighted_checksum(exp)
    assert out["caption"][0] == "a caption"
    assert out["n_px"][0] == 2 * crop * crop
    # position sensitivity: transposing the crop must change the checksum
    assert weighted_checksum(exp.transpose(0, 2, 1)) != \
        weighted_checksum(exp)
    # determinism of the parameter derivation
    assert augment_params(img_id, 8, 8, crop) == (fh, fv, oy, ox)
    d = hashlib.md5(img_id.encode()).digest()
    assert fh == d[0] & 1 and fv == (d[0] >> 1) & 1
