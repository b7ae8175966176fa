"""Audio/video multimodal plumbing: real actor-pool stages over opaque
binary media columns with a pluggable decode (deterministic synthetic
fake here; NotImplementedError stub when decoder=None)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from unmixing_ray.stages import media

pytestmark = pytest.mark.usefixtures("ray_session")


def _audio_rows(n):
    return [{"media_id": "aud%03d" % i,
             "bytes": ("payload-%d" % i).encode() * 50,
             "kind": "audio", "sr": 16000,
             "n_samples": 16000 + 512 * i,
             "caption": "audio caption %d" % i} for i in range(n)]


def _video_rows(n):
    return [{"media_id": "vid%03d" % i,
             "bytes": ("frames-%d" % i).encode() * 20,
             "kind": "video", "fps": np.float32(24.0),
             "n_frames": 25 + i, "h": 48, "w": 64,
             "caption": "video caption %d" % i} for i in range(n)]


def test_audio_features_deterministic_and_batching_invariant():
    rows = _audio_rows(12)
    a = media.audio_features(ray.data.from_items(rows),
                             batch_size=3).to_pandas()
    b = media.audio_features(ray.data.from_items(rows),
                             batch_size=12, concurrency=1).to_pandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert len(a) == 12
    assert (a["n_windows"] > 0).all()
    assert a["caption"].tolist() == b["caption"].tolist()
    for x, y in zip(a["rms_u6"], b["rms_u6"]):
        assert list(x) == list(y)
    # window count matches the documented framing
    r0 = a.iloc[0]
    n = rows[0]["n_samples"]
    assert r0["n_windows"] == 1 + (n - 1024) // 512


def test_video_frame_sampling_layout():
    rows = _video_rows(5)
    out = media.sample_video_frames(
        ray.data.from_items(rows), every=10, out_h=16,
        out_w=16).to_pandas()
    assert set(out["media_id"]) == {r["media_id"] for r in rows}
    first = out[out["media_id"] == "vid000"].sort_values("frame_idx")
    assert first["frame_idx"].tolist() == [0, 10, 20]
    px = np.frombuffer(first.iloc[0]["pixels"], dtype=np.uint8)
    assert px.shape == (16 * 16,)
    assert first.iloc[0]["caption"] == "video caption 0"
    # deterministic: same payload -> same sampled frame bytes
    again = media.sample_video_frames(
        ray.data.from_items(rows), every=10, out_h=16,
        out_w=16).to_pandas()
    a0 = again[(again["media_id"] == "vid000")
               & (again["frame_idx"] == 0)].iloc[0]["pixels"]
    assert a0 == first.iloc[0]["pixels"]


def test_decoder_stub_raises():
    actor = media.AudioFeatureActor(decoder=None)
    import pyarrow as pa
    batch = pa.table({
        "media_id": ["a"], "bytes": [b"x"], "sr": [16000],
        "n_samples": [2048], "caption": ["c"]})
    with pytest.raises(NotImplementedError, match="audio decoder"):
        actor(batch)
    vactor = media.VideoFrameSampleActor(decoder=None)
    vbatch = pa.table({
        "media_id": ["v"], "bytes": [b"x"], "n_frames": [5],
        "h": [8], "w": [8], "caption": ["c"]})
    with pytest.raises(NotImplementedError, match="video decoder"):
        vactor(vbatch)


def test_wav_pcm16_roundtrip():
    """Real stdlib WAV codec: encode→decode round trip within the
    int16 quantization step (the audio analogue of the image PSNR
    invariant)."""
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal(4000) * 0.4, -1.0, 1.0)
    buf = media.encode_wav_pcm16(x, 22050)
    y, sr = media.decode_wav_pcm16(buf)
    assert sr == 22050 and len(y) == 4000
    assert np.abs(y - x).max() <= 1.0 / 32767 + 1e-12
    with pytest.raises(ValueError):
        media.decode_wav_pcm16(b"not a riff payload....")


def test_audio_features_wav_matches_generation_sidecar():
    """Round-3 oracle pin: audio features over REAL WAV payloads equal
    the generation-time inline-replicated expected table."""
    import duckdb
    from unmixing_ray.sources import synth
    corpus = synth.generate_media("/tmp/media_test_corpus", n_images=60,
                                  seed=7)
    ds = ray.data.read_parquet(corpus + "/media_audio.parquet")
    out = media.audio_features(ds, decoder="wav").to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT media_id, n_windows, rms_head_u6, zcr_head_u6, "
        "rms_sum_u6 FROM "
        f"read_parquet('{corpus}/media_audio_expected.parquet') "
        "ORDER BY media_id").df()
    assert out["media_id"].tolist() == exp["media_id"].tolist()
    assert out["n_windows"].astype("int64").tolist() == \
        exp["n_windows"].astype("int64").tolist()
    got_head = [int(v[0]) for v in out["rms_u6"]]
    assert got_head == exp["rms_head_u6"].astype("int64").tolist()
    got_z = [int(v[0]) for v in out["zcr_u6"]]
    assert got_z == exp["zcr_head_u6"].astype("int64").tolist()
    got_sum = [int(np.sum(np.asarray(v, dtype=np.int64)))
               for v in out["rms_u6"]]
    assert got_sum == exp["rms_sum_u6"].astype("int64").tolist()


def test_wav_stereo_pcm16_roundtrip():
    from unmixing_ray.stages.media import decode_wav, encode_wav
    rng = np.random.default_rng(9)
    x = rng.uniform(-0.9, 0.9, size=(500, 2))
    y, sr = decode_wav(encode_wav(x, sr=22050, bits=16))
    assert sr == 22050 and y.shape == (500, 2)
    assert np.abs(y - x).max() < 1.0 / 32767


def test_wav_mono_pcm8_roundtrip():
    from unmixing_ray.stages.media import decode_wav, encode_wav
    rng = np.random.default_rng(10)
    x = rng.uniform(-0.9, 0.9, size=300)
    y, sr = decode_wav(encode_wav(x, sr=8000, bits=8))
    assert sr == 8000 and y.shape == (300, 1)
    assert np.abs(y[:, 0] - x).max() < 1.0 / 127


def test_wav_pcm16_strict_rejects_stereo_and_8bit():
    import pytest as _pytest
    from unmixing_ray.stages.media import decode_wav_pcm16, encode_wav
    stereo = encode_wav(np.zeros((10, 2)), bits=16)
    eight = encode_wav(np.zeros(10), bits=8)
    with _pytest.raises(ValueError):
        decode_wav_pcm16(stereo)
    with _pytest.raises(ValueError):
        decode_wav_pcm16(eight)


def test_goertzel_detects_planted_tone(ray_session):
    """A pure tone at the probed frequency must put (nearly) all its
    window energy in the Goertzel bin, and an off-frequency tone must
    put (nearly) none — the detector really detects."""
    import ray.data
    from unmixing_ray.stages import media as m
    sr, n = 16000, 8192
    t = np.arange(n) / sr
    on = 0.5 * np.sin(2 * np.pi * 1000.0 * t)     # k=64 exactly
    off = 0.5 * np.sin(2 * np.pi * 3000.0 * t)    # k=192
    rows = pd.DataFrame({
        "media_id": ["on", "off"],
        "bytes": [m.encode_wav_pcm16(on, sr), m.encode_wav_pcm16(off, sr)],
        "sr": np.array([sr, sr], dtype=np.int32),
        "n_samples": np.array([n, n], dtype=np.int32),
        "caption": ["on", "off"]})
    out = m.audio_goertzel(ray.data.from_pandas(rows), freq_hz=1000.0,
                           decoder="wav", concurrency=1).to_pandas()
    got = dict(zip(out["media_id"], out["g_sum_u6"]))
    # full-window tone energy: |sum|^2 ≈ (A*window/2)^2 = (0.5*512)^2
    assert got["on"] > 1000 * got["off"] + 1
    assert (out["k_bin"] == 64).all()


def test_goertzel_matches_sidecar_inline(ray_session):
    """The engine actor and the generation-time inline replication must
    agree bit-for-bit on PCM-quantized random audio."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media as m
    rng = np.random.default_rng(5)
    x = np.clip(rng.standard_normal(9000) * 0.3, -1, 1)
    pcm = np.rint(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
    x_dec = pcm.astype(np.float64) / 32767.0
    gh, gs = synth._goertzel_expected_inline(x_dec, 16000)
    actor = m.GoertzelActor(freq_hz=synth.GOERTZEL_HZ, decoder="wav")
    tbl = pa.table({
        "media_id": ["a"], "bytes": [m.encode_wav_pcm16(x, 16000)],
        "sr": pa.array([16000], pa.int32()),
        "n_samples": pa.array([9000], pa.int32()),
        "caption": ["a"]})
    out = actor(tbl).to_pandas()
    assert int(out["g_head_u6"][0]) == gh
    assert int(out["g_sum_u6"][0]) == gs


def test_wav_any_roundtrip_all_variants(ray_session):
    """The generic RIFF path must round-trip stereo-16, stereo-8 and
    mono-8 within their quantization error, and the downmix decoder
    must equal the channel mean of the decoded array."""
    rng = np.random.default_rng(9)
    for ch, bits, tol in ((2, 16, 1.1 / 32767), (2, 8, 1.1 / 127),
                          (1, 8, 1.1 / 127)):
        x = np.clip(rng.standard_normal((4096, ch)) * 0.4, -1, 1)
        buf = media.encode_wav(x, 16000, bits=bits)
        dec, sr = media.decode_wav(buf)
        assert sr == 16000 and dec.shape == (4096, ch)
        assert np.abs(dec - x).max() <= tol, (ch, bits)
        mono = media._resolve_audio_decoder("wav_any")(buf, 0, 0)
        assert np.array_equal(mono, dec.mean(axis=1))


def test_scene_cut_detector_nonvacuous_and_invariant(ray_session):
    """Cut indices must be identical at any batch size, every clip with
    >= 2 scenes must report at least one cut, and n_cuts must vary
    across clips (payload-derived scene lengths)."""
    from unmixing_ray.sources import synth
    corpus = synth.generate_media("/tmp/media_test_corpus2",
                                  n_images=60, seed=7)
    ds = ray.data.read_parquet(corpus + "/media_video_scenes.parquet")
    a = media.video_scene_cuts(ds, batch_size=2).to_pandas()\
        .sort_values("media_id").reset_index(drop=True)
    b = media.video_scene_cuts(ds, batch_size=32, concurrency=1)\
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_cuts"] >= 1).all()      # 24+ frames, scene_len <= 12
    assert a["n_cuts"].nunique() > 1


def test_resample_summary_identity_and_half():
    """num=den is the identity; 1/2-rate picks every other sample."""
    import numpy as np
    from unmixing_ray.stages.media import RES_W_CYCLE, resample_summary
    x = np.array([100, -200, 300, 400, -500], dtype=np.int16)
    n, s, w = resample_summary(x, 1, 1)
    assert n == 5 and s == int(x.astype(np.int64).sum())
    n2, s2, w2 = resample_summary(x, 1, 2)
    want = x[::2].astype(np.int64)
    assert n2 == 3 and s2 == int(want.sum())
    assert w2 == int((want * (np.arange(3) % RES_W_CYCLE + 1)).sum())


def test_resample_summary_midpoints():
    """2x upsample inserts exact midpoints (denominator = num = 2)."""
    import numpy as np
    from unmixing_ray.stages.media import resample_summary
    x = np.array([10, 30, 50], dtype=np.int16)
    n, s, _ = resample_summary(x, 2, 1)
    # outputs at src pos 0, .5, 1, 1.5, 2 -> numerators x2:
    # 20, 10+30, 60, 30+50, 100
    assert n == 5
    assert s == 20 + 40 + 60 + 80 + 100
