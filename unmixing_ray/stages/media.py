"""Multimodal media columns: audio / video as opaque binary + metadata.

The engine's image path has REAL self-contained codecs (codecs.py); for
audio and video no decoder libraries exist in this environment, so this
module makes the Ray-side plumbing first-class — schema, actor-pool
stage shape, batch sizing, deterministic output layout — with the decode
step pluggable:

- ``decoder=None`` raises ``NotImplementedError`` at the decode site
  (the documented stub: plug ffmpeg/soundfile/PyAV in a real cluster
  image);
- ``decoder="synthetic"`` uses a deterministic seeded fake (a pure
  function of the payload bytes) so every downstream stage — framing,
  resampling, feature extraction, fingerprinting — is real, vectorized
  and testable end to end.

Media table schema (the audio/video analogue of the images input_hint):

    media_id: string, bytes: binary, kind: string ('audio'|'video'),
    sr: int32 (audio sample rate) | fps: float32 (video),
    n_samples/n_frames: int32, h/w: int32 (video), caption: string

Stages are callable CLASSES for ``map_batches(Cls, concurrency=N)`` —
decoder state initializes once per actor, not once per batch. Payloads
are large, so callers should pass small ``batch_size`` (8–32); outputs
are fixed-width feature rows, orders of magnitude smaller than inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

AUDIO_FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_windows", pa.int32()),
    ("rms_u6", pa.list_(pa.int64())),      # per-window RMS, 1e-6 units
    ("zcr_u6", pa.list_(pa.int64())),      # per-window zero-cross rate
    ("caption", pa.string()),
])

VIDEO_FRAME_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("h", pa.int32()),
    ("w", pa.int32()),
    ("pixels", pa.binary()),               # uint8 grayscale, row-major
    ("caption", pa.string()),
])


def _synthetic_samples(buf, n, seed_tag):
    """Deterministic fake decode: samples are a pure function of the
    payload bytes (blake2-seeded), so pipelines are testable without a
    real codec and identical at any parallelism."""
    h = hashlib.blake2b(buf, digest_size=8, person=seed_tag).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(n).astype(np.float32)


# ---------------------------------------------------------------------------
# real WAV/PCM codec (stdlib-only RIFF parse — the audio analogue of the
# image path's self-contained codecs.py; VERDICT r02 item 6)

def encode_wav(samples, sr=16000, bits=16):
    """float samples in [-1, 1] → PCM RIFF/WAVE bytes. ``samples`` is
    (n,) mono or (n, channels) interleaved on write; ``bits`` ∈ {8, 16}
    (8 = unsigned offset-128, 16 = signed little-endian)."""
    import struct
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if bits == 16:
        data = np.rint(x * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        data = (np.rint(x * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * (bits // 8)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16,
        1,                      # PCM
        channels,
        int(sr),
        int(sr) * block,        # byte rate
        block,
        bits,
        b"data", len(data))
    return hdr + data


def encode_wav_pcm16(samples, sr=16000):
    """float samples in [-1, 1] → mono 16-bit PCM RIFF/WAVE bytes."""
    return encode_wav(samples, sr=sr, bits=16)


def _wav_chunks(buf):
    """RIFF chunk walk → ((audio_fmt, channels, sr, br, ba, bits),
    data_bytes). fmt may not directly precede data; chunks are
    word-aligned."""
    import struct
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt, data


def decode_wav(buf):
    """PCM RIFF/WAVE bytes → (float64 samples (n, channels) in [-1, 1],
    sample_rate). Handles 8-bit unsigned and 16-bit signed PCM, any
    channel count; raises on compressed/float formats."""
    fmt, data = _wav_chunks(buf)
    audio_fmt, channels, sr, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(
            "only 8/16-bit integer PCM supported (fmt=%d ch=%d bits=%d)"
            % (audio_fmt, channels, bits))
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 127.0
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), int(sr)


def decode_wav_pcm16(buf):
    """Mono 16-bit PCM RIFF/WAVE bytes → (float64 samples (n,) in
    [-1, 1], sample_rate); raises on non-PCM16-mono payloads (strict
    contract kept for the oracle-checked audio query)."""
    fmt, _data = _wav_chunks(buf)
    audio_fmt, channels, _sr, _br, _ba, bits = fmt
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            "only mono 16-bit PCM supported (fmt=%d ch=%d bits=%d)"
            % (audio_fmt, channels, bits))
    x, sr = decode_wav(buf)
    return x[:, 0], sr


def _resolve_audio_decoder(decoder):
    """Decoder resolution shared by the audio actor stages: 'synthetic'
    (deterministic fake), 'wav' (real stdlib RIFF/PCM16), None (loud
    documented stub), or a callable(buf, n, sr) -> float samples."""
    if decoder == "synthetic":
        return lambda buf, n, sr: _synthetic_samples(buf, n, b"audio")
    if decoder == "wav":
        # real stdlib RIFF/PCM16 decode (metadata columns ignored —
        # the payload is self-describing)
        return lambda buf, n, sr: decode_wav_pcm16(buf)[0]
    if decoder == "wav_any":
        # any integer-PCM RIFF payload (8/16-bit, any channel count),
        # downmixed to mono by the channel mean — the multi-channel
        # ingest path (float64 mean, replicated by the sidecar oracle)
        return lambda buf, n, sr: decode_wav(buf)[0].mean(axis=1)
    if decoder is None:
        def _missing(buf, n, sr):
            raise NotImplementedError(
                "no audio decoder in this environment; install "
                "soundfile/ffmpeg and pass decoder=<callable>")
        return _missing
    return decoder


class AudioFeatureActor:
    """Actor-pool stage: audio bytes → per-window RMS + zero-crossing
    features (the classic cheap audio-quality signals). Window/hop are
    fixed at construction; the decoder is resolved ONCE per actor."""

    def __init__(self, window=1024, hop=512, decoder="synthetic"):
        self.window = int(window)
        self.hop = int(hop)
        self.decode = _resolve_audio_decoder(decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "n_windows": [], "rms_u6": [],
               "zcr_u6": [], "caption": []}
        bufs = batch["bytes"].to_pylist()
        ns = batch["n_samples"].to_numpy()
        srs = batch["sr"].to_numpy()
        ids = batch["media_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        for i in range(batch.num_rows):
            # float64 throughout: the generation-time oracle replicates
            # this exact arithmetic, and float32 accumulation can flip
            # floor(rms * 1e6) at the unit boundary
            x = np.asarray(self.decode(bufs[i], int(ns[i]), int(srs[i])),
                           dtype=np.float64)
            n_win = max(0, 1 + (len(x) - self.window) // self.hop)
            if n_win:
                idx = (np.arange(n_win)[:, None] * self.hop
                       + np.arange(self.window)[None, :])
                frames = x[idx]                      # (n_win, window)
                rms = np.sqrt((frames ** 2).mean(axis=1))
                zcr = (np.diff(np.signbit(frames), axis=1) != 0)\
                    .mean(axis=1)
            else:
                rms = np.empty(0)
                zcr = np.empty(0)
            out["media_id"].append(ids[i])
            out["n_windows"].append(n_win)
            out["rms_u6"].append(
                np.floor(rms * 1e6).astype(np.int64).tolist())
            out["zcr_u6"].append(
                np.floor(zcr * 1e6).astype(np.int64).tolist())
            out["caption"].append(caps[i])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_windows": pa.array(out["n_windows"], pa.int32()),
            "rms_u6": pa.array(out["rms_u6"], pa.list_(pa.int64())),
            "zcr_u6": pa.array(out["zcr_u6"], pa.list_(pa.int64())),
            "caption": pa.array(out["caption"], pa.string()),
        }, schema=AUDIO_FEATURE_SCHEMA)


class VideoFrameSampleActor:
    """Actor-pool stage: video bytes → every k-th frame as a resized
    grayscale raster row (the standard frame-sampling front of a
    video-understanding pipeline). Frame synthesis is the pluggable
    decode; sampling, nearest-neighbor resize and output layout are
    real."""

    def __init__(self, every=10, out_h=32, out_w=32, decoder="synthetic"):
        self.every = int(every)
        self.out_h = int(out_h)
        self.out_w = int(out_w)
        if decoder == "synthetic":
            def _synth(buf, idx, h, w):
                s = _synthetic_samples(buf + idx.to_bytes(4, "little"),
                                       h * w, b"video")
                return np.clip((s * 40 + 128), 0, 255)\
                    .astype(np.uint8).reshape(h, w)
            self.decode_frame = _synth
        elif decoder is None:
            def _missing(buf, idx, h, w):
                raise NotImplementedError(
                    "no video decoder in this environment; install "
                    "PyAV/ffmpeg and pass decoder=<callable>")
            self.decode_frame = _missing
        else:
            self.decode_frame = decoder

    def _resize(self, frame):
        h, w = frame.shape
        ys = (np.arange(self.out_h) * h // self.out_h)
        xs = (np.arange(self.out_w) * w // self.out_w)
        return frame[ys[:, None], xs[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "pixels": [],
               "caption": []}
        bufs = batch["bytes"].to_pylist()
        nf = batch["n_frames"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        ids = batch["media_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        for i in range(batch.num_rows):
            for f in range(0, int(nf[i]), self.every):
                frame = self.decode_frame(bufs[i], f, int(hs[i]),
                                          int(ws[i]))
                out["media_id"].append(ids[i])
                out["frame_idx"].append(f)
                out["pixels"].append(self._resize(frame).tobytes())
                out["caption"].append(caps[i])
        n = len(out["media_id"])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "h": pa.array([self.out_h] * n, pa.int32()),
            "w": pa.array([self.out_w] * n, pa.int32()),
            "pixels": pa.array(out["pixels"], pa.binary()),
            "caption": pa.array(out["caption"], pa.string()),
        }, schema=VIDEO_FRAME_SCHEMA)


def _media_pool_size(concurrency):
    """Cap the media actor pool below the CPU count: an all-CPU pool
    starves the upstream read and deadlocks the streaming executor
    (observed with concurrency=4 on a 4-CPU session)."""
    if concurrency is not None:
        return concurrency
    from .unmix import default_pool_size
    return default_pool_size(reserve=2, cap=4)


def audio_features(media_ds, window=1024, hop=512, decoder="synthetic",
                   concurrency=None, batch_size=16):
    """Audio rows → per-window feature rows (actor pool)."""
    concurrency = _media_pool_size(concurrency)
    return media_ds.map_batches(
        AudioFeatureActor,
        fn_constructor_kwargs={"window": window, "hop": hop,
                               "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


GOERTZEL_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_windows", pa.int32()),
    ("k_bin", pa.int32()),
    ("g_head_u6", pa.int64()),
    ("g_sum_u6", pa.int64()),
    ("caption", pa.string()),
])


class GoertzelActor:
    """Actor-pool stage: audio bytes → single-bin DFT band energy per
    window at a target frequency (the Goertzel detector — tone /
    voice-band presence, the classic O(n)-per-bin alternative to a
    full FFT; Goertzel 1958). The bin index k = round(f·window/sr) and
    the cos/sin basis vectors are built ONCE PER SAMPLE RATE in actor
    state; per window the energy is |Σ x·cos|² + |Σ x·sin|².

    Determinism contract: the basis product is reduced with numpy's
    own pairwise ``(frames * basis).sum(axis=1)`` — never a BLAS
    matmul, whose thread-dependent summation order could flip
    ``floor(energy·1e6)`` against the generation-time sidecar that
    replicates this exact expression."""

    def __init__(self, freq_hz=1000.0, window=1024, hop=512,
                 decoder="synthetic"):
        self.freq_hz = float(freq_hz)
        self.window = int(window)
        self.hop = int(hop)
        self.decode = _resolve_audio_decoder(decoder)
        self._basis = {}      # sr -> (k, cos_vec, sin_vec)

    def basis(self, sr):
        got = self._basis.get(sr)
        if got is None:
            k = int(round(self.freq_hz * self.window / sr))
            w = 2.0 * np.pi * k / self.window
            t = np.arange(self.window, dtype=np.float64)
            got = (k, np.cos(w * t), np.sin(w * t))
            self._basis[sr] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "n_windows": [], "k_bin": [],
               "g_head_u6": [], "g_sum_u6": [], "caption": []}
        bufs = batch["bytes"].to_pylist()
        ns = batch["n_samples"].to_numpy()
        srs = batch["sr"].to_numpy()
        ids = batch["media_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        for i in range(batch.num_rows):
            x = np.asarray(self.decode(bufs[i], int(ns[i]), int(srs[i])),
                           dtype=np.float64)
            k, cosv, sinv = self.basis(int(srs[i]))
            n_win = max(0, 1 + (len(x) - self.window) // self.hop)
            if n_win:
                idx = (np.arange(n_win)[:, None] * self.hop
                       + np.arange(self.window)[None, :])
                frames = x[idx]
                c = (frames * cosv).sum(axis=1)
                s = (frames * sinv).sum(axis=1)
                g_u6 = np.floor((c * c + s * s) * 1e6).astype(np.int64)
                head, total = int(g_u6[0]), int(g_u6.sum())
            else:
                head, total = -1, 0
            out["media_id"].append(ids[i])
            out["n_windows"].append(n_win)
            out["k_bin"].append(k)
            out["g_head_u6"].append(head)
            out["g_sum_u6"].append(total)
            out["caption"].append(caps[i])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_windows": pa.array(out["n_windows"], pa.int32()),
            "k_bin": pa.array(out["k_bin"], pa.int32()),
            "g_head_u6": pa.array(out["g_head_u6"], pa.int64()),
            "g_sum_u6": pa.array(out["g_sum_u6"], pa.int64()),
            "caption": pa.array(out["caption"], pa.string()),
        }, schema=GOERTZEL_SCHEMA)


def synthetic_scene_frame(buf, idx, h, w):
    """Deterministic scene-structured synthetic video decode: the clip
    is a sequence of scenes of payload-derived length; frames within a
    scene share a base image plus small per-frame jitter, so consecutive
    same-scene frames differ little and scene boundaries differ a lot.
    Pure function of (payload, frame index) — the documented spec the
    generation-time sidecar replicates."""
    scene_len = 6 + hashlib.blake2b(
        buf, digest_size=1, person=b"slen").digest()[0] % 7
    sid = idx // scene_len
    hb = hashlib.blake2b(buf + sid.to_bytes(4, "little"), digest_size=8,
                         person=b"scene").digest()
    base = np.random.default_rng(int.from_bytes(hb, "little"))\
        .standard_normal(h * w).astype(np.float32) * 40 + 128
    hj = hashlib.blake2b(buf + idx.to_bytes(4, "little"), digest_size=8,
                         person=b"jit").digest()
    jit = np.random.default_rng(int.from_bytes(hj, "little"))\
        .standard_normal(h * w).astype(np.float32) * 2
    return np.clip(base + jit, 0, 255).astype(np.uint8).reshape(h, w)


SCENE_CUT_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_frames", pa.int32()),
    ("n_cuts", pa.int32()),
    ("cut_head", pa.int64()),
    ("cut_sum", pa.int64()),
    ("caption", pa.string()),
])


class SceneCutActor:
    """Actor-pool stage: video bytes → scene-cut frame indices by
    thresholding the SUM of absolute pixel differences between
    consecutive downsampled frames (integer-exact: uint8 frames, int64
    sums — no float in the decision, so the sidecar replay cannot
    drift). The downsample lattice is precomputed per (h, w) in actor
    state; the threshold is in mean-per-pixel units and scaled by the
    downsample size once."""

    def __init__(self, threshold=10, ds_h=16, ds_w=16,
                 decoder="synthetic"):
        self.threshold = int(threshold)
        self.ds_h, self.ds_w = int(ds_h), int(ds_w)
        if decoder == "synthetic":
            self.decode = synthetic_scene_frame
        elif decoder is None:
            def _missing(buf, idx, h, w):
                raise NotImplementedError(
                    "no video decoder in this environment; install "
                    "ffmpeg/av and pass decoder=<callable>")
            self.decode = _missing
        else:
            self.decode = decoder
        self._lattice = {}

    def lattice(self, h, w):
        got = self._lattice.get((h, w))
        if got is None:
            ys = np.arange(self.ds_h) * h // self.ds_h
            xs = np.arange(self.ds_w) * w // self.ds_w
            got = (ys[:, None], xs[None, :])
            self._lattice[(h, w)] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("media_id", "n_frames", "n_cuts",
                               "cut_head", "cut_sum", "caption")}
        bufs = batch["bytes"].to_pylist()
        nfs = batch["n_frames"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        ids = batch["media_id"].to_pylist()
        caps = batch["caption"].to_pylist()
        lim = self.threshold * self.ds_h * self.ds_w
        for i in range(batch.num_rows):
            h, w, nf = int(hs[i]), int(ws[i]), int(nfs[i])
            ys, xs = self.lattice(h, w)
            prev = None
            cuts = []
            for f in range(nf):
                small = self.decode(bufs[i], f, h, w)[ys, xs]\
                    .astype(np.int64)
                if prev is not None and \
                        int(np.abs(small - prev).sum()) > lim:
                    cuts.append(f)
                prev = small
            out["media_id"].append(ids[i])
            out["n_frames"].append(nf)
            out["n_cuts"].append(len(cuts))
            out["cut_head"].append(cuts[0] if cuts else -1)
            out["cut_sum"].append(int(sum(cuts)))
            out["caption"].append(caps[i])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "n_frames": pa.array(out["n_frames"], pa.int32()),
            "n_cuts": pa.array(out["n_cuts"], pa.int32()),
            "cut_head": pa.array(out["cut_head"], pa.int64()),
            "cut_sum": pa.array(out["cut_sum"], pa.int64()),
            "caption": pa.array(out["caption"], pa.string()),
        }, schema=SCENE_CUT_SCHEMA)


def video_scene_cuts(media_ds, threshold=10, ds_h=16, ds_w=16,
                     decoder="synthetic", concurrency=None,
                     batch_size=8):
    """Video rows → per-clip scene-cut summary (actor pool)."""
    concurrency = _media_pool_size(concurrency)
    return media_ds.map_batches(
        SceneCutActor,
        fn_constructor_kwargs={"threshold": threshold, "ds_h": ds_h,
                               "ds_w": ds_w, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def audio_goertzel(media_ds, freq_hz=1000.0, window=1024, hop=512,
                   decoder="synthetic", concurrency=None,
                   batch_size=16):
    """Audio rows → per-clip Goertzel band-energy summary (actor pool)."""
    concurrency = _media_pool_size(concurrency)
    return media_ds.map_batches(
        GoertzelActor,
        fn_constructor_kwargs={"freq_hz": freq_hz, "window": window,
                               "hop": hop, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_video_frames(media_ds, every=10, out_h=32, out_w=32,
                        decoder="synthetic", concurrency=None,
                        batch_size=8):
    """Video rows → sampled, resized frame rows (actor pool)."""
    concurrency = _media_pool_size(concurrency)
    return media_ds.map_batches(
        VideoFrameSampleActor,
        fn_constructor_kwargs={"every": every, "out_h": out_h,
                               "out_w": out_w, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ---------------------------------------------------------------------------
# audio resampling (rational-rate linear interpolation, exact fixed point)

RES_W_CYCLE = 251


def resample_summary(x, num, den):
    """EXACT fixed-point linear resample of int16 samples ``x`` to
    ``num/den`` of the source rate: output j sits at source position
    j·den/num, value numerator y_num[j] = x[i]·(num − f) + x[i+1]·f
    with i = j·den // num and f = j·den − i·num (denominator = num,
    so every value is exact int64). Returns (n_out, y_sum,
    y_wsum) with the position-weighted checksum pinning every output
    sample (the stages/augment.py weight discipline)."""
    n = len(x)
    if n == 0:
        return 0, 0, 0
    x = x.astype(np.int64)
    m = (n - 1) * num // den + 1
    j = np.arange(m, dtype=np.int64)
    pos = j * den
    i0 = pos // num
    f = pos - i0 * num
    x1 = x[np.minimum(i0 + 1, n - 1)]
    y = x[i0] * (num - f) + x1 * f
    w = j % RES_W_CYCLE + 1
    return int(m), int(y.sum()), int((y * w).sum())


def decode_wav_raw_int16(buf):
    """Mono 16-bit PCM RIFF/WAVE bytes → RAW int16 samples (n,) —
    the unscaled twin of :func:`decode_wav_pcm16` for integer-exact
    DSP (resampling) where the [-1, 1] float scaling would break
    fixed-point arithmetic."""
    fmt, data = _wav_chunks(buf)
    audio_fmt, channels, _sr, _br, _ba, bits = fmt
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            "only mono 16-bit PCM supported (fmt=%d ch=%d bits=%d)"
            % (audio_fmt, channels, bits))
    return np.frombuffer(data, dtype="<i2")


class AudioResampler:
    """Actor-pool stage: WAV bytes → exact resample summaries at
    ``num/den`` of the source rate (one stateless pass, no shuffle;
    raw-int16 decode so the fixed-point arithmetic stays exact)."""

    def __init__(self, num=2, den=3, decoder="wav"):
        self.num = int(num)
        self.den = int(den)
        if decoder != "wav":
            raise ValueError("AudioResampler is integer-exact and "
                             "supports the raw PCM16 path only")
        self.decode = decode_wav_raw_int16

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_in, n_out, ys, yw = [], [], [], [], []
        for i in range(batch.num_rows):
            x = self.decode(batch["bytes"][i].as_py())
            m, s, w = resample_summary(np.asarray(x), self.num,
                                       self.den)
            ids.append(batch["media_id"][i].as_py())
            n_in.append(len(x))
            n_out.append(m)
            ys.append(s)
            yw.append(w)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_in": pa.array(n_in, pa.int64()),
            "n_out": pa.array(n_out, pa.int64()),
            "y_sum": pa.array(ys, pa.int64()),
            "y_wsum": pa.array(yw, pa.int64())})


def audio_resample(ds, num=2, den=3, decoder="wav", concurrency=None):
    """Distributed rational-rate audio resample (see AudioResampler)."""
    import ray.data   # noqa: F401  (documents the Dataset dependency)
    return ds.map_batches(AudioResampler,
                          fn_constructor_kwargs={
                              "num": num, "den": den,
                              "decoder": decoder},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=_media_pool_size(concurrency))


def synthetic_motion_frame(buf, idx, h, w):
    """Deterministic constant-velocity synthetic video decode: one base
    image per clip, frame ``idx`` is the base circularly shifted by
    idx·(vy, vx) with the per-clip velocity planted from the payload
    (vx, vy ∈ [-2, 2]). Pure function of (payload, index) — block
    matching between consecutive frames must recover exactly (vy, vx);
    the generation-time sidecar derives the expectation closed-form
    from the same spec (the coregister pattern, made temporal)."""
    vx = hashlib.blake2b(buf, digest_size=1,
                         person=b"mvx").digest()[0] % 5 - 2
    vy = hashlib.blake2b(buf, digest_size=1,
                         person=b"mvy").digest()[0] % 5 - 2
    hb = hashlib.blake2b(buf, digest_size=8, person=b"mbase").digest()
    base = np.random.default_rng(int.from_bytes(hb, "little"))\
        .integers(0, 256, h * w, dtype=np.int64)\
        .astype(np.uint8).reshape(h, w)
    return np.roll(base, ((idx * vy) % h, (idx * vx) % w),
                   axis=(0, 1))


def motion_vector_code(dy, dx, radius):
    """Pack a motion vector into the non-negative code the positional
    checksum uses (shared with the sidecar replay)."""
    return (dy + radius) * (2 * radius + 1) + (dx + radius)


MOTION_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_pairs", pa.int64()),
    ("mode_dy", pa.int64()),
    ("mode_dx", pa.int64()),
    ("n_agree", pa.int64()),
    ("pair_wsum", pa.int64()),
])


class MotionActor:
    """Actor-pool stage: video bytes → per-clip block-motion estimate.
    For every consecutive frame pair the translation in a ±radius
    window minimizing the integer SAD (sum of absolute differences,
    uint8 frames → int64 sums — no float in the decision), with the
    deterministic (SAD, dy, dx) tiebreak. Emits the dominant vector
    (mode over pairs, count-desc then code-asc), how many pairs agree
    with it, and the pair-index-weighted code checksum pinning EVERY
    pair's vector."""

    def __init__(self, radius=3, decoder="motion"):
        self.radius = int(radius)
        if decoder == "motion":
            self.decode = synthetic_motion_frame
        elif decoder is None:
            def _missing(buf, idx, h, w):
                raise NotImplementedError(
                    "no video decoder in this environment; install "
                    "ffmpeg/av and pass decoder=<callable>")
            self.decode = _missing
        else:
            self.decode = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.radius
        side = 2 * r + 1
        out = {k: [] for k in ("media_id", "n_pairs", "mode_dy",
                               "mode_dx", "n_agree", "pair_wsum")}
        bufs = batch["bytes"].to_pylist()
        nfs = batch["n_frames"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        ids = batch["media_id"].to_pylist()
        for i in range(batch.num_rows):
            h, w, nf = int(hs[i]), int(ws[i]), int(nfs[i])
            prev = None
            codes = []
            for f in range(nf):
                cur = self.decode(bufs[i], f, h, w).astype(np.int64)
                if prev is not None:
                    best = None
                    for dy in range(-r, r + 1):
                        for dx in range(-r, r + 1):
                            sad = int(np.abs(
                                np.roll(prev, (dy, dx), axis=(0, 1))
                                - cur).sum())
                            key = (sad, dy, dx)
                            if best is None or key < best:
                                best = key
                    codes.append(motion_vector_code(best[1], best[2],
                                                    r))
                prev = cur
            codes = np.asarray(codes, dtype=np.int64)
            if len(codes):
                cnt = np.bincount(codes, minlength=side * side)
                mode = int(np.argmax(cnt))   # count desc, code asc
                n_agree = int(cnt[mode])
            else:
                mode, n_agree = motion_vector_code(0, 0, r), 0
            out["media_id"].append(ids[i])
            out["n_pairs"].append(len(codes))
            out["mode_dy"].append(mode // side - r)
            out["mode_dx"].append(mode % side - r)
            out["n_agree"].append(n_agree)
            out["pair_wsum"].append(int(
                (codes * np.arange(1, len(codes) + 1)).sum()))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            **{k: pa.array(out[k], pa.int64())
               for k in ("n_pairs", "mode_dy", "mode_dx", "n_agree",
                         "pair_wsum")}}, schema=MOTION_SCHEMA)


def video_motion(media_ds, radius=3, decoder="motion",
                 concurrency=None, batch_size=8):
    """Video rows → per-clip dominant motion vector (actor pool)."""
    return media_ds.map_batches(
        MotionActor,
        fn_constructor_kwargs={"radius": radius, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_media_pool_size(concurrency))


def silence_summary(x, threshold):
    """Exact run-length segmentation of ``|x| < threshold`` over int16
    samples — the VAD / silence-trim ingredient. Returns (n_samples,
    n_silent, n_runs, max_run, run_wsum) where run_wsum =
    Σ (start_index + 1) · length over silent runs: the position-
    weighted checksum pins the exact segmentation (the augment.py /
    resample_summary weight discipline), not just the totals."""
    n = len(x)
    if n == 0:
        return 0, 0, 0, 0, 0
    silent = np.abs(x.astype(np.int64)) < threshold
    # run boundaries: starts where silent goes 0->1, ends 1->0
    d = np.diff(silent.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if silent[0]:
        starts = np.concatenate([[0], starts])
    if silent[-1]:
        ends = np.concatenate([ends, [n]])
    lens = ends - starts
    return (int(n), int(silent.sum()), int(len(starts)),
            int(lens.max()) if len(lens) else 0,
            int(((starts + 1) * lens).sum()))


class AudioSilence:
    """Actor-pool stage: WAV bytes → exact silence-run summaries
    (one stateless pass, no shuffle; raw-int16 decode so the
    threshold compare is integer-exact)."""

    def __init__(self, threshold=5000):
        self.threshold = int(threshold)
        self.decode = decode_wav_raw_int16

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("media_id", "n_samples", "n_silent",
                                "n_runs", "max_run", "run_wsum")}
        for i in range(batch.num_rows):
            x = np.asarray(self.decode(batch["bytes"][i].as_py()))
            n, ns, nr, mr, ws = silence_summary(x, self.threshold)
            cols["media_id"].append(batch["media_id"][i].as_py())
            cols["n_samples"].append(n)
            cols["n_silent"].append(ns)
            cols["n_runs"].append(nr)
            cols["max_run"].append(mr)
            cols["run_wsum"].append(ws)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.string()),
            **{k: pa.array(cols[k], pa.int64())
               for k in ("n_samples", "n_silent", "n_runs", "max_run",
                         "run_wsum")}})


def audio_silence(ds, threshold=5000, concurrency=None):
    """Distributed silence/VAD run-length segmentation (see
    AudioSilence)."""
    return ds.map_batches(AudioSilence,
                          fn_constructor_kwargs={
                              "threshold": threshold},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=_media_pool_size(concurrency))
