"""Deterministic synthetic image+caption corpus (the engine's input table).

Implements the input_hint schema from BASELINE.json —
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` — plus a ``qa`` binary column (CFMask-style
QA raster per image) and sidecar tables:

- ``polygons.parquet``  : axis-aligned rectangular vector polygons with
  explicit ring coordinates AND (xmin, ymin, xmax, ymax, cx, cy) columns so
  a DuckDB oracle can verify point-in-polygon / kNN joins independently.
- ``tiles_expected.parquet`` : closed-form tile lattice (tile_id, image_id,
  row_off, col_off, gt, centroid, cell ix/iy) for tile-assignment oracles.
- ``images_expected.parquet`` : per-image planted-feature counts (water
  pixels, saturated pixels, NoData pixels, QA-masked pixels) computed with
  inline numpy at generation time (not via the engine's kernels) so mask
  operators have independent expected outputs.
- ``manifest.json`` : generation parameters incl. true endmember spectra.

Everything is a pure function of (seed, n_images); identical bytes across
runs and across parallelism levels. Pixel content is a linear mixture of
three endmember spectra with Dirichlet abundances plus Gaussian noise, with
planted NoData strips, saturated pixels, a low-band-5 "water" region and QA
cloud values — so every reference mask operator (density_slice, cfmask,
saturation_mask, binary_mask) has a computable expected output
(reference semantics: /root/reference/unmixing/utils.py:230-263,560-579,
971-997).
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..constants import NODATA
from .. import cellindex
from ..codecs import encode_image

# bump when generator semantics change: forces cached corpora to rebuild
GENERATOR_VERSION = 8

# parquet row-group size for the images table: Ray splits reads at
# row-group granularity, so 512-row groups capped decode parallelism at
# 24 tasks for the sf0.1 corpus
ROW_GROUP = 64

# Corpus geometry: images on a lattice in a UTM-like meters CRS.
IMG_W = 64
IMG_H = 64
BANDS = 6
PX = 30.0                 # pixel size, meters
TILE = 32                 # tile edge, pixels
CELL_LEVEL = 12           # 2^22 / 2^12 = 1024 m cell edge (~one 960 m tile)
ORIGIN_X = 300000.0
ORIGIN_Y = 3000000.0
CRS = "ENGINE:UTM-LIKE"   # fixed working CRS label (no CRS database in env)

# True endmember spectra (q=3 endmembers x p=6 bands): vegetation,
# bright/impervious, dark/water. Int-valued reflectance x1e4 scale.
ENDMEMBERS = np.array([
    [300, 550, 450, 4200, 2400, 1100],
    [2600, 2900, 3200, 3600, 4100, 3900],
    [700, 900, 800, 500, 300, 200],
], dtype=np.float64)

_WORDS = (
    "landsat scene over the study area showing urban vegetation water "
    "impervious surface reflectance composite tile mixed spectra bands "
    "clear cloudy riparian agricultural forest shadow bright dark"
).split()

DATA_ROOT = "/tmp/ray_unmix_data"


def n_images_for_sf(sf):
    return max(60, int(round(float(sf) * 120000)))


def sf_of_dir(sf_dir):
    """Parse the scale factor from a testdata dir name like .../sf0.01."""
    name = pathlib.Path(str(sf_dir)).name
    if name.startswith("sf"):
        return float(name[2:])
    raise ValueError("cannot parse scale factor from %r" % (sf_dir,))


def corpus_dir_for(sf_dir):
    return os.path.join(DATA_ROOT, pathlib.Path(str(sf_dir)).name)


def image_geotransform(seq, n_images):
    """Deterministic lattice layout: row-major grid of images."""
    ncols = int(np.ceil(np.sqrt(n_images)))
    gx = seq % ncols
    gy = seq // ncols
    x0 = ORIGIN_X + gx * IMG_W * PX
    y0 = ORIGIN_Y - gy * IMG_H * PX
    return (x0, PX, 0.0, y0, 0.0, -PX)


def _caption(rng, seq):
    words = [str(_WORDS[i]) for i in rng.integers(0, len(_WORDS), size=6)]
    return "caption %06d: %s" % (seq, " ".join(words))


def _phash(pixels):
    h = hashlib.blake2b(pixels.tobytes(), digest_size=8).digest()
    return int.from_bytes(h, "little", signed=True)


def _make_pixels(rng):
    """One image's pixels: S.T @ Dirichlet abundances + noise, int16."""
    alpha = rng.uniform(0.3, 2.5, size=3)
    gam = rng.gamma(shape=alpha[:, None], scale=1.0, size=(3, IMG_H * IMG_W))
    ab = gam / gam.sum(axis=0, keepdims=True)
    refl = ENDMEMBERS.T @ ab                  # (6, h*w)
    refl = refl + rng.normal(0.0, 20.0, size=refl.shape)
    refl = np.clip(refl, 0, 10000)
    return refl.reshape((BANDS, IMG_H, IMG_W)).astype(np.int16)


def _plant(pixels, qa, seq):
    """Plant deterministic features; mutates pixels/qa in place."""
    if seq % 3 == 0:   # water region: band index 4 <= 1000
        pixels[4, 40:56, 8:24] = 800
    if seq % 5 == 0:   # saturated pixels in band index 3
        pixels[3, 10:12, 10:14] = 10700
    if seq % 7 == 0:   # NoData strip across all bands
        pixels[:, 0:4, :] = NODATA
    if seq % 4 == 0:   # QA cloud block
        qa[0:8, 48:64] = (1, 2, 3, 4, 255)[seq % 5]


def _expected_counts(pixels, qa):
    """Planted-feature ground truth, inline numpy (NOT engine kernels)."""
    b4 = pixels[4]
    water = int(((b4 <= 1000) & (b4 != NODATA)).sum())
    saturated = int((pixels > 10000).any(axis=0).sum())
    nodat = int((pixels[0] == NODATA).sum())
    qa_masked = int(np.isin(qa, (1, 2, 3, 4, 255)).sum())
    return water, saturated, nodat, qa_masked


# Crist (1985) TM brightness row, inline (independent of engine kernels)
_TC1 = np.array([0.2043, 0.4158, 0.5524, 0.5741, 0.3124, 0.2303])


def _expected_spectral(pixels):
    """NDVI-positive count and floor(TC1 sum) over valid pixels, inline."""
    red = pixels[2].astype(np.float64)
    nir = pixels[3].astype(np.float64)
    valid = (red != NODATA) & (nir != NODATA)
    with np.errstate(divide="ignore", invalid="ignore"):
        ndvi = (nir - red) / (nir + red)
    n_pos = int(((ndvi > 0.3) & valid).sum())
    flat = pixels.reshape(pixels.shape[0], -1).astype(np.float64)
    v0 = flat[0] != NODATA
    tc1 = _TC1 @ flat
    tc1_sum = int(np.floor(np.sum(tc1[v0])))
    return n_pos, tc1_sum


def _expected_band_stats(pixels):
    """Per-band (min, max, sum, count) over valid pixels, inline numpy."""
    flat = pixels.reshape(pixels.shape[0], -1).astype(np.int64)
    valid = flat != NODATA
    out = []
    for b in range(flat.shape[0]):
        v = flat[b][valid[b]]
        if v.size:
            out.append((int(v.min()), int(v.max()), int(v.sum()),
                        int(v.size)))
        else:
            out.append((0, 0, 0, 0))
    return out


def _q8_roundtrip_inline(pixels):
    """Inline replication of the documented q8 codec map (per-band linear
    8-bit quantization with float32-stored lo/scale), so lossy ground truth
    never round-trips through the engine's decoder (oracle independence).

    Spec (codecs.py docstring): per band, lo = min, scale = (max-lo)/255
    (1.0 when flat); code = rint((x - lo)/scale) as uint8; lo and scale are
    stored as float32; reconstruction = rint(float32(code*scale32 + lo32))
    as int16.
    """
    p = pixels.shape[0]
    out = np.empty_like(pixels)
    for b in range(p):
        band = pixels[b].astype(np.float32)
        lo = float(band.min())
        hi = float(band.max())
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        code = np.rint((band - lo) / scale).astype(np.uint8)
        lo32 = np.float32(lo)
        scale32 = np.float32(scale)
        out[b] = np.rint(code.astype(np.float32) * scale32 + lo32)\
            .astype(np.int16)
    return out


def _fcls_oracle(X, U):
    """Independent exact FCLS for q=3 (oracle-side solver).

    Geometric formulation — deliberately NOT the engine's KKT support
    enumeration (kernels/nnls.py): solve the equality-constrained interior
    optimum via one bordered solve; for pixels where it is infeasible the
    optimum of a q=3 simplex lies on one of the three edges, each a 1-D
    least-squares segment with a closed-form clamped minimizer; pick the
    edge by comparing objective values. X: (n, p) float64; U: (q, p).
    """
    X = np.asarray(X, dtype=np.float64)
    U = np.asarray(U, dtype=np.float64)
    n = X.shape[0]
    q = U.shape[0]
    if q != 3:
        raise ValueError("oracle solver is specialized to q=3")
    G = U @ U.T
    K = np.zeros((q + 1, q + 1))
    K[:q, :q] = G
    K[:q, q] = 1.0
    K[q, :q] = 1.0
    Kinv = np.linalg.inv(K)
    B = X @ U.T
    sol = B @ Kinv[:q, :q].T + Kinv[:q, q][None, :]
    out = sol.copy()
    bad = ~(sol >= 0.0).all(axis=1)
    if bad.any():
        Xb = X[bad]
        m = Xb.shape[0]
        best_obj = np.full(m, np.inf)
        best_a = np.zeros((m, q))
        for i in range(q):
            for j in range(i + 1, q):
                d = U[j] - U[i]
                dd = float(d @ d)
                t = ((Xb - U[i][None, :]) @ d) / dd if dd > 0 else \
                    np.zeros(m)
                t = np.clip(t, 0.0, 1.0)
                resid = U[i][None, :] + t[:, None] * d[None, :] - Xb
                obj = (resid ** 2).sum(axis=1)
                better = obj < best_obj
                best_obj = np.where(better, obj, best_obj)
                best_a[better] = 0.0
                best_a[better, i] = 1.0 - t[better]
                best_a[better, j] = t[better]
        out[bad] = best_a
    return out


def _expected_fcls_means(stored):
    """Per-tile expected FCLS abundance means (micro-4 units) against the
    TRUE endmember spectra, replicating the engine's float32 abundance
    storage before the mean. Returns {(ty, tx): (u4_0, u4_1, u4_2)}."""
    p = stored.shape[0]
    X = stored.reshape(p, -1).T.astype(np.float64)
    ab = _fcls_oracle(X, ENDMEMBERS)            # (h*w, 3)
    ab32 = ab.astype(np.float32).astype(np.float64)
    ab_img = ab32.T.reshape(3, IMG_H, IMG_W)
    out = {}
    for ty in range(IMG_H // TILE):
        for tx in range(IMG_W // TILE):
            sub = ab_img[:, ty * TILE:(ty + 1) * TILE,
                         tx * TILE:(tx + 1) * TILE].reshape(3, -1)
            means = sub.mean(axis=1)
            out[(ty, tx)] = tuple(
                int(np.floor(means[b] * 10_000)) for b in range(3))
    return out


# Inline three-date composite ground truth. The spec mirrors the
# reference's composite3 semantics (utils.py:454-525): starred reducers
# and median strip NoData (all-NoData -> NoData); dates are the stored
# pixels and +-10 shifts with NoData preserved. Every reduced value is a
# multiple of 1/6 (mean of <=3 ints, median of <=3 ints), so
# round(sum * 6) is an exact integer on both sides regardless of float
# summation order.
_COMPOSITE_REDUCERS = ("max", "median", "mean", "min", "median", "max")


def _expected_zonal(stored):
    """Per-tile band-0 sum and count over non-NoData pixels — the
    zonal-statistics ground truth: {(ty, tx): (b0_sum, b0_n)}."""
    out = {}
    b0 = stored[0].astype(np.int64)
    for ty in range(IMG_H // TILE):
        for tx in range(IMG_W // TILE):
            sub = b0[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            valid = sub != NODATA
            out[(ty, tx)] = (int(sub[valid].sum()), int(valid.sum()))
    return out


def _expected_composite_checksums(stored):
    """{(ty, tx): checksum_x6} per tile, inline numpy."""
    out = {}
    for ty in range(IMG_H // TILE):
        for tx in range(IMG_W // TILE):
            a = stored[:, ty * TILE:(ty + 1) * TILE,
                       tx * TILE:(tx + 1) * TILE]
            d2 = np.where(a == NODATA, NODATA, a + 10)
            d3 = np.where(a == NODATA, NODATA, a - 10)
            total = 0.0
            for b, red in enumerate(_COMPOSITE_REDUCERS):
                stack = np.stack([a[b], d2[b], d3[b]]).astype(np.float64)
                work = np.where(stack == NODATA, np.nan, stack)
                all_nd = np.isnan(work).all(axis=0)
                with np.errstate(invalid="ignore"):
                    import warnings as _w
                    with _w.catch_warnings():
                        _w.simplefilter("ignore", RuntimeWarning)
                        red_v = getattr(np, "nan%s" % red)(work, axis=0)
                red_v = np.where(all_nd, 0.0, red_v)
                total += red_v.sum()
            out[(ty, tx)] = int(np.rint(total * 6.0))
    return out


# Hall rectification control sets: fixed (x, y) pixel locations in every
# image (never inside the planted NoData strip at rows 0-3).
HALL_BRIGHT_PX = ((10, 20), (30, 40), (50, 50))
HALL_DARK_PX = ((5, 60), (45, 8), (60, 33))


def _expected_hall_b0(stored):
    """Expected rectified band-0 sum (Hall 1991 semantics, inline):
    rectify the image's control means to the corpus's canonical
    bright/dark reference spectra (true endmembers row 1 = bright
    impervious, row 2 = dark water), per-pixel int32 truncation, sum over
    non-NoData band-0 pixels."""
    ref_bright = ENDMEMBERS[1]
    ref_dark = ENDMEMBERS[2]
    img_bright = np.array([stored[:, y, x] for x, y in HALL_BRIGHT_PX])\
        .mean(axis=0)
    img_dark = np.array([stored[:, y, x] for x, y in HALL_DARK_PX])\
        .mean(axis=0)
    # a degenerate control set (bright mean == dark mean on a band)
    # divides by zero; the engine kernel hits the identical inf/nan
    # arithmetic, so only silence the warnings — don't change values
    with np.errstate(divide="ignore", invalid="ignore"):
        m = (ref_bright - ref_dark) / (img_bright - img_dark)
        b = (ref_dark * img_bright - img_dark * ref_bright) \
            / (img_bright - img_dark)
        flat = stored.reshape(stored.shape[0], -1).astype(np.float64)
        # clip before the int32 cast: NoData (-9999) times a large gain
        # can exceed the int32 range, and out-of-range float->int casts
        # are undefined; clipping pins the behavior (engine clips too)
        rect = np.clip(flat * m.reshape(-1, 1) + b.reshape(-1, 1),
                       -2.0 ** 31, 2.0 ** 31 - 1).astype(np.int32)
    rect[stored.reshape(stored.shape[0], -1) == NODATA] = NODATA
    r0 = rect[0]
    return int(r0[r0 != NODATA].sum())


N_PROBE_POINTS = 20


def _expected_point_spectra(seq, stored, n_images):
    """Probe-point ground truth for image ``seq`` (< N_PROBE_POINTS): the
    deterministic probe point derived from this image's center lands at
    pixel (32, 32) = tile (1, 1) local (0, 0); record (point_id, tile_id,
    b0, b5) with inline truncation arithmetic."""
    gt = image_geotransform(seq, n_images)
    x = gt[0] + 32 * gt[1] + 1.0
    y = gt[3] + 32 * gt[5] - 1.0
    px = int((x - gt[0]) / gt[1])
    py = int((y - gt[3]) / gt[5])
    ty, tx = py // TILE, px // TILE
    return {
        "point_id": seq,
        "tile_id": "img%08d_t%d_%d" % (seq, ty, tx),
        "b0": int(stored[0, py, px]),
        "b5": int(stored[5, py, px]),
    }


def generate_corpus(out_dir, n_images, seed=7, force=False):
    """Write the corpus into ``out_dir``; idempotent via a DONE marker."""
    out = pathlib.Path(out_dir)
    done = out / "_DONE"
    stamp = "v%d n%d seed%d" % (GENERATOR_VERSION, n_images, seed)
    if done.exists() and not force and done.read_text() == stamp:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    fmts = ("raw", "zraw", "q8", "tiff")
    img_dir = out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    shard = 0
    exp_rows = {"image_id": [], "n_water": [], "n_saturated": [],
                "n_nodata": [], "n_qa_masked": []}
    for b in range(BANDS):
        for stat in ("min", "max", "sum", "count"):
            exp_rows["b%d_%s" % (b, stat)] = []
    exp_rows["n_ndvi_pos"] = []
    exp_rows["tc1_sum_floor"] = []
    exp_rows["b0_sum_rect"] = []
    spec_rows = {k: [] for k in (
        "tile_id", "caption", "q", "mean_ab0_u4", "mean_ab1_u4",
        "mean_ab2_u4", "comp_checksum_x6", "b0_sum", "b0_n")}
    point_rows = {k: [] for k in ("point_id", "tile_id", "b0", "b5")}
    prev_pixels = None
    chunk = 512
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("qa", pa.binary()),
        ("gt", pa.list_(pa.float64(), 6)), ("crs", pa.string()),
    ])
    try:
        for start in range(0, n_images, chunk):
            stop = min(start + chunk, n_images)
            cols = {k: [] for k in (
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "qa", "gt", "crs")}
            for seq in range(start, stop):
                rng = np.random.default_rng(
                    np.random.SeedSequence([seed, seq]))
                if seq % 97 == 1 and prev_pixels is not None:
                    pixels = prev_pixels.copy()   # planted exact duplicate
                    qa = np.zeros((IMG_H, IMG_W), dtype=np.uint8)
                else:
                    pixels = _make_pixels(rng)
                    qa = np.zeros((IMG_H, IMG_W), dtype=np.uint8)
                    _plant(pixels, qa, seq)
                prev_pixels = pixels
                fmt = fmts[seq % len(fmts)]
                gt = image_geotransform(seq, n_images)
                image_id = "img%08d" % seq
                cols["image_id"].append(image_id)
                cols["bytes"].append(encode_image(pixels, fmt))
                cols["w"].append(IMG_W)
                cols["h"].append(IMG_H)
                cols["fmt"].append(fmt)
                cols["caption"].append(_caption(rng, seq))
                cols["phash"].append(_phash(pixels))
                cols["qa"].append(qa.tobytes())
                cols["gt"].append(list(gt))
                cols["crs"].append(CRS)
                # ground truth is the DECODED payload (lossy fmts alter
                # pixels near mask thresholds); the q8 reconstruction is
                # replicated inline so no engine decoder is in the oracle
                stored = pixels if fmt != "q8" else \
                    _q8_roundtrip_inline(pixels)
                w_, s_, n_, q_ = _expected_counts(stored, qa)
                exp_rows["image_id"].append(image_id)
                exp_rows["n_water"].append(w_)
                exp_rows["n_saturated"].append(s_)
                exp_rows["n_nodata"].append(n_)
                exp_rows["n_qa_masked"].append(q_)
                for b, (mn, mx, sm, ct) in enumerate(
                        _expected_band_stats(stored)):
                    exp_rows["b%d_min" % b].append(mn)
                    exp_rows["b%d_max" % b].append(mx)
                    exp_rows["b%d_sum" % b].append(sm)
                    exp_rows["b%d_count" % b].append(ct)
                nd_, tc_ = _expected_spectral(stored)
                exp_rows["n_ndvi_pos"].append(nd_)
                exp_rows["tc1_sum_floor"].append(tc_)
                exp_rows["b0_sum_rect"].append(_expected_hall_b0(stored))
                fcls = _expected_fcls_means(stored)
                comp = _expected_composite_checksums(stored)
                zonal = _expected_zonal(stored)
                for (ty, tx), means in sorted(fcls.items()):
                    spec_rows["tile_id"].append(
                        "%s_t%d_%d" % (image_id, ty, tx))
                    spec_rows["caption"].append(cols["caption"][-1])
                    spec_rows["q"].append(3)
                    spec_rows["mean_ab0_u4"].append(means[0])
                    spec_rows["mean_ab1_u4"].append(means[1])
                    spec_rows["mean_ab2_u4"].append(means[2])
                    spec_rows["comp_checksum_x6"].append(comp[(ty, tx)])
                    spec_rows["b0_sum"].append(zonal[(ty, tx)][0])
                    spec_rows["b0_n"].append(zonal[(ty, tx)][1])
                if seq < N_PROBE_POINTS:
                    pt = _expected_point_spectra(seq, stored, n_images)
                    for k, v in pt.items():
                        point_rows[k].append(v)
            tbl = pa.table(
                {"image_id": pa.array(cols["image_id"], pa.string()),
                 "bytes": pa.array(cols["bytes"], pa.binary()),
                 "w": pa.array(cols["w"], pa.int32()),
                 "h": pa.array(cols["h"], pa.int32()),
                 "fmt": pa.array(cols["fmt"], pa.string()),
                 "caption": pa.array(cols["caption"], pa.string()),
                 "phash": pa.array(cols["phash"], pa.int64()),
                 "qa": pa.array(cols["qa"], pa.binary()),
                 "gt": pa.array(cols["gt"], pa.list_(pa.float64(), 6)),
                 "crs": pa.array(cols["crs"], pa.string())},
                schema=schema)
            # one file per chunk: Ray parallelizes parquet reads over
            # FILES (a single 468 MB file read serially cost ~5 s at
            # sf0.1); small row groups keep intra-file splits possible
            pq.write_table(tbl,
                           str(img_dir / ("part-%05d.parquet" % shard)),
                           row_group_size=ROW_GROUP)
            shard += 1
    finally:
        pass

    pq.write_table(pa.table({k: pa.array(v) for k, v in exp_rows.items()}),
                   str(out / "images_expected.parquet"))
    pq.write_table(
        pa.table({k: pa.array(v) for k, v in spec_rows.items()}),
        str(out / "tiles_spectral_expected.parquet"))
    pq.write_table(
        pa.table({k: pa.array(v) for k, v in point_rows.items()}),
        str(out / "points_expected.parquet"))
    _write_tiles_expected(out, n_images)
    _write_polygons(out, n_images, seed)
    manifest = {
        "n_images": n_images, "seed": seed, "w": IMG_W, "h": IMG_H,
        "bands": BANDS, "px": PX, "tile": TILE, "cell_level": CELL_LEVEL,
        "origin_x": ORIGIN_X, "origin_y": ORIGIN_Y, "crs": CRS,
        "endmembers": ENDMEMBERS.tolist(),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    done.write_text(stamp)
    return str(out)


def _write_tiles_expected(out, n_images):
    """Closed-form tile lattice: pure arithmetic, no pixel decode.

    Fully independent of the engine's geo/cellindex code: the tile
    geotransform is derived inline from the documented affine (sub-window
    origin = image origin + offset * pixel size; axis-aligned, north-up)
    and the cell indices from the documented grid spec (origin (0, 0),
    level-0 edge 2^22 m, halved per level, floor division).
    """
    tiles_per_side = IMG_W // TILE
    rows = {k: [] for k in (
        "tile_id", "image_id", "row_off", "col_off", "cx", "cy",
        "cell_ix", "cell_iy", "cell_level",
        "gt0", "gt1", "gt2", "gt3", "gt4", "gt5")}
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    for seq in range(n_images):
        gt = image_geotransform(seq, n_images)
        image_id = "img%08d" % seq
        for ty in range(tiles_per_side):
            for tx in range(tiles_per_side):
                row_off, col_off = ty * TILE, tx * TILE
                tgt = (gt[0] + col_off * PX, PX, 0.0,
                       gt[3] - row_off * PX, 0.0, -PX)
                cx = tgt[0] + (TILE / 2.0) * tgt[1]
                cy = tgt[3] + (TILE / 2.0) * tgt[5]
                rows["tile_id"].append("%s_t%d_%d" % (image_id, ty, tx))
                rows["image_id"].append(image_id)
                rows["row_off"].append(row_off)
                rows["col_off"].append(col_off)
                rows["cx"].append(cx)
                rows["cy"].append(cy)
                rows["cell_ix"].append(int(cx // edge))
                rows["cell_iy"].append(int(cy // edge))
                rows["cell_level"].append(CELL_LEVEL)
                for i in range(6):
                    rows["gt%d" % i].append(tgt[i])
    pq.write_table(pa.table({k: pa.array(v) for k, v in rows.items()}),
                   str(out / "tiles_expected.parquet"))


def _write_polygons(out, n_images, seed):
    """Axis-aligned rectangular polygons over the corpus extent.

    Bounds end in .5 m so they never coincide with integer tile-centroid
    coordinates (no inclusive/exclusive boundary ambiguity vs the SQL
    oracle's BETWEEN).
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, 10**9]))
    ncols = int(np.ceil(np.sqrt(n_images)))
    nrows = int(np.ceil(n_images / ncols))
    extent_w = ncols * IMG_W * PX
    extent_h = nrows * IMG_H * PX
    n_polys = max(8, n_images // 10)
    rows = {k: [] for k in (
        "poly_id", "xmin", "ymin", "xmax", "ymax", "cx", "cy",
        "ring", "cells")}
    for i in range(n_polys):
        w = float(rng.integers(1, 5)) * TILE * PX * rng.uniform(0.5, 1.5)
        h = float(rng.integers(1, 5)) * TILE * PX * rng.uniform(0.5, 1.5)
        x0 = ORIGIN_X + rng.uniform(0, max(1.0, extent_w - w))
        y1 = ORIGIN_Y - rng.uniform(0, max(1.0, extent_h - h))
        xmin = float(np.floor(x0)) + 0.5
        ymax = float(np.floor(y1)) + 0.5
        xmax = xmin + float(np.floor(w))
        ymin = ymax - float(np.floor(h))
        ring = [(xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin),
                (xmin, ymax)]
        rows["poly_id"].append("poly%05d" % i)
        rows["xmin"].append(xmin)
        rows["ymin"].append(ymin)
        rows["xmax"].append(xmax)
        rows["ymax"].append(ymax)
        rows["cx"].append((xmin + xmax) / 2.0)
        rows["cy"].append((ymin + ymax) / 2.0)
        rows["ring"].append([[x, y] for x, y in ring])
        rows["cells"].append(
            cellindex.cover_bbox(xmin, ymin, xmax, ymax, CELL_LEVEL))
    tbl = pa.table({
        "poly_id": pa.array(rows["poly_id"], pa.string()),
        "xmin": pa.array(rows["xmin"], pa.float64()),
        "ymin": pa.array(rows["ymin"], pa.float64()),
        "xmax": pa.array(rows["xmax"], pa.float64()),
        "ymax": pa.array(rows["ymax"], pa.float64()),
        "cx": pa.array(rows["cx"], pa.float64()),
        "cy": pa.array(rows["cy"], pa.float64()),
        "ring": pa.array(rows["ring"], pa.list_(pa.list_(pa.float64(), 2))),
        "cells": pa.array(rows["cells"], pa.list_(pa.uint64())),
    })
    pq.write_table(tbl, str(out / "polygons.parquet"))


def generate_skewed_corpus(out_dir, n_images, seed=7, hot_frac=0.5,
                           force=False):
    """Skewed corpus variant for the skew-handling benches.

    ``hot_frac`` of the images STACK at one lattice location (identical
    geotransform, so all their tiles land in the same cells — planted hot
    cells for the salted-groupby / split-hot-tiles plans), and every
    third hot image is an exact pixel copy of the first (planted phash
    duplicate cluster). The rest follow the normal grid. Sidecar
    ``skew_tiles_expected.parquet`` carries the closed-form (tile_id,
    image_id, cell_ix, cell_iy) lattice, computed with the same inline
    arithmetic as ``_write_tiles_expected``, for the salted==unsalted
    parity oracle.
    """
    out = pathlib.Path(out_dir)
    done = out / "_DONE"
    stamp = "skew v%d n%d seed%d hot%.2f" % (GENERATOR_VERSION, n_images,
                                             seed, hot_frac)
    if done.exists() and not force and done.read_text() == stamp:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    img_dir = out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    n_hot = int(round(n_images * hot_frac))
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    tiles_per_side = IMG_W // TILE
    exp = {k: [] for k in ("tile_id", "image_id", "cell_ix", "cell_iy")}
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("qa", pa.binary()),
        ("gt", pa.list_(pa.float64(), 6)), ("crs", pa.string()),
    ])
    hot_base = None
    shard = 0
    chunk = 512
    for start in range(0, n_images, chunk):
        stop = min(start + chunk, n_images)
        cols = {k: [] for k in (
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "qa", "gt", "crs")}
        for seq in range(start, stop):
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, 77, seq]))
            is_hot = seq < n_hot
            if is_hot:
                gt = image_geotransform(0, n_images)
                if hot_base is None:
                    hot_base = _make_pixels(rng)
                pixels = hot_base.copy() if seq % 3 == 0 \
                    else _make_pixels(rng)
            else:
                gt = image_geotransform(seq, n_images)
                pixels = _make_pixels(rng)
            qa = np.zeros((IMG_H, IMG_W), dtype=np.uint8)
            image_id = "img%08d" % seq
            cols["image_id"].append(image_id)
            cols["bytes"].append(encode_image(pixels, "zraw"))
            cols["w"].append(IMG_W)
            cols["h"].append(IMG_H)
            cols["fmt"].append("zraw")
            cols["caption"].append(_caption(rng, seq))
            cols["phash"].append(_phash(pixels))
            cols["qa"].append(qa.tobytes())
            cols["gt"].append(list(gt))
            cols["crs"].append(CRS)
            for ty in range(tiles_per_side):
                for tx in range(tiles_per_side):
                    cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                    cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                    exp["tile_id"].append(
                        "%s_t%d_%d" % (image_id, ty, tx))
                    exp["image_id"].append(image_id)
                    exp["cell_ix"].append(int(cx // edge))
                    exp["cell_iy"].append(int(cy // edge))
        tbl = pa.table({k: pa.array(cols[k], schema.field(k).type)
                        for k in schema.names}, schema=schema)
        pq.write_table(tbl, str(img_dir / ("part-%05d.parquet" % shard)),
                       row_group_size=ROW_GROUP)
        shard += 1
    pq.write_table(pa.table({k: pa.array(v) for k, v in exp.items()}),
                   str(out / "skew_tiles_expected.parquet"))
    (out / "manifest.json").write_text(json.dumps(
        {"n_images": n_images, "seed": seed, "n_hot": n_hot,
         "skewed": True}, indent=2))
    done.write_text(stamp)
    return str(out)


# ---------------------------------------------------------------------------
# near-duplicate ground truth over the provided documents table:
# generation-time O(n^2) exact Jaccard / Hamming sidecars (inline
# replications of the PUBLISHED shingle/minhash-verify/simhash specs,
# not imports of the engine's operators) so the LSH near-dup queries get
# hash-checkable oracles (VERDICT r02 item 1).

NEARDUP_VERSION = 3
NEARDUP_MAX_DOCS = 1500    # O(n^2) sidecar only at oracle scales
PLANTED_OFFSET = 1_000_000


def perturb_docs(texts_by_id, n_dups=20, seed=99):
    """The planted near-dup CONSTRUCTION (shared input builder, not an
    oracle): token-perturbed copies of the first ``n_dups`` docs sorted
    by doc_id, ids offset by PLANTED_OFFSET. One shared rng in doc_id
    order keeps query and oracle inputs bit-identical."""
    rng = np.random.default_rng(seed)
    out = []
    for doc_id in sorted(texts_by_id)[:n_dups]:
        toks = texts_by_id[doc_id].split(" ")
        idx = rng.integers(0, max(1, len(toks)),
                           size=max(1, len(toks) // 10))
        for i in idx:
            toks[int(i)] = "PERTURBED"
        out.append((int(doc_id) + PLANTED_OFFSET, " ".join(toks)))
    return out


def _shingles_inline(text, k=8):
    if len(text) < k:
        return {text} if text else set()
    return {text[i:i + k] for i in range(len(text) - k + 1)}


def _simhash_inline(text, k=2):
    """Inline SimHash (Charikar 2002 over char k-gram features with
    md5-derived 64-bit feature ids — the documented spec)."""
    if not text:
        return 0
    if len(text) < k:
        grams = [text]
    else:
        grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    ids = np.array([int.from_bytes(
        hashlib.md5(g.encode()).digest()[:8], "little") for g in grams],
        dtype=np.uint64)
    bits = ((ids[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def generate_neardup_expected(sf_dir, n_dups=20, seed=99, jac_floor=0.3,
                              max_hamming=8, shingle_k=8, sim_k=2):
    """Write minhash_expected / simhash_expected sidecars into the corpus
    dir: ALL pairs (base ∪ planted) with char-k-gram Jaccard >= jac_floor
    resp. SimHash Hamming <= max_hamming, with a ``planted`` flag for
    pairs touching a planted doc. Returns the corpus dir, or None when
    the documents table exceeds the O(n^2) guard."""
    import pyarrow.dataset as pads
    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_NEARDUP_DONE"
    stamp = "neardup v%d n%d seed%d" % (NEARDUP_VERSION, n_dups, seed)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    docs_path = os.path.join(str(sf_dir), "documents.parquet")
    tbl = pads.dataset(docs_path, format="parquet").to_table(
        columns=["doc_id", "text"])
    if tbl.num_rows > NEARDUP_MAX_DOCS:
        return None
    out.mkdir(parents=True, exist_ok=True)
    base = dict(zip((int(i) for i in tbl["doc_id"].to_pylist()),
                    tbl["text"].to_pylist()))
    planted = perturb_docs(base, n_dups, seed)
    all_docs = dict(base)
    all_docs.update(planted)
    ids = sorted(all_docs)

    # the planted docs themselves as a table, so pure-SQL oracles can
    # reproduce the documents ∪ planted union (line_dedup et al.)
    pq.write_table(pa.table({
        "doc_id": pa.array([i for i, _ in planted], pa.int64()),
        "text": pa.array([t for _, t in planted], pa.string())}),
        str(out / "planted_docs.parquet"))

    # exact Jaccard sidecar
    sets = {i: _shingles_inline(all_docs[i], shingle_k) for i in ids}
    mh = {k: [] for k in ("doc_a", "doc_b", "jaccard_u6", "planted")}
    for ai in range(len(ids)):
        a = ids[ai]
        sa = sets[a]
        la = len(sa)
        for bi in range(ai + 1, len(ids)):
            b = ids[bi]
            sb = sets[b]
            lb = len(sb)
            mn, mx = (la, lb) if la <= lb else (lb, la)
            if mx and mn / mx < jac_floor:
                continue            # |A∩B| <= min ⇒ j <= min/max
            inter = len(sa & sb)
            union = la + lb - inter
            j = (inter / union) if union else 1.0
            if j >= jac_floor:
                mh["doc_a"].append(a)
                mh["doc_b"].append(b)
                mh["jaccard_u6"].append(int(np.floor(j * 1_000_000)))
                mh["planted"].append(a >= PLANTED_OFFSET
                                     or b >= PLANTED_OFFSET)
    pq.write_table(pa.table({
        "doc_a": pa.array(mh["doc_a"], pa.int64()),
        "doc_b": pa.array(mh["doc_b"], pa.int64()),
        "jaccard_u6": pa.array(mh["jaccard_u6"], pa.int64()),
        "planted": pa.array(mh["planted"], pa.bool_())}),
        str(out / "minhash_expected.parquet"))

    # exact Hamming sidecar
    sigs = np.array([_simhash_inline(all_docs[i], sim_k) for i in ids],
                    dtype=np.uint64)
    xor = np.bitwise_xor.outer(sigs, sigs)
    ham = np.unpackbits(xor.view(np.uint8).reshape(len(ids), len(ids), 8),
                        axis=2).sum(axis=2)
    sh = {k: [] for k in ("doc_a", "doc_b", "hamming", "planted")}
    ia, ib = np.nonzero(np.triu(ham <= max_hamming, 1))
    for a_i, b_i in zip(ia, ib):
        a, b = ids[int(a_i)], ids[int(b_i)]
        sh["doc_a"].append(a)
        sh["doc_b"].append(b)
        sh["hamming"].append(int(ham[a_i, b_i]))
        sh["planted"].append(a >= PLANTED_OFFSET or b >= PLANTED_OFFSET)
    pq.write_table(pa.table({
        "doc_a": pa.array(sh["doc_a"], pa.int64()),
        "doc_b": pa.array(sh["doc_b"], pa.int64()),
        "hamming": pa.array(sh["hamming"], pa.int64()),
        "planted": pa.array(sh["planted"], pa.bool_())}),
        str(out / "simhash_expected.parquet"))
    done.write_text(stamp)
    return str(out)


# ---------------------------------------------------------------------------
# planted near-duplicate embeddings: the provided embeddings table has
# no high-cosine pairs (max ~0.51), so the cosine-LSH near-dup query was
# vacuous. Perturbed copies of the first vectors (cosine ~0.999) plus an
# exact inline all-pairs cosine sidecar give it a hash-checkable oracle.

EMB_PLANT_VERSION = 1
EMB_PLANT_MAX_ROWS = 50_000


def generate_embeddings_planted(sf_dir, n_plant=10, noise=0.03, seed=55,
                                threshold=0.95):
    """Write embeddings_planted.parquet (perturbed near-dup rows, ids
    offset by PLANTED_OFFSET) and cosine_neardup_expected.parquet (ALL
    pairs of base ∪ planted with cosine >= threshold, exact inline
    numpy) into the corpus dir. Returns the corpus dir or None above the
    O(n^2) guard."""
    import pyarrow.dataset as pads
    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_EMBPLANT_DONE"
    stamp = "embplant v%d n%d seed%d" % (EMB_PLANT_VERSION, n_plant, seed)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    tbl = pads.dataset(os.path.join(str(sf_dir), "embeddings.parquet"),
                       format="parquet").to_table(
        columns=["vec_id", "embedding"])
    if tbl.num_rows > EMB_PLANT_MAX_ROWS:
        return None
    out.mkdir(parents=True, exist_ok=True)
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    M = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    rng = np.random.default_rng(seed)
    p_ids = []
    p_vecs = []
    for j in range(min(n_plant, len(ids))):
        v = M[j]
        g = rng.standard_normal(v.shape)
        g = g / np.linalg.norm(g)
        p_ids.append(int(ids[j]) + PLANTED_OFFSET)
        p_vecs.append(v + noise * np.linalg.norm(v) * g)
    p_vecs = np.asarray(p_vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(p_ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in p_vecs],
                              pa.list_(pa.float64()))}),
        str(out / "embeddings_planted.parquet"))
    # exact all-pairs cosine over base ∪ planted (inline, no engine code)
    all_ids = np.concatenate([ids, np.asarray(p_ids, dtype=np.int64)])
    A = np.vstack([M, p_vecs])
    norms = np.linalg.norm(A, axis=1)
    norms[norms == 0] = 1.0
    An = A / norms[:, None]
    sims = An @ An.T
    iu = np.triu_indices(len(all_ids), 1)
    keep = sims[iu] >= threshold
    a_raw = all_ids[iu[0][keep]]
    b_raw = all_ids[iu[1][keep]]
    vec_a = np.minimum(a_raw, b_raw)
    vec_b = np.maximum(a_raw, b_raw)
    o = np.lexsort((vec_b, vec_a))
    pq.write_table(pa.table({
        "vec_a": pa.array(vec_a[o], pa.int64()),
        "vec_b": pa.array(vec_b[o], pa.int64())}),
        str(out / "cosine_neardup_expected.parquet"))
    done.write_text(stamp)
    return str(out)


# ---------------------------------------------------------------------------
# multimodal media tables (audio as REAL RIFF/PCM16 WAV payloads decoded
# by the engine's stdlib codec; video as opaque synthetic payloads whose
# decode spec is documented in stages/media.py) + generation-time
# expected-feature sidecars so the driver's DuckDB oracle can hash-check
# the actor-pool media stages (VERDICT r02 items 1 and 6).

MEDIA_VERSION = 5
AUDIO_WINDOW = 1024
AUDIO_HOP = 512
GOERTZEL_HZ = 1000.0
VIDEO_EVERY = 12
VIDEO_OUT = 32


def _media_counts(n_images):
    return max(50, n_images // 24), max(50, n_images // 24)


def _audio_expected_inline(x_dec, window=AUDIO_WINDOW, hop=AUDIO_HOP):
    """Inline replication of the documented window/RMS/ZCR spec
    (stages/media.py AudioFeatureActor, float64) over the DECODED
    samples. Returns (n_windows, rms_head_u6, zcr_head_u6, rms_sum_u6)."""
    x = np.asarray(x_dec, dtype=np.float64)
    n_win = max(0, 1 + (len(x) - window) // hop)
    if not n_win:
        return 0, -1, -1, 0
    idx = np.arange(n_win)[:, None] * hop + np.arange(window)[None, :]
    frames = x[idx]
    rms = np.sqrt((frames ** 2).mean(axis=1))
    zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
    rms_u6 = np.floor(rms * 1e6).astype(np.int64)
    zcr_u6 = np.floor(zcr * 1e6).astype(np.int64)
    return (n_win, int(rms_u6[0]), int(zcr_u6[0]), int(rms_u6.sum()))


def _goertzel_expected_inline(x_dec, sr, window=AUDIO_WINDOW,
                              hop=AUDIO_HOP, freq=GOERTZEL_HZ):
    """Inline replication of the documented Goertzel band-energy spec
    (stages/media.py GoertzelActor): pairwise-summed (frames*basis)
    products in float64 — the SAME reduction expression as the engine,
    deliberately not a BLAS matmul. Returns (g_head_u6, g_sum_u6)."""
    x = np.asarray(x_dec, dtype=np.float64)
    n_win = max(0, 1 + (len(x) - window) // hop)
    if not n_win:
        return -1, 0
    k = int(round(freq * window / sr))
    wv = 2.0 * np.pi * k / window
    t = np.arange(window, dtype=np.float64)
    cosv, sinv = np.cos(wv * t), np.sin(wv * t)
    idx = np.arange(n_win)[:, None] * hop + np.arange(window)[None, :]
    frames = x[idx]
    c = (frames * cosv).sum(axis=1)
    s = (frames * sinv).sum(axis=1)
    g_u6 = np.floor((c * c + s * s) * 1e6).astype(np.int64)
    return int(g_u6[0]), int(g_u6.sum())


def _video_frame_inline(buf, idx, h, w, out_h=VIDEO_OUT, out_w=VIDEO_OUT):
    """Inline replication of the documented synthetic video decode +
    nearest-neighbor resize spec (stages/media.py); returns px_sum."""
    hh = hashlib.blake2b(buf + idx.to_bytes(4, "little"), digest_size=8,
                         person=b"video").digest()
    rng = np.random.default_rng(int.from_bytes(hh, "little"))
    s = rng.standard_normal(h * w).astype(np.float32)
    frame = np.clip((s * 40 + 128), 0, 255).astype(np.uint8)\
        .reshape(h, w)
    ys = (np.arange(out_h) * h // out_h)
    xs = (np.arange(out_w) * w // out_w)
    small = frame[ys[:, None], xs[None, :]]
    return int(small.astype(np.int64).sum())


def generate_media(out_dir, n_images, seed=7, force=False):
    """Write media_audio/media_video tables + expected sidecars into the
    corpus dir (own DONE stamp so existing corpora don't regenerate)."""
    from ..stages.media import encode_wav_pcm16
    out = pathlib.Path(out_dir)
    done = out / "_MEDIA_DONE"
    stamp = "media v%d n%d seed%d" % (MEDIA_VERSION, n_images, seed)
    if done.exists() and not force and done.read_text() == stamp:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    n_audio, n_video = _media_counts(n_images)

    a_rows = {k: [] for k in ("media_id", "bytes", "kind", "sr",
                              "n_samples", "caption")}
    a_exp = {k: [] for k in ("media_id", "n_windows", "rms_head_u6",
                             "zcr_head_u6", "rms_sum_u6", "g_head_u6",
                             "g_sum_u6", "caption")}
    for i in range(n_audio):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 41, i]))
        n_samples = 8192 + 512 * int(rng.integers(8))
        x = np.clip(rng.standard_normal(n_samples) * 0.3, -1.0, 1.0)
        sr = 16000
        buf = encode_wav_pcm16(x, sr)
        cap = "audio clip %05d" % i
        a_rows["media_id"].append("aud%05d" % i)
        a_rows["bytes"].append(buf)
        a_rows["kind"].append("audio")
        a_rows["sr"].append(sr)
        a_rows["n_samples"].append(n_samples)
        a_rows["caption"].append(cap)
        # expected features over the DECODED (PCM-quantized) samples —
        # quantization replicated inline, not via the engine codec
        # int16 cast matters: np.rint keeps -0.0 whose signbit flips
        # the ZCR vs the engine's int16-decoded +0.0
        pcm = np.rint(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
        x_dec = pcm.astype(np.float64) / 32767.0
        nw, rh, zh, rs = _audio_expected_inline(x_dec)
        gh, gs = _goertzel_expected_inline(x_dec, sr)
        a_exp["media_id"].append("aud%05d" % i)
        a_exp["n_windows"].append(nw)
        a_exp["rms_head_u6"].append(rh)
        a_exp["zcr_head_u6"].append(zh)
        a_exp["rms_sum_u6"].append(rs)
        a_exp["g_head_u6"].append(gh)
        a_exp["g_sum_u6"].append(gs)
        a_exp["caption"].append(cap)
    pq.write_table(
        pa.table({
            "media_id": pa.array(a_rows["media_id"], pa.string()),
            "bytes": pa.array(a_rows["bytes"], pa.binary()),
            "kind": pa.array(a_rows["kind"], pa.string()),
            "sr": pa.array(a_rows["sr"], pa.int32()),
            "n_samples": pa.array(a_rows["n_samples"], pa.int32()),
            "caption": pa.array(a_rows["caption"], pa.string())}),
        str(out / "media_audio.parquet"))
    pq.write_table(pa.table({k: pa.array(v) for k, v in a_exp.items()}),
                   str(out / "media_audio_expected.parquet"))

    # multi-channel / multi-depth audio: stereo-16, stereo-8, mono-8
    # payloads through the generic RIFF codec; expected features over
    # the channel-mean DOWNMIX (quantization replicated per bit depth)
    from ..stages.media import encode_wav
    mc_rows = {k: [] for k in ("media_id", "bytes", "kind", "channels",
                               "bits", "sr", "n_samples", "caption")}
    mc_exp = {k: [] for k in ("media_id", "n_windows", "rms_head_u6",
                              "zcr_head_u6", "rms_sum_u6", "caption")}
    variants = ((2, 16), (2, 8), (1, 8))
    for i in range(max(6, n_audio // 2)):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 47, i]))
        ch, bits = variants[i % len(variants)]
        n_samples = 8192 + 512 * int(rng.integers(8))
        x = np.clip(rng.standard_normal((n_samples, ch)) * 0.3,
                    -1.0, 1.0)
        sr = 16000
        buf = encode_wav(x, sr, bits=bits)
        cap = "mc clip %05d" % i
        mc_rows["media_id"].append("mc%05d" % i)
        mc_rows["bytes"].append(buf)
        mc_rows["kind"].append("audio")
        mc_rows["channels"].append(ch)
        mc_rows["bits"].append(bits)
        mc_rows["sr"].append(sr)
        mc_rows["n_samples"].append(n_samples)
        mc_rows["caption"].append(cap)
        if bits == 16:
            dec = np.rint(x * 32767.0).astype(np.int16)\
                .astype(np.float64) / 32767.0
        else:
            dec = np.rint(x * 127.0).astype(np.float64) / 127.0
        x_mono = dec.mean(axis=1)
        nw, rh, zh, rs = _audio_expected_inline(x_mono)
        mc_exp["media_id"].append("mc%05d" % i)
        mc_exp["n_windows"].append(nw)
        mc_exp["rms_head_u6"].append(rh)
        mc_exp["zcr_head_u6"].append(zh)
        mc_exp["rms_sum_u6"].append(rs)
        mc_exp["caption"].append(cap)
    pq.write_table(
        pa.table({
            "media_id": pa.array(mc_rows["media_id"], pa.string()),
            "bytes": pa.array(mc_rows["bytes"], pa.binary()),
            "kind": pa.array(mc_rows["kind"], pa.string()),
            "channels": pa.array(mc_rows["channels"], pa.int32()),
            "bits": pa.array(mc_rows["bits"], pa.int32()),
            "sr": pa.array(mc_rows["sr"], pa.int32()),
            "n_samples": pa.array(mc_rows["n_samples"], pa.int32()),
            "caption": pa.array(mc_rows["caption"], pa.string())}),
        str(out / "media_audio_mc.parquet"))
    pq.write_table(pa.table({k: pa.array(v) for k, v in mc_exp.items()}),
                   str(out / "media_audio_mc_expected.parquet"))

    v_rows = {k: [] for k in ("media_id", "bytes", "kind", "fps",
                              "n_frames", "h", "w", "caption")}
    v_exp = {k: [] for k in ("media_id", "frame_idx", "h", "w", "px_sum",
                             "caption")}
    for i in range(n_video):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 43, i]))
        buf = rng.bytes(256)
        n_frames = 24 + int(rng.integers(48))
        h, w = 48, 64
        cap = "video clip %05d" % i
        v_rows["media_id"].append("vid%05d" % i)
        v_rows["bytes"].append(buf)
        v_rows["kind"].append("video")
        v_rows["fps"].append(24.0)
        v_rows["n_frames"].append(n_frames)
        v_rows["h"].append(h)
        v_rows["w"].append(w)
        v_rows["caption"].append(cap)
        for f in range(0, n_frames, VIDEO_EVERY):
            v_exp["media_id"].append("vid%05d" % i)
            v_exp["frame_idx"].append(f)
            v_exp["h"].append(VIDEO_OUT)
            v_exp["w"].append(VIDEO_OUT)
            v_exp["px_sum"].append(_video_frame_inline(buf, f, h, w))
            v_exp["caption"].append(cap)
    pq.write_table(
        pa.table({
            "media_id": pa.array(v_rows["media_id"], pa.string()),
            "bytes": pa.array(v_rows["bytes"], pa.binary()),
            "kind": pa.array(v_rows["kind"], pa.string()),
            "fps": pa.array(v_rows["fps"], pa.float32()),
            "n_frames": pa.array(v_rows["n_frames"], pa.int32()),
            "h": pa.array(v_rows["h"], pa.int32()),
            "w": pa.array(v_rows["w"], pa.int32()),
            "caption": pa.array(v_rows["caption"], pa.string())}),
        str(out / "media_video.parquet"))
    pq.write_table(pa.table({k: pa.array(v) for k, v in v_exp.items()}),
                   str(out / "media_video_expected.parquet"))
    # scene-structured videos for the cut detector: the sidecar runs the
    # DETECTOR's integer arithmetic inline (downsample lattice, abs-diff
    # sum, threshold) and generation asserts the detected cuts equal the
    # planted scene boundaries — non-vacuity proven at write time
    from ..stages.media import synthetic_scene_frame
    sc_rows = {k: [] for k in ("media_id", "bytes", "kind", "fps",
                               "n_frames", "h", "w", "caption")}
    sc_exp = {k: [] for k in ("media_id", "n_frames", "n_cuts",
                              "cut_head", "cut_sum", "caption")}
    ds_h = ds_w = 16
    thr_lim = 10 * ds_h * ds_w
    for i in range(n_video):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 53, i]))
        buf = rng.bytes(256)
        n_frames = 24 + int(rng.integers(48))
        h, w = 48, 64
        cap = "scene clip %05d" % i
        sc_rows["media_id"].append("scn%05d" % i)
        sc_rows["bytes"].append(buf)
        sc_rows["kind"].append("video")
        sc_rows["fps"].append(24.0)
        sc_rows["n_frames"].append(n_frames)
        sc_rows["h"].append(h)
        sc_rows["w"].append(w)
        sc_rows["caption"].append(cap)
        ys = (np.arange(ds_h) * h // ds_h)[:, None]
        xs = (np.arange(ds_w) * w // ds_w)[None, :]
        prev, cuts = None, []
        for f in range(n_frames):
            small = synthetic_scene_frame(buf, f, h, w)[ys, xs]\
                .astype(np.int64)
            if prev is not None and \
                    int(np.abs(small - prev).sum()) > thr_lim:
                cuts.append(f)
            prev = small
        scene_len = 6 + hashlib.blake2b(
            buf, digest_size=1, person=b"slen").digest()[0] % 7
        planted = [f for f in range(1, n_frames) if f % scene_len == 0]
        assert cuts == planted, ("scene-cut detector disagrees with "
                                 "planted boundaries", i, cuts, planted)
        sc_exp["media_id"].append("scn%05d" % i)
        sc_exp["n_frames"].append(n_frames)
        sc_exp["n_cuts"].append(len(cuts))
        sc_exp["cut_head"].append(cuts[0] if cuts else -1)
        sc_exp["cut_sum"].append(int(sum(cuts)))
        sc_exp["caption"].append(cap)
    pq.write_table(
        pa.table({
            "media_id": pa.array(sc_rows["media_id"], pa.string()),
            "bytes": pa.array(sc_rows["bytes"], pa.binary()),
            "kind": pa.array(sc_rows["kind"], pa.string()),
            "fps": pa.array(sc_rows["fps"], pa.float32()),
            "n_frames": pa.array(sc_rows["n_frames"], pa.int32()),
            "h": pa.array(sc_rows["h"], pa.int32()),
            "w": pa.array(sc_rows["w"], pa.int32()),
            "caption": pa.array(sc_rows["caption"], pa.string())}),
        str(out / "media_video_scenes.parquet"))
    pq.write_table(pa.table({k: pa.array(v) for k, v in sc_exp.items()}),
                   str(out / "media_video_cuts_expected.parquet"))
    done.write_text(stamp)
    return str(out)


def ensure_media(sf_dir, seed=7):
    """Media tables + expected sidecars for a testdata sf dir (cached in
    the same corpus dir as the images)."""
    sf = sf_of_dir(sf_dir)
    out_dir = corpus_dir_for(sf_dir)
    return generate_media(out_dir, n_images_for_sf(sf), seed=seed)


def ensure_skewed_corpus(sf_dir, seed=7, hot_frac=0.5):
    """Skewed-variant corpus dir for a testdata sf dir (cached)."""
    sf = sf_of_dir(sf_dir)
    out_dir = corpus_dir_for(sf_dir) + "-skew"
    return generate_skewed_corpus(out_dir, n_images_for_sf(sf),
                                  seed=seed, hot_frac=hot_frac)


def ensure_corpus(sf_dir, seed=7):
    """Map a testdata sf dir to its synthetic corpus dir, generating it on
    first use (cached under /tmp/ray_unmix_data/<sfname>)."""
    sf = sf_of_dir(sf_dir)
    out_dir = corpus_dir_for(sf_dir)
    return generate_corpus(out_dir, n_images_for_sf(sf), seed=seed)


def images_table(corpus_dir, columns=None):
    """Driver-side read of the (sharded) images table as one pa.Table."""
    import pyarrow.dataset as pads
    d = pathlib.Path(corpus_dir)
    src = d / "images" if (d / "images").is_dir() else d / "images.parquet"
    return pads.dataset(str(src), format="parquet").to_table(
        columns=columns)


FOCAL_VERSION = 1


def generate_focal_expected(sf_dir, radius=1, scale=1000):
    """Write the ``focal_expected.parquet`` sidecar: per-(tile, band)
    sums of the radius-``radius`` focal mean over every corpus image,
    computed FULL-IMAGE with an independent shift-sum formulation (the
    engine computes the same quantity tile-wise via halo exchange +
    integral images — stages/focal.py — so a match proves the halo
    plumbing, not just the kernel). Values are exact int64:
    floor(window_sum * scale / window_count) summed per tile band.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_FOCAL_DONE"
    stamp = "focal v%d r%d s%d" % (FOCAL_VERSION, radius, scale)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    r = radius
    rows = {"tile_id": [], "band": [], "focal_sum_u": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        p, H, W = arr.shape
        acc = np.zeros((p, H, W), dtype=np.int64)
        cnt = np.zeros((H, W), dtype=np.int64)
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                dst_r = slice(max(0, -di), H - max(0, di))
                src_r = slice(max(0, di), H - max(0, -di))
                dst_c = slice(max(0, -dj), W - max(0, dj))
                src_c = slice(max(0, dj), W - max(0, -dj))
                acc[:, dst_r, dst_c] += arr[:, src_r, src_c]
                cnt[dst_r, dst_c] += 1
        focal = (acc * np.int64(scale)) // cnt[None, :, :]
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = focal[:, ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                s = blk.sum(axis=(1, 2))
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * p)
                rows["band"].extend(range(p))
                rows["focal_sum_u"].extend(int(v) for v in s)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "focal_sum_u": pa.array(rows["focal_sum_u"], pa.int64())})
    pq.write_table(t, str(out / "focal_expected.parquet"))
    done.write_text(stamp)
    return str(out)


CONV_VERSION = 1

# 5x5 binomial (Gaussian-approximating) kernel — the convolution
# query's spec, replicated inline on the engine side (__ray_entry__)
_CONV_K1D = np.array([1, 4, 6, 4, 1], dtype=np.int64)


def generate_conv_expected(sf_dir):
    """Write the ``conv_expected.parquet`` sidecar: per-(tile, band)
    response sums of the 5x5 binomial kernel over every corpus image,
    computed FULL-IMAGE with an independent shift-sum formulation (the
    engine runs the same kernel tile-wise via a radius-2 halo exchange,
    stages/focal.py:convolve_tiles, so a match proves the 2-deep halo
    plumbing). Border rule replicated: pixels whose full 5x5 window
    leaves the image contribute 0 and are excluded from ``n_valid``.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_CONV_DONE"
    stamp = "conv v%d" % CONV_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    kernel = np.outer(_CONV_K1D, _CONV_K1D)
    r = kernel.shape[0] // 2
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "band": [], "conv_sum": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        a = arr.astype(np.int64)
        p, H, W = a.shape
        acc = np.zeros((p, H, W), dtype=np.int64)
        for di in range(-r, r + 1):
            for dj in range(-r, r + 1):
                dst_r = slice(max(0, -di), H - max(0, di))
                src_r = slice(max(0, di), H - max(0, -di))
                dst_c = slice(max(0, -dj), W - max(0, dj))
                src_c = slice(max(0, dj), W - max(0, -dj))
                acc[:, dst_r, dst_c] += (kernel[di + r, dj + r]
                                         * a[:, src_r, src_c])
        ok = np.zeros((H, W), dtype=np.int64)
        ok[r:H - r, r:W - r] = 1
        acc *= ok[None, :, :]
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = acc[:, ty * TILE:(ty + 1) * TILE,
                          tx * TILE:(tx + 1) * TILE]
                nv = int(ok[ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE].sum())
                s = blk.sum(axis=(1, 2))
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * p)
                rows["band"].extend(range(p))
                rows["conv_sum"].extend(int(v) for v in s)
                rows["n_valid"].extend([nv] * p)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "conv_sum": pa.array(rows["conv_sum"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "conv_expected.parquet"))
    done.write_text(stamp)
    return str(out)


GLCM_VERSION = 1


def generate_glcm_expected(sf_dir, levels=16, vmax=9999, dy=0, dx=1,
                           band=0):
    """Write the ``glcm_expected.parquet`` sidecar: the per-image
    gray-level co-occurrence matrix (la, lb, n) for displacement
    (dy, dx) over quantized band ``band``, computed FULL-IMAGE with a
    direct shifted-pair formulation. The engine computes the same
    counts tile-wise with anchor-in-tile partitioning plus a directed
    leading-edge halo (stages/texture.py), so a match proves the
    border-pair plumbing, not just the quantizer. NODATA pixels drop
    out of every pair; level = clip(v,0,vmax)·levels // (vmax+1).
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..constants import NODATA as ND

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_GLCM_DONE"
    stamp = "glcm v%d l%d m%d d%d,%d b%d" % (
        GLCM_VERSION, levels, vmax, dy, dx, band)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "la": [], "lb": [], "n": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())[band]
        if dy:
            a, b = arr[:-1, :].ravel(), arr[1:, :].ravel()
        else:
            a, b = arr[:, :-1].ravel(), arr[:, 1:].ravel()
        ok = (a != ND) & (b != ND)

        def q(v):
            c = np.clip(v.astype(np.int64), 0, vmax)
            return (c * np.int64(levels)) // np.int64(vmax + 1)

        code = q(a[ok]) * np.int64(levels) + q(b[ok])
        cnt = np.bincount(code, minlength=levels * levels)
        nz = np.flatnonzero(cnt)
        rows["image_id"].extend([img] * len(nz))
        rows["la"].extend(int(v) for v in nz // levels)
        rows["lb"].extend(int(v) for v in nz % levels)
        rows["n"].extend(int(v) for v in cnt[nz])
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "la": pa.array(rows["la"], pa.int64()),
        "lb": pa.array(rows["lb"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64())})
    pq.write_table(t, str(out / "glcm_expected.parquet"))
    done.write_text(stamp)
    return str(out)


PYRAMID_VERSION = 1


def generate_pyramid_expected(sf_dir, factor=2):
    """Write the ``pyramid_expected.parquet`` sidecar: per-(parent
    tile, band) sums of the level-1 overview (floor block mean by
    ``factor``) computed FULL-IMAGE (downsample the whole raster, then
    tile the downsampled image by TILE). The engine builds the same
    overview tile-wise via the decimate → groupby reduction tree
    (stages/pyramid.py), so a hash match proves the cross-tile assembly
    plumbing, not just the block-mean kernel.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_PYRAMID_DONE"
    stamp = "pyramid v%d f%d" % (PYRAMID_VERSION, factor)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    f = int(factor)
    rows = {"ov_id": [], "band": [], "ov_sum_u": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        p, H, W = arr.shape
        assert H % f == 0 and W % f == 0
        dsamp = arr.astype(np.int64).reshape(
            (p, H // f, f, W // f, f)).sum(axis=(2, 4)) // (f * f)
        Hd, Wd = H // f, W // f
        n_ty = (Hd + TILE - 1) // TILE
        n_tx = (Wd + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = dsamp[:, ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                s = blk.sum(axis=(1, 2))
                oid = "%s_o%d_%d" % (img, ty, tx)
                rows["ov_id"].extend([oid] * p)
                rows["band"].extend(range(p))
                rows["ov_sum_u"].extend(int(v) for v in s)
    t = pa.table({
        "ov_id": pa.array(rows["ov_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "ov_sum_u": pa.array(rows["ov_sum_u"], pa.int64())})
    pq.write_table(t, str(out / "pyramid_expected.parquet"))
    done.write_text(stamp)
    return str(out)


TERRAIN_VERSION = 1


def generate_terrain_expected(sf_dir):
    """Write the ``terrain_expected.parquet`` sidecar: per-tile sums of
    the Horn (1981) gradient numerators over band 0 of every corpus
    image, computed FULL-IMAGE with plain shifts (the engine computes
    the same quantity tile-wise via the halo exchange —
    stages/terrain.py — so a match proves the cross-tile plumbing).
    Border rule: pixels whose 3x3 neighborhood leaves the image get 0
    (and do not count in n_valid). All values exact int64.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_TERRAIN_DONE"
    stamp = "terrain v%d" % TERRAIN_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "sum_abs_dzdx": [], "sum_abs_dzdy": [],
            "sum_rugged": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[0].astype(np.int64)
        H, W = z.shape
        dzdx = np.zeros((H, W), np.int64)
        dzdy = np.zeros((H, W), np.int64)
        ii = slice(1, H - 1)
        jj = slice(1, W - 1)

        def sh(dr, dc):
            return z[1 + dr:H - 1 + dr, 1 + dc:W - 1 + dc]

        dzdx[ii, jj] = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
                        - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)))
        dzdy[ii, jj] = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
                        - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)))
        ok = np.zeros((H, W), np.int64)
        ok[ii, jj] = 1
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                rs = slice(ty * TILE, (ty + 1) * TILE)
                cs = slice(tx * TILE, (tx + 1) * TILE)
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["sum_abs_dzdx"].append(int(np.abs(dzdx[rs, cs]).sum()))
                rows["sum_abs_dzdy"].append(int(np.abs(dzdy[rs, cs]).sum()))
                rows["sum_rugged"].append(
                    int((dzdx[rs, cs] ** 2 + dzdy[rs, cs] ** 2).sum()))
                rows["n_valid"].append(int(ok[rs, cs].sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "sum_abs_dzdx": pa.array(rows["sum_abs_dzdx"], pa.int64()),
        "sum_abs_dzdy": pa.array(rows["sum_abs_dzdy"], pa.int64()),
        "sum_rugged": pa.array(rows["sum_rugged"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "terrain_expected.parquet"))
    done.write_text(stamp)
    return str(out)


WARP_VERSION = 1


def generate_warp_expected(sf_dir, num=5, den=4):
    """Write the ``warp_expected.parquet`` sidecar: per-(tile, band)
    sums of the num/den bilinear upsample of every corpus image,
    computed FULL-IMAGE with integer fixed-point arithmetic (the
    engine warps tile-wise via the halo exchange — stages/warp.py — so
    a match proves the cross-tile interpolation plumbing). Border rule:
    edge replication (clamp). Output pixel = floor(V / D^2) with
    D = 2*num, exactly as the engine computes it.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_WARP_DONE"
    stamp = "warp v%d %d/%d" % (WARP_VERSION, num, den)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    D = 2 * num
    t_out = TILE * num // den
    rows = {"tile_id": [], "band": [], "warp_sum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())\
            .astype(np.int64)
        p, H, W = arr.shape

        def axis(n_in):
            n_out = n_in * num // den
            dst = np.arange(n_out, dtype=np.int64)
            src_num = (2 * dst + 1) * den - num
            i0 = src_num // D
            frac = src_num - i0 * D
            i1 = np.clip(i0 + 1, 0, n_in - 1)
            i0 = np.clip(i0, 0, n_in - 1)
            return i0, i1, D - frac, frac

        r0, r1, wy0, wy1 = axis(H)
        c0, c1, wx0, wx1 = axis(W)
        v00 = arr[:, r0[:, None], c0[None, :]]
        v01 = arr[:, r0[:, None], c1[None, :]]
        v10 = arr[:, r1[:, None], c0[None, :]]
        v11 = arr[:, r1[:, None], c1[None, :]]
        V = (wy0[:, None] * (wx0[None, :] * v00 + wx1[None, :] * v01)
             + wy1[:, None] * (wx0[None, :] * v10 + wx1[None, :] * v11))
        warped = V // (D * D)
        Ho, Wo = warped.shape[1:]
        n_ty = (Ho + t_out - 1) // t_out
        n_tx = (Wo + t_out - 1) // t_out
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = warped[:, ty * t_out:(ty + 1) * t_out,
                             tx * t_out:(tx + 1) * t_out]
                s = blk.sum(axis=(1, 2))
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * p)
                rows["band"].extend(range(p))
                rows["warp_sum"].extend(int(v) for v in s)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "warp_sum": pa.array(rows["warp_sum"], pa.int64())})
    pq.write_table(t, str(out / "warp_expected.parquet"))
    done.write_text(stamp)
    return str(out)


HILLSHADE_VERSION = 1


def generate_hillshade_expected(sf_dir, azimuth=315.0, altitude=45.0):
    """Write the ``hillshade_expected.parquet`` sidecar: per-tile sums
    of the Horn hillshade (1/255 integer units) over band 0 of every
    corpus image, computed FULL-IMAGE with plain shifts (the engine
    shades tile-wise via the halo exchange — stages/terrain.py
    hillshade_tiles — so a match proves the cross-tile plumbing).

    DETERMINISM: the float64 elementwise sequence below replicates
    stages/terrain.py:hillshade_u exactly (identical expressions on
    identical int64 numerators are bit-identical), so the per-pixel
    floor and the per-tile integer sums are hash-exact. Keep both
    sides in lockstep when editing.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_HILLSHADE_DONE"
    stamp = "hillshade v%d az%.1f alt%.1f" % (HILLSHADE_VERSION,
                                              azimuth, altitude)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "sum_hs_u": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[0].astype(np.int64)
        H, W = z.shape
        dzdx = np.zeros((H, W), np.int64)
        dzdy = np.zeros((H, W), np.int64)
        ii = slice(1, H - 1)
        jj = slice(1, W - 1)

        def sh(dr, dc):
            return z[1 + dr:H - 1 + dr, 1 + dc:W - 1 + dc]

        dzdx[ii, jj] = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
                        - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)))
        dzdy[ii, jj] = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
                        - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)))
        ok = np.zeros((H, W), np.int64)
        ok[ii, jj] = 1
        # lockstep replica of stages/terrain.py:hillshade_u
        dx = dzdx / (8.0 * PX)
        dy = dzdy / (8.0 * PX)
        slope = np.arctan(np.hypot(dx, dy))
        aspect = np.arctan2(dy, -dx)
        az = np.deg2rad(360.0 - azimuth + 90.0)
        alt = np.deg2rad(altitude)
        hs = (np.sin(alt) * np.cos(slope)
              + np.cos(alt) * np.sin(slope) * np.cos(az - aspect))
        hs_u = np.floor(np.maximum(hs, 0.0) * 255.0).astype(np.int64) * ok
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                rs = slice(ty * TILE, (ty + 1) * TILE)
                cs = slice(tx * TILE, (tx + 1) * TILE)
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["sum_hs_u"].append(int(hs_u[rs, cs].sum()))
                rows["n_valid"].append(int(ok[rs, cs].sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "sum_hs_u": pa.array(rows["sum_hs_u"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "hillshade_expected.parquet"))
    done.write_text(stamp)
    return str(out)


COMPONENTS_VERSION = 1


def generate_components_expected(sf_dir, threshold=1300):
    """Write the ``components_expected.parquet`` sidecar: per-image
    4-connected-component statistics of the mask ``band 0 >
    threshold``, computed FULL-IMAGE with an independent union-find
    (the engine labels tile-wise and merges across borders via the
    halo exchange + distributed connected components —
    stages/label.py — so a match proves that whole chain). Images with
    zero masked pixels are omitted (they produce no engine rows)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_COMPONENTS_DONE"
    stamp = "components v%d t%d" % (COMPONENTS_VERSION, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "n_components": [], "n_masked": [],
            "max_size": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        mask = arr[0] > threshold
        if not mask.any():
            continue
        H, W = mask.shape
        parent = np.arange(H * W, dtype=np.int64)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        flat = mask.ravel()
        hm = mask[:, :-1] & mask[:, 1:]
        vm = mask[:-1, :] & mask[1:, :]
        idx = np.arange(H * W).reshape(H, W)
        for a, b in zip(idx[:, :-1][hm], idx[:, 1:][hm]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for a, b in zip(idx[:-1, :][vm], idx[1:, :][vm]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(x) for x in np.flatnonzero(flat)])
        _, counts = np.unique(roots, return_counts=True)
        rows["image_id"].append(img)
        rows["n_components"].append(len(counts))
        rows["n_masked"].append(int(counts.sum()))
        rows["max_size"].append(int(counts.max()))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "n_components": pa.array(rows["n_components"], pa.int64()),
        "n_masked": pa.array(rows["n_masked"], pa.int64()),
        "max_size": pa.array(rows["max_size"], pa.int64())})
    pq.write_table(t, str(out / "components_expected.parquet"))
    done.write_text(stamp)
    return str(out)


INTERSECT_VERSION = 2


def generate_intersect_expected(sf_dir):
    """Write ``intersect_expected.parquet``: per-tile band-0 sum/count
    of a 2x-coarser source raster resampled back onto the reference
    tile grid — the oracle for Q:intersect_resample (the engine runs
    the generic co-grouped ``align.intersect_tiles`` gt-arithmetic
    resampler; this sidecar replays the CLOSED FORM of the same
    geometry, derived independently from the grid definition).

    Geometry (per tile, local coords): the source is the tile's pixels
    at rows/cols 0, 2, ... < h-2 / w-2 (same origin, 2x pixel size), so
    a ref pixel (y, x) samples source cell (y//2, x//2) — valid while
    y//2 < ceil((h-2)/2) and x//2 < ceil((w-2)/2), NODATA beyond (the
    clip/pad branch). Tiles with h <= 2 or w <= 2 have an empty source
    and are dropped (the intersection). Integer-exact: values are int16
    carried through float32, summed as int64.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_INTERSECT_DONE"
    stamp = "intersect v%d" % INTERSECT_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "b0_sum": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        H, W = arr.shape[1:]
        for ty in range(-(-H // TILE)):
            for tx in range(-(-W // TILE)):
                r0, c0 = ty * TILE, tx * TILE
                h = min(TILE, H - r0)
                w = min(TILE, W - c0)
                if h <= 2 or w <= 2:
                    continue          # empty source -> dropped
                t0 = arr[0, r0:r0 + h, c0:c0 + w].astype(np.int64)
                ch = (h - 1) // 2     # ceil((h-2)/2)
                cw = (w - 1) // 2
                ys = np.arange(h) // 2
                xs = np.arange(w) // 2
                vy = ys < ch
                vx = xs < cw
                sub = t0[np.ix_(2 * ys[vy], 2 * xs[vx])]
                # same rule as the query summary: NODATA-valued source
                # pixels (the corpus plants them) don't count as valid
                ok = sub != NODATA
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["b0_sum"].append(int(sub[ok].sum()))
                rows["n_valid"].append(int(ok.sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "b0_sum": pa.array(rows["b0_sum"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "intersect_expected.parquet"))
    done.write_text(stamp)
    return str(out)


DISTANCE_VERSION = 1


def generate_distance_expected(sf_dir, radius=4):
    """Write the ``distance_expected.parquet`` sidecar: per-tile sums of
    the saturated Chebyshev distance-to-NODATA transform over band 0 of
    every corpus image, computed FULL-IMAGE with an INDEPENDENT
    box-dilation formulation: ``within_k`` = shift-OR dilation of the
    obstacle set by a (2k+1)-box, and
    ``dist = sum_{k=0..radius} (NOT within_k)`` = min(d, radius + 1).
    The engine computes the same quantity tile-wise via radius-deep halo
    exchange + chamfer iteration (stages/morphology.py), so a match
    proves the halo plumbing AND the saturation contract, not just the
    kernel. Border rule: pixels outside the image are not obstacles
    (the dilation never reads past the edge).
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_DISTANCE_DONE"
    stamp = "distance v%d r%d" % (DISTANCE_VERSION, radius)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "sum_dist": [], "n_cap": [], "n_px": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        obstacle = arr[0] == NODATA
        H, W = obstacle.shape
        # dilation ladder: after k grow steps, ``within`` = pixels at
        # Chebyshev distance <= k; summing NOT-within over k=0..radius
        # yields min(d, radius + 1) without any chamfer recursion
        dist = np.full((H, W), np.int64(0))
        within = obstacle.copy()
        for _ in range(radius + 1):
            dist += (~within).astype(np.int64)
            grown = within.copy()
            # 3x3 OR-dilation via clipped shifts (edges stay inside)
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    dst_r = slice(max(0, -di), H - max(0, di))
                    src_r = slice(max(0, di), H - max(0, -di))
                    dst_c = slice(max(0, -dj), W - max(0, dj))
                    src_c = slice(max(0, dj), W - max(0, -dj))
                    grown[dst_r, dst_c] |= within[src_r, src_c]
            within = grown
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                rs = slice(ty * TILE, (ty + 1) * TILE)
                cs = slice(tx * TILE, (tx + 1) * TILE)
                blk = dist[rs, cs]
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["sum_dist"].append(int(blk.sum()))
                rows["n_cap"].append(int((blk == radius + 1).sum()))
                rows["n_px"].append(int(blk.size))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "sum_dist": pa.array(rows["sum_dist"], pa.int64()),
        "n_cap": pa.array(rows["n_cap"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64())})
    pq.write_table(t, str(out / "distance_expected.parquet"))
    done.write_text(stamp)
    return str(out)


AUGMENT_VERSION = 1


def generate_augment_expected(sf_dir, crop=24):
    """Write the ``augment_expected.parquet`` sidecar: per-image
    deterministic flip/crop parameters and the position-weighted int64
    checksum of the augmented array, replayed single-machine with
    EXPLICIT coordinate mapping (aug[b,y,x] = arr[b, fv?H-1-(oy+y):oy+y,
    fh?W-1-(ox+x):ox+x]) and Python-int accumulation — independent of
    the engine's view-slicing implementation (stages/augment.py), so a
    match pins flip order (flip THEN crop), crop origin and layout."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_AUGMENT_DONE"
    stamp = "augment v%d crop%d" % (AUGMENT_VERSION, crop)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "caption"])
    rows = {"image_id": [], "flip_h": [], "flip_v": [], "oy": [],
            "ox": [], "n_px": [], "aug_checksum": [], "caption": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        p, H, W = arr.shape
        d = hashlib.md5(img.encode()).digest()
        fh = d[0] & 1
        fv = (d[0] >> 1) & 1
        oy = int.from_bytes(d[1:5], "little") % max(1, H - crop + 1)
        ox = int.from_bytes(d[5:9], "little") % max(1, W - crop + 1)
        csum = 0
        k = 0
        for b in range(p):
            for y in range(crop):
                sy = H - 1 - (oy + y) if fv else oy + y
                for x in range(crop):
                    sx = W - 1 - (ox + x) if fh else ox + x
                    csum += int(arr[b, sy, sx]) * (k % 251 + 1)
                    k += 1
        rows["image_id"].append(img)
        rows["flip_h"].append(int(fh))
        rows["flip_v"].append(int(fv))
        rows["oy"].append(int(oy))
        rows["ox"].append(int(ox))
        rows["n_px"].append(int(p * crop * crop))
        rows["aug_checksum"].append(csum)
        rows["caption"].append(tbl["caption"][i].as_py())
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "flip_h": pa.array(rows["flip_h"], pa.int64()),
        "flip_v": pa.array(rows["flip_v"], pa.int64()),
        "oy": pa.array(rows["oy"], pa.int64()),
        "ox": pa.array(rows["ox"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "aug_checksum": pa.array(rows["aug_checksum"], pa.int64()),
        "caption": pa.array(rows["caption"], pa.string())})
    pq.write_table(t, str(out / "augment_expected.parquet"))
    done.write_text(stamp)
    return str(out)


EQUALIZE_VERSION = 1


def generate_equalize_expected(sf_dir, bins=256, lo=0, hi=10000,
                               levels=256):
    """Write the ``equalize_expected.parquet`` sidecar: per-(tile, band)
    sums of the CORPUS-GLOBAL histogram-equalized pixels, computed in
    one single-machine pass (accumulate the global per-band histogram
    over every image, build the cdf-min LUT with exact integer floor
    division, remap, tile, sum). The engine computes the same quantity
    as a distributed two-pass (per-batch nonzero histogram partials →
    groupby merge → broadcast LUT — stages/enhance.py), so a match
    proves the distributed global-statistics plumbing. NODATA pixels
    are excluded from the histogram and from n_valid.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_EQUALIZE_DONE"
    stamp = "equalize v%d b%d lo%d hi%d L%d" % (
        EQUALIZE_VERSION, bins, lo, hi, levels)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])

    def bin_of(vals):
        v = np.clip(vals, lo, hi).astype(np.int64)
        return (v - lo) * bins // (hi - lo + 1)

    arrays = []
    hist = None
    for i in range(tbl.num_rows):
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        arrays.append(arr)
        if hist is None:
            hist = np.zeros((arr.shape[0], bins), dtype=np.int64)
        for b in range(arr.shape[0]):
            row = arr[b].ravel()
            row = row[row != NODATA]
            hist[b] += np.bincount(bin_of(row), minlength=bins)
    lut = np.zeros_like(hist)
    for b in range(hist.shape[0]):
        cdf = np.cumsum(hist[b])
        total = int(cdf[-1])
        nz = np.flatnonzero(hist[b])
        if not len(nz):
            continue
        cdf_min = int(cdf[nz[0]])
        denom = total - cdf_min
        if denom <= 0:
            continue
        lut[b] = (cdf - cdf_min) * (levels - 1) // denom
        lut[b, :nz[0]] = 0
    rows = {"tile_id": [], "band": [], "eq_sum": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = arrays[i]
        p, H, W = arr.shape
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = arr[:, ty * TILE:(ty + 1) * TILE,
                          tx * TILE:(tx + 1) * TILE]
                for b in range(p):
                    row = blk[b].ravel()
                    valid = row != NODATA
                    eq = lut[b][bin_of(row[valid])]
                    rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                    rows["band"].append(b)
                    rows["eq_sum"].append(int(eq.sum()))
                    rows["n_valid"].append(int(valid.sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "eq_sum": pa.array(rows["eq_sum"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "equalize_expected.parquet"))
    done.write_text(stamp)
    return str(out)


MATCH_VERSION = 1


def generate_match_expected(sf_dir, bins=256, lo=0, hi=10000):
    """Write ``match_expected.parquet``: per-(tile, band) sums of each
    image's pixels histogram-MATCHED to the corpus-global distribution
    (inclusive image-CDF rank mapped by exact integer
    cross-multiplication — the single-machine replay of
    stages/enhance.py:match_histogram_tiles). NODATA excluded from both
    histograms and from n_valid."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_MATCH_DONE"
    stamp = "match v%d b%d lo%d hi%d" % (MATCH_VERSION, bins, lo, hi)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])

    def bin_of(vals):
        v = np.clip(vals, lo, hi).astype(np.int64)
        return (v - lo) * bins // (hi - lo + 1)

    arrays = []
    ghist = None
    for i in range(tbl.num_rows):
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        arrays.append(arr)
        if ghist is None:
            ghist = np.zeros((arr.shape[0], bins), dtype=np.int64)
        for b in range(arr.shape[0]):
            row = arr[b].ravel()
            row = row[row != NODATA]
            ghist[b] += np.bincount(bin_of(row), minlength=bins)
    gcdf = np.cumsum(ghist, axis=1)
    n_g = gcdf[:, -1]
    rows = {"tile_id": [], "band": [], "match_sum": [], "n_valid": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = arrays[i]
        p, H, W = arr.shape
        ihist = np.zeros((p, bins), dtype=np.int64)
        for b in range(p):
            row = arr[b].ravel()
            row = row[row != NODATA]
            ihist[b] = np.bincount(bin_of(row), minlength=bins)
        icdf = np.cumsum(ihist, axis=1)
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = arr[:, ty * TILE:(ty + 1) * TILE,
                          tx * TILE:(tx + 1) * TILE]
                for b in range(p):
                    row = blk[b].ravel()
                    valid = row != NODATA
                    n_img = int(icdf[b, -1])
                    if n_img and valid.any():
                        cv = icdf[b][bin_of(row[valid])]
                        j = np.searchsorted(gcdf[b] * n_img,
                                            cv * int(n_g[b]),
                                            side="left")
                        ms = int(j.sum())
                    else:
                        ms = 0
                    rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                    rows["band"].append(b)
                    rows["match_sum"].append(ms)
                    rows["n_valid"].append(int(valid.sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "match_sum": pa.array(rows["match_sum"], pa.int64()),
        "n_valid": pa.array(rows["n_valid"], pa.int64())})
    pq.write_table(t, str(out / "match_expected.parquet"))
    done.write_text(stamp)
    return str(out)


TREND_VERSION = 1


def generate_trend_expected(sf_dir):
    """Write the ``trend_expected.parquet`` sidecar into the SKEWED
    corpus dir: per tile position (cell_ix, cell_iy, row_off, col_off),
    the exact int64 rational least-squares slope of band-0 tile sum vs
    image sequence number, accumulated single-machine with Python ints
    (the engine computes the same quantity as a distributed
    associative-partials reduce — stages/trend.py — so a match proves
    the combiner/groupby plumbing over the planted ~n/2-deep hot
    stack). Cell ids replayed with the same closed-form lattice
    arithmetic as skew_tiles_expected.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir) + "-skew")
    done = out / "_TREND_DONE"
    stamp = "trend v%d" % TREND_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "gt"])
    acc = {}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        t = int(img[3:])
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        gt = tbl["gt"][i].as_py()
        H, W = arr.shape[1], arr.shape[2]
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                k = (int(cx // edge), int(cy // edge),
                     ty * TILE, tx * TILE)
                y = int(arr[0, ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                        .astype(np.int64).sum())
                a = acc.setdefault(k, [0, 0, 0, 0, 0])
                a[0] += 1
                a[1] += t
                a[2] += t * t
                a[3] += y
                a[4] += t * y
    rows = {k: [] for k in ("cell_ix", "cell_iy", "row_off", "col_off",
                            "n_dates", "trend_num", "trend_den")}
    for (ix, iy, ro, co), (n, st, st2, sy, sty) in acc.items():
        rows["cell_ix"].append(ix)
        rows["cell_iy"].append(iy)
        rows["row_off"].append(ro)
        rows["col_off"].append(co)
        rows["n_dates"].append(n)
        rows["trend_num"].append(n * sty - st * sy)
        rows["trend_den"].append(n * st2 - st * st)
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    pq.write_table(t, str(out / "trend_expected.parquet"))
    done.write_text(stamp)
    return str(out)


CHANGE_VERSION = 2


def generate_change_expected(sf_dir):
    """Write the ``change_expected.parquet`` sidecar into the SKEWED
    corpus dir: per tile position, exact int64 bi-temporal mean delta
    (late epoch t >= n_images//2 minus early epoch) of band-0 tile sum,
    accumulated single-machine with Python ints (the engine computes
    the same quantity as a distributed associative-partials reduce —
    stages/trend.py:epoch_change)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir) + "-skew")
    done = out / "_CHANGE_DONE"
    stamp = "change v%d" % CHANGE_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "gt"])
    max_t = max(int(tbl["image_id"][i].as_py()[3:])
                for i in range(tbl.num_rows))
    # quarter split: the skewed corpus's hot stack is seq < n/2, so a
    # midpoint split would leave the hot position single-epoch; n/4
    # straddles the stack (n/4 early + n/4 late hot observations).
    t_split = (max_t + 1) // 4
    acc = {}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        t = int(img[3:])
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        gt = tbl["gt"][i].as_py()
        H, W = arr.shape[1], arr.shape[2]
        late = t >= t_split
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                k = (int(cx // edge), int(cy // edge),
                     ty * TILE, tx * TILE)
                y = int(arr[0, ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                        .astype(np.int64).sum())
                a = acc.setdefault(k, [0, 0, 0, 0])
                if late:
                    a[1] += 1
                    a[3] += y
                else:
                    a[0] += 1
                    a[2] += y
    rows = {k: [] for k in ("cell_ix", "cell_iy", "row_off", "col_off",
                            "n_early", "n_late", "delta_num",
                            "delta_den")}
    for (ix, iy, ro, co), (ne, nl, se, sl) in acc.items():
        rows["cell_ix"].append(ix)
        rows["cell_iy"].append(iy)
        rows["row_off"].append(ro)
        rows["col_off"].append(co)
        rows["n_early"].append(ne)
        rows["n_late"].append(nl)
        rows["delta_num"].append(sl * ne - se * nl)
        rows["delta_den"].append(nl * ne)
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    pq.write_table(t, str(out / "change_expected.parquet"))
    done.write_text(stamp)
    return str(out)


COMPRESS_VERSION = 1


def generate_compression_expected(sf_dir, level=6):
    """Write ``compression_expected.parquet`` into the corpus dir:
    per-doc UTF-8 and ``zlib.compress(..., level)`` byte counts over
    documents.parquet, replayed single-machine (zlib at a fixed level
    is deterministic). The oracle SQL recomputes ratio and verdict
    from these raw facts — only the deflate byte count itself is
    replayed."""
    import zlib

    import pyarrow.dataset as pads

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_COMPRESS_DONE"
    stamp = "compress v%d l%d" % (COMPRESS_VERSION, level)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    docs_path = os.path.join(str(sf_dir), "documents.parquet")
    tbl = pads.dataset(docs_path, format="parquet").to_table(
        columns=["doc_id", "text"])
    ids = [int(i) for i in tbl["doc_id"].to_pylist()]
    raws, comps = [], []
    for s in tbl["text"].to_pylist():
        b = s.encode("utf-8")
        raws.append(len(b))
        comps.append(len(zlib.compress(b, level)))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_raw": pa.array(raws, pa.int64()),
        "n_comp": pa.array(comps, pa.int64())}),
        str(out / "compression_expected.parquet"))
    done.write_text(stamp)
    return str(out)


CUBE_VERSION = 1


def generate_cube_expected(sf_dir, n_bins=6):
    """Write the ``cube_expected.parquet`` sidecar into the SKEWED
    corpus dir: single-machine Python-int replay of the dense
    gap-filled composite cube (stages/trend.py:composite_cube) — per
    tile position and time bin, observation count, exact band-0 tile
    sum, and the forward-fill source bin/count/sum."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir) + "-skew")
    done = out / "_CUBE_DONE"
    stamp = "cube v%d b%d" % (CUBE_VERSION, n_bins)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "gt"])
    t_count = max(int(tbl["image_id"][i].as_py()[3:])
                  for i in range(tbl.num_rows)) + 1
    acc = {}
    for i in range(tbl.num_rows):
        t = int(tbl["image_id"][i].as_py()[3:])
        b = t * n_bins // t_count
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        gt = tbl["gt"][i].as_py()
        H, W = arr.shape[1], arr.shape[2]
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                k = (int(cx // edge), int(cy // edge),
                     ty * TILE, tx * TILE)
                y = int(arr[0, ty * TILE:(ty + 1) * TILE,
                            tx * TILE:(tx + 1) * TILE]
                        .astype(np.int64).sum())
                a = acc.setdefault(k, {})
                nb_s = a.get(b)
                if nb_s is None:
                    a[b] = [1, y]
                else:
                    nb_s[0] += 1
                    nb_s[1] += y
    rows = {k: [] for k in ("cell_ix", "cell_iy", "row_off", "col_off",
                            "bin", "n_obs", "sum_b0", "fill_bin",
                            "fill_n", "fill_sum")}
    for (ix, iy, ro, co), per_bin in acc.items():
        last = -1
        for b in range(n_bins):
            n, s = per_bin.get(b, (0, 0))
            if n > 0:
                last = b
            fn, fs = per_bin.get(last, (0, 0)) if last >= 0 else (0, 0)
            rows["cell_ix"].append(ix)
            rows["cell_iy"].append(iy)
            rows["row_off"].append(ro)
            rows["col_off"].append(co)
            rows["bin"].append(b)
            rows["n_obs"].append(n)
            rows["sum_b0"].append(s)
            rows["fill_bin"].append(last)
            rows["fill_n"].append(fn)
            rows["fill_sum"].append(fs)
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    pq.write_table(t, str(out / "cube_expected.parquet"))
    done.write_text(stamp)
    return str(out)


LATEST_VERSION = 1


def generate_latest_expected(sf_dir, valid_max=2600):
    """Write the ``latest_expected.parquet`` sidecar into the SKEWED
    corpus dir: per tile position, summaries of the last-valid-
    observation composite (per pixel, band-0 value of the most recent
    image whose value <= valid_max), accumulated single-machine in
    image-sequence order (the engine computes the same quantity as a
    distributed payload-carrying argmax reduce — stages/trend.py:
    composite_latest — so a match proves the pair-merge plumbing over
    the planted hot stack)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir) + "-skew")
    done = out / "_LATEST_DONE"
    stamp = "latest v%d vm%d" % (LATEST_VERSION, valid_max)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "gt"])
    acc = {}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        t = int(img[3:])
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        gt = tbl["gt"][i].as_py()
        H, W = arr.shape[1], arr.shape[2]
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                k = (int(cx // edge), int(cy // edge),
                     ty * TILE, tx * TILE)
                b0 = arr[0, ty * TILE:(ty + 1) * TILE,
                         tx * TILE:(tx + 1) * TILE].astype(np.int64)
                valid = b0 <= valid_max
                tt = np.where(valid, np.int64(t), np.int64(-1))
                vv = np.where(valid, b0, np.int64(0))
                a = acc.get(k)
                if a is None:
                    acc[k] = [tt, vv]
                else:
                    newer = tt > a[0]
                    a[0] = np.where(newer, tt, a[0])
                    a[1] = np.where(newer, vv, a[1])
    rows = {k: [] for k in ("cell_ix", "cell_iy", "row_off", "col_off",
                            "latest_sum", "latest_t_sum", "n_hole")}
    for (ix, iy, ro, co), (bt, bv) in acc.items():
        rows["cell_ix"].append(ix)
        rows["cell_iy"].append(iy)
        rows["row_off"].append(ro)
        rows["col_off"].append(co)
        rows["latest_sum"].append(int(bv.sum()))
        rows["latest_t_sum"].append(int(bt.sum()))
        rows["n_hole"].append(int((bt < 0).sum()))
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    pq.write_table(t, str(out / "latest_expected.parquet"))
    done.write_text(stamp)
    return str(out)


MAJORITY_VERSION = 1


def generate_majority_expected(sf_dir, radius=1, div=800, n_classes=8):
    """Write the ``majority_expected.parquet`` sidecar: per-(tile,
    class) counts of the radius-``radius`` focal MAJORITY filter over
    the band-0 classification ``clip(b0 // div, 0, n_classes-1)`` of
    every corpus image, computed FULL-IMAGE (the engine computes the
    same raster tile-wise via the halo exchange — stages/focal.py
    ``stat="majority"`` — so a match proves the cross-tile plumbing).
    Tie rule replicated exactly: smallest value among the max-count
    window values; windows shrink at image borders.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_MAJORITY_DONE"
    stamp = "majority v%d r%d d%d c%d" % (
        MAJORITY_VERSION, radius, div, n_classes)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    r = radius
    k = 2 * r + 1
    sentinel = np.int64(np.iinfo(np.int64).max)
    rows = {"tile_id": [], "cls": [], "n": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        c = np.clip(arr[0].astype(np.int64) // div, 0, n_classes - 1)
        H, W = c.shape
        padded = np.full((H + 2 * r, W + 2 * r), sentinel, np.int64)
        padded[r:r + H, r:r + W] = c
        layers = [padded[di:di + H, dj:dj + W]
                  for di in range(k) for dj in range(k)]
        stack = np.sort(np.stack(layers, axis=0), axis=0)
        counts = np.zeros(stack.shape, dtype=np.int64)
        for j in range(k * k):
            counts[j] = (stack == stack[j:j + 1]).sum(axis=0)
        counts[stack == sentinel] = 0
        idx = counts.argmax(axis=0)
        mode = np.take_along_axis(stack, idx[None], axis=0)[0]
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = mode[ty * TILE:(ty + 1) * TILE,
                           tx * TILE:(tx + 1) * TILE]
                uniq, cnt = np.unique(blk, return_counts=True)
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * len(uniq))
                rows["cls"].extend(int(u) for u in uniq)
                rows["n"].extend(int(v) for v in cnt)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "cls": pa.array(rows["cls"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64())})
    pq.write_table(t, str(out / "majority_expected.parquet"))
    done.write_text(stamp)
    return str(out)


MEDIAN_VERSION = 1


def generate_focal_median_expected(sf_dir, radius=1):
    """Write the ``focal_median_expected.parquet`` sidecar: per-(tile,
    band) sums of the radius-``radius`` focal MEDIAN over every corpus
    image, computed FULL-IMAGE (the engine computes the same raster
    tile-wise via the halo exchange — stages/focal.py stat="median" —
    so a match proves the cross-tile plumbing). Median rule replicated
    exactly: lower median (rank ceil(v/2) of the valid window, windows
    shrink at image borders)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_FOCALMED_DONE"
    stamp = "focalmed v%d r%d" % (MEDIAN_VERSION, radius)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    r = radius
    k = 2 * r + 1
    sentinel = np.int64(np.iinfo(np.int64).max)
    rows = {"tile_id": [], "band": [], "focal_sum_u": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        p, H, W = arr.shape
        padded = np.full((p, H + 2 * r, W + 2 * r), sentinel, np.int64)
        padded[:, r:r + H, r:r + W] = arr
        layers = [padded[:, di:di + H, dj:dj + W]
                  for di in range(k) for dj in range(k)]
        stack = np.sort(np.stack(layers, axis=0), axis=0)
        vcount = (stack != sentinel).sum(axis=0)
        idx = np.maximum((vcount + 1) // 2 - 1, 0)
        med = np.take_along_axis(stack, idx[None], axis=0)[0]
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = med[:, ty * TILE:(ty + 1) * TILE,
                          tx * TILE:(tx + 1) * TILE]
                s = blk.sum(axis=(1, 2))
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * p)
                rows["band"].extend(range(p))
                rows["focal_sum_u"].extend(int(v) for v in s)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "band": pa.array(rows["band"], pa.int64()),
        "focal_sum_u": pa.array(rows["focal_sum_u"], pa.int64())})
    pq.write_table(t, str(out / "focal_median_expected.parquet"))
    done.write_text(stamp)
    return str(out)


FLOW_VERSION = 1


def generate_flow_expected(sf_dir):
    """Write the ``flow_expected.parquet`` sidecar: per-(tile, D8 code)
    counts of the steepest-descent flow direction over band 0 of every
    corpus image, computed FULL-IMAGE (the engine computes the same
    raster tile-wise via the halo exchange — stages/terrain.py
    ``flow_direction_tiles`` — so a match proves the cross-tile
    plumbing). Rule replicated exactly: positive drops only, exact
    integer slope surrogate (2·d² cardinal vs d² diagonal), neighbors
    outside the image excluded, ties keep the first code in the
    E,SE,S,SW,W,NW,N,NE order, pits/flats code 0.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_FLOW_DONE"
    stamp = "flow v%d" % FLOW_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    d8 = ((0, 1, 1, False), (1, 1, 2, True), (1, 0, 4, False),
          (1, -1, 8, True), (0, -1, 16, False), (-1, -1, 32, True),
          (-1, 0, 64, False), (-1, 1, 128, True))
    rows = {"tile_id": [], "code": [], "n": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[0].astype(np.int64)
        H, W = z.shape
        dem = np.zeros((H + 2, W + 2), np.int64)
        valid = np.zeros((H + 2, W + 2), np.int64)
        dem[1:1 + H, 1:1 + W] = z
        valid[1:1 + H, 1:1 + W] = 1
        best_score = np.zeros((H, W), np.int64)
        best_code = np.zeros((H, W), np.int64)
        for dr, dc, code, diag in d8:
            zn = dem[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            vn = valid[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            drop = z - zn
            pos = (drop > 0) & (vn > 0)
            score = np.where(pos, drop * drop * (1 if diag else 2), 0)
            upd = score > best_score
            best_code = np.where(upd, code, best_code)
            best_score = np.where(upd, score, best_score)
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                blk = best_code[ty * TILE:(ty + 1) * TILE,
                                tx * TILE:(tx + 1) * TILE]
                uniq, cnt = np.unique(blk, return_counts=True)
                tid = "%s_t%d_%d" % (img, ty, tx)
                rows["tile_id"].extend([tid] * len(uniq))
                rows["code"].extend(int(u) for u in uniq)
                rows["n"].extend(int(v) for v in cnt)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "code": pa.array(rows["code"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64())})
    pq.write_table(t, str(out / "flow_expected.parquet"))
    done.write_text(stamp)
    return str(out)


REGIONPROPS_VERSION = 1


def generate_regionprops_expected(sf_dir, threshold=1300):
    """Write the ``regionprops_expected.parquet`` sidecar: per-image
    properties of the LARGEST 4-connected component of the mask
    ``band 0 > threshold`` — area, centroid numerators (Σrow, Σcol)
    and bounding box — computed FULL-IMAGE with an independent
    union-find (the engine labels tile-wise and merges spatial
    partials across borders via the halo exchange —
    stages/label.py:region_props). Winner = lexicographic max of
    (px, sr, sc, r0, c0, r1, c1), replicated exactly; empty-mask
    images omitted."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_REGIONPROPS_DONE"
    stamp = "regionprops v%d t%d" % (REGIONPROPS_VERSION, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {k: [] for k in ("image_id", "px", "sr", "sc",
                            "r0", "c0", "r1", "c1")}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        mask = arr[0] > threshold
        if not mask.any():
            continue
        H, W = mask.shape
        parent = np.arange(H * W, dtype=np.int64)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        hm = mask[:, :-1] & mask[:, 1:]
        vm = mask[:-1, :] & mask[1:, :]
        idx = np.arange(H * W).reshape(H, W)
        for a, b in zip(idx[:, :-1][hm], idx[:, 1:][hm]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for a, b in zip(idx[:-1, :][vm], idx[1:, :][vm]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        flat_idx = np.flatnonzero(mask.ravel())
        roots = np.array([find(x) for x in flat_idx])
        rr = (flat_idx // W).astype(np.int64)
        cc = (flat_idx % W).astype(np.int64)
        best = None
        for root in np.unique(roots):
            sel = roots == root
            tup = (int(sel.sum()), int(rr[sel].sum()),
                   int(cc[sel].sum()), int(rr[sel].min()),
                   int(cc[sel].min()), int(rr[sel].max()),
                   int(cc[sel].max()))
            key = (tup[0], tup[1], tup[2], tup[3], tup[4],
                   tup[5], tup[6])
            if best is None or key > best:
                best = key
        rows["image_id"].append(img)
        for k, v in zip(("px", "sr", "sc", "r0", "c0", "r1", "c1"),
                        best):
            rows[k].append(int(v))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        **{k: pa.array(rows[k], pa.int64())
           for k in ("px", "sr", "sc", "r0", "c0", "r1", "c1")}})
    pq.write_table(t, str(out / "regionprops_expected.parquet"))
    done.write_text(stamp)
    return str(out)


TILESUMS_VERSION = 1


def generate_tilesums_expected(sf_dir):
    """Write the ``tilesums_expected.parquet`` sidecar: per-tile band-0
    pixel sums (exact int64), the value side of areal-interpolation
    oracles — computed full-image and tiled the same way the engine's
    decode path tiles."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_TILESUMS_DONE"
    stamp = "tilesums v%d" % TILESUMS_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "b0_sum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        b0 = arr[0].astype(np.int64)
        H, W = b0.shape
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                blk = b0[ty * TILE:(ty + 1) * TILE,
                         tx * TILE:(tx + 1) * TILE]
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["b0_sum"].append(int(blk.sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "b0_sum": pa.array(rows["b0_sum"], pa.int64())})
    pq.write_table(t, str(out / "tilesums_expected.parquet"))
    done.write_text(stamp)
    return str(out)


TILECLASS_VERSION = 1


def generate_tileclass_expected(sf_dir, div=800, n_classes=8):
    """Write the ``tileclass_expected.parquet`` sidecar: per-(tile,
    class) pixel counts of the band-0 classification
    ``clip(b0 // div, 0, n_classes-1)`` with NODATA excluded — the
    value side of zonal-majority oracles."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..constants import NODATA

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_TILECLASS_DONE"
    stamp = "tileclass v%d d%d c%d" % (TILECLASS_VERSION, div,
                                       n_classes)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "cls": [], "n": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        b0 = arr[0].astype(np.int64)
        H, W = b0.shape
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                blk = b0[ty * TILE:(ty + 1) * TILE,
                         tx * TILE:(tx + 1) * TILE]
                v = blk[blk != NODATA]
                cls = np.clip(v // div, 0, n_classes - 1)
                cnt = np.bincount(cls, minlength=n_classes)
                tid = "%s_t%d_%d" % (img, ty, tx)
                for c in range(n_classes):
                    if cnt[c]:
                        rows["tile_id"].append(tid)
                        rows["cls"].append(c)
                        rows["n"].append(int(cnt[c]))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "cls": pa.array(rows["cls"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64())})
    pq.write_table(t, str(out / "tileclass_expected.parquet"))
    done.write_text(stamp)
    return str(out)


BPE_VERSION = 1


def generate_bpe_expected(sf_dir, n_merges=12):
    """Write the ``bpe_expected.parquet`` sidecar: the (step, lhs,
    rhs, pair_count) merge table of character-level BPE (Sennrich
    2016) trained single-machine over the documents table — an
    INDEPENDENT dict-based replay of stages/text.py:bpe_train (which
    computes the same merges distributed: word-count combiner →
    groupby(word), per-round pair-count combiner → groupby(pair),
    contains-filtered rewrite). Ties on the max pair count break to
    the lexicographically smallest (lhs, rhs) in both
    implementations."""
    import pyarrow.dataset as pads

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_BPE_DONE"
    stamp = "bpe v%d m%d" % (BPE_VERSION, n_merges)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    docs_path = os.path.join(str(sf_dir), "documents.parquet")
    tbl = pads.dataset(docs_path, format="parquet").to_table(
        columns=["text"])
    out.mkdir(parents=True, exist_ok=True)

    words = {}
    for t in tbl["text"].to_pylist():
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    # word -> (symbol tuple, count)
    seqs = {tuple(list(w) + ["</w>"]): n for w, n in words.items()}
    rows = {"step": [], "lhs": [], "rhs": [], "pair_count": []}
    for step in range(n_merges):
        pc = {}
        for toks, n in seqs.items():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        # deterministic argmax: max count, then smallest (lhs, rhs)
        m = max(pc.values())
        best_pair = min(p for p, c in pc.items() if c == m)
        rows["step"].append(step)
        rows["lhs"].append(best_pair[0])
        rows["rhs"].append(best_pair[1])
        rows["pair_count"].append(int(m))
        a, b = best_pair
        ab = a + b
        new_seqs = {}
        for toks, n in seqs.items():
            lst, i, L = [], 0, len(toks)
            while i < L:
                if i + 1 < L and toks[i] == a and toks[i + 1] == b:
                    lst.append(ab)
                    i += 2
                else:
                    lst.append(toks[i])
                    i += 1
            key = tuple(lst)
            new_seqs[key] = new_seqs.get(key, 0) + n
        seqs = new_seqs
    pq.write_table(pa.table({
        "step": pa.array(rows["step"], pa.int64()),
        "lhs": pa.array(rows["lhs"], pa.string()),
        "rhs": pa.array(rows["rhs"], pa.string()),
        "pair_count": pa.array(rows["pair_count"], pa.int64())}),
        str(out / "bpe_expected.parquet"))
    done.write_text(stamp)
    return str(out)


BPE_ENC_VERSION = 1


def generate_bpe_encode_expected(sf_dir, n_merges=12):
    """Write ``bpe_encode_expected.parquet`` (doc_id, n_words,
    n_tokens): the per-document token counts after applying
    ``n_merges`` character-BPE merges — an INDEPENDENT single-machine
    replay of stages/text.py:bpe_train + BpeEncoder, tracking each
    distinct word's full symbol sequence through training (the engine
    instead re-derives a fresh word's sequence at encode time by
    replaying the merge list; the two are equal because encode applies
    the same rewrites in the same order)."""
    import pyarrow.dataset as pads

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_BPE_ENC_DONE"
    stamp = "bpe_enc v%d m%d" % (BPE_ENC_VERSION, n_merges)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    docs_path = os.path.join(str(sf_dir), "documents.parquet")
    tbl = pads.dataset(docs_path, format="parquet").to_table(
        columns=["doc_id", "text"])
    out.mkdir(parents=True, exist_ok=True)

    texts = tbl["text"].to_pylist()
    word_toks = {}
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
            if w not in word_toks:
                word_toks[w] = tuple(list(w) + ["</w>"])
    for _ in range(n_merges):
        # training weights each pair by its word's corpus frequency
        pc = {}
        for w, toks in word_toks.items():
            n = wc[w]
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pc[p] = pc.get(p, 0) + n
        if not pc:
            break
        m = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == m)
        ab = a + b
        for w, toks in list(word_toks.items()):
            lst, i, L = [], 0, len(toks)
            while i < L:
                if i + 1 < L and toks[i] == a and toks[i + 1] == b:
                    lst.append(ab)
                    i += 2
                else:
                    lst.append(toks[i])
                    i += 1
            word_toks[w] = tuple(lst)
    ids = tbl["doc_id"].to_pylist()
    n_words = [len(t.split()) for t in texts]
    n_tokens = [sum(len(word_toks[w]) for w in t.split())
                for t in texts]
    pq.write_table(pa.table({
        "doc_id": pa.array([int(i) for i in ids], pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64())}),
        str(out / "bpe_encode_expected.parquet"))
    done.write_text(stamp)
    return str(out)


CONTOUR_VERSION = 2


def generate_contour_expected(sf_dir, threshold=2500):
    """Write the ``contour_expected.parquet`` sidecar: per-tile
    marching-squares summaries over band 0 of every corpus image,
    computed FULL-IMAGE (the engine computes the same quantity
    tile-wise via the radius-1 halo exchange — stages/contour.py — so
    a match proves the cross-tile plumbing). Cell ownership, case
    encoding, segment table and position weights follow the documented
    spec in stages/contour.py; all values exact int64.
    """
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..stages.contour import SEGS_PER_CASE, W_CYCLE

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_CONTOUR_DONE"
    stamp = "contour v%d t%d" % (CONTOUR_VERSION, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"tile_id": [], "n_cells": [], "n_segments": [],
            "case_checksum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[0].astype(np.int64)
        H, W = z.shape
        b = (z >= threshold).astype(np.int64)
        case = (b[:-1, :-1] + 2 * b[:-1, 1:]
                + 4 * b[1:, :-1] + 8 * b[1:, 1:])
        segs = SEGS_PER_CASE[case]
        ay, ax = np.mgrid[0:H - 1, 0:W - 1]
        wts = ((ay % TILE) * TILE + (ax % TILE)) % W_CYCLE + 1
        n_ty = (H + TILE - 1) // TILE
        n_tx = (W + TILE - 1) // TILE
        for ty in range(n_ty):
            for tx in range(n_tx):
                rs = slice(ty * TILE, min((ty + 1) * TILE, H - 1))
                cs = slice(tx * TILE, min((tx + 1) * TILE, W - 1))
                c = case[rs, cs]
                rows["tile_id"].append("%s_t%d_%d" % (img, ty, tx))
                rows["n_cells"].append(int(c.size))
                rows["n_segments"].append(int(segs[rs, cs].sum()))
                rows["case_checksum"].append(
                    int((c * wts[rs, cs]).sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "n_cells": pa.array(rows["n_cells"], pa.int64()),
        "n_segments": pa.array(rows["n_segments"], pa.int64()),
        "case_checksum": pa.array(rows["case_checksum"], pa.int64())})
    pq.write_table(t, str(out / "contour_expected.parquet"))
    done.write_text(stamp)
    return str(out)


PCA_VERSION = 1


def generate_pca_expected(sf_dir, k=4):
    """Write the ``pca_expected.parquet`` sidecar: single-machine
    replay of the EXACT fixed-point PCA projection spec
    (stages/linalg.py:pca_project_exact) over the full embeddings
    table — quantize floor(x·2^16), integer Gram, float64 covariance,
    eigh, descending order, largest-|coeff|-positive sign, components
    floored to 2^20 fixed point, centered integer projection
    (n·q − s) @ Cq^T. A hash match proves the distributed Gram reduce
    and the broadcast projection reproduce the single-machine result
    bit for bit."""
    src = pathlib.Path(sf_dir) / "embeddings.parquet"
    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_PCA_DONE"
    stamp = "pca v%d k%d" % (PCA_VERSION, k)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not src.exists():
        return None
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(str(src), columns=["vec_id", "embedding"])
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    scale = 1 << 16
    comp_scale = 1 << 20
    q = np.floor(X * scale).astype(np.int64)
    n, d = q.shape
    G = q.T @ q
    s = q.sum(axis=0)
    mean_q = s / n
    cov = (G / n - np.outer(mean_q, mean_q)) / (scale * scale)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    comps = V[:, order].T
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    Cq = np.floor(comps[:k] * comp_scale).astype(np.int64)
    Y = (n * q - s[None, :]) @ Cq.T.copy()
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for c in range(k):
        cols["pj%d" % c] = pa.array(Y[:, c], pa.int64())
    pq.write_table(pa.table(cols), str(out / "pca_expected.parquet"))
    done.write_text(stamp)
    return str(out)


ZONALMED_VERSION = 1


def generate_zonalmedian_expected(sf_dir, band=0):
    """Write the ``zonalmedian_expected.parquet`` sidecar: per-polygon
    lower/upper band-0 medians over tiles whose center falls inside
    the polygon bbox, NODATA excluded — computed by an INDEPENDENT
    full-sort formulation (concatenate every member pixel, np.sort,
    read indices (n−1)//2 and n//2), while the engine
    (stages/join.py:zonal_median) uses sparse histogram partials and a
    cumsum walk. A hash match proves the combiner algebra."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_ZONALMED_DONE"
    stamp = "zonalmed v%d b%d" % (ZONALMED_VERSION, band)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    tiles = pq.read_table(str(out / "tiles_expected.parquet"),
                          columns=["tile_id", "image_id", "row_off",
                                   "col_off", "cx", "cy"]).to_pandas()
    polys = pq.read_table(str(out / "polygons.parquet"),
                          columns=["poly_id", "xmin", "ymin", "xmax",
                                   "ymax"]).to_pandas()
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    planes = {}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        planes[img] = arr[band].astype(np.int64)
    member_vals = {pid: [] for pid in polys["poly_id"]}
    for _, t in tiles.iterrows():
        hit = polys[(polys["xmin"] <= t["cx"]) & (t["cx"] <= polys["xmax"])
                    & (polys["ymin"] <= t["cy"])
                    & (t["cy"] <= polys["ymax"])]
        if not len(hit):
            continue
        z = planes[t["image_id"]]
        r0, c0 = int(t["row_off"]), int(t["col_off"])
        blk = z[r0:r0 + TILE, c0:c0 + TILE].ravel()
        blk = blk[blk != NODATA]
        for pid in hit["poly_id"]:
            member_vals[pid].append(blk)
    rows = {"poly_id": [], "n_px": [], "med_lo": [], "med_hi": []}
    for pid, chunks in member_vals.items():
        if not chunks:
            continue
        v = np.sort(np.concatenate(chunks))
        if not len(v):
            continue
        rows["poly_id"].append(pid)
        rows["n_px"].append(len(v))
        rows["med_lo"].append(int(v[(len(v) - 1) // 2]))
        rows["med_hi"].append(int(v[len(v) // 2]))
    t = pa.table({
        "poly_id": pa.array(rows["poly_id"], pa.string()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "med_lo": pa.array(rows["med_lo"], pa.int64()),
        "med_hi": pa.array(rows["med_hi"], pa.int64())})
    pq.write_table(t, str(out / "zonalmedian_expected.parquet"))
    done.write_text(stamp)
    return str(out)


BLUR_VERSION = 1


def generate_blur_expected(sf_dir, band=0):
    """Write the ``blur_expected.parquet`` sidecar: per-image Laplacian
    blur ingredients (stages/curate.py:blur_scores spec) replayed
    full-image with an independent padded-convolution formulation."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_BLUR_DONE"
    stamp = "blur v%d b%d" % (BLUR_VERSION, band)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "lap_sum": [], "lap_sq": [], "n_lap": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[band].astype(np.int64)
        H, W = z.shape
        # independent formulation: explicit per-pixel loop-free kernel
        # sum via shift accumulation over a validity-masked field
        ok = (z != NODATA)
        lap = np.zeros((H, W), np.int64)
        good = np.zeros((H, W), bool)
        lap[1:-1, 1:-1] = 4 * z[1:-1, 1:-1]
        good[1:-1, 1:-1] = ok[1:-1, 1:-1]
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            lap[1:-1, 1:-1] -= z[1 + dr:H - 1 + dr, 1 + dc:W - 1 + dc]
            good[1:-1, 1:-1] &= ok[1 + dr:H - 1 + dr, 1 + dc:W - 1 + dc]
        rows["image_id"].append(img)
        rows["lap_sum"].append(int(lap[good].sum()))
        rows["lap_sq"].append(int((lap[good] ** 2).sum()))
        rows["n_lap"].append(int(good.sum()))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "lap_sum": pa.array(rows["lap_sum"], pa.int64()),
        "lap_sq": pa.array(rows["lap_sq"], pa.int64()),
        "n_lap": pa.array(rows["n_lap"], pa.int64())})
    pq.write_table(t, str(out / "blur_expected.parquet"))
    done.write_text(stamp)
    return str(out)


PCTILE_VERSION = 1


def generate_percentile_expected(sf_dir, q_num=1, q_den=4):
    """Write the ``percentile_expected.parquet`` sidecar into the
    SKEWED corpus dir: per SUBT×SUBT position, summaries of the
    per-pixel q-th percentile composite
    (stages/trend.py:composite_percentile spec), computed full-stack
    single-machine — the engine computes it through the statically
    sub-split groupby, so a match proves the order-statistic kernel
    and the re-chunked key plumbing over the planted hot stack."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..stages.trend import SUBT

    out = pathlib.Path(corpus_dir_for(sf_dir) + "-skew")
    done = out / "_PCTILE_DONE"
    stamp = "pctile v%d q%d/%d" % (PCTILE_VERSION, q_num, q_den)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    edge = float(2 ** 22) / float(2 ** CELL_LEVEL)
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt",
                               "gt"])
    acc = {}
    for i in range(tbl.num_rows):
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        gt = tbl["gt"][i].as_py()
        H, W = arr.shape[1], arr.shape[2]
        for ty in range((H + TILE - 1) // TILE):
            for tx in range((W + TILE - 1) // TILE):
                cx = gt[0] + tx * TILE * PX + (TILE / 2.0) * PX
                cy = gt[3] - ty * TILE * PX - (TILE / 2.0) * PX
                for sy in range(0, TILE, SUBT):
                    for sx in range(0, TILE, SUBT):
                        k = (int(cx // edge), int(cy // edge),
                             ty * TILE + sy, tx * TILE + sx)
                        blk = arr[0, ty * TILE + sy:ty * TILE + sy + SUBT,
                                  tx * TILE + sx:tx * TILE + sx + SUBT]
                        acc.setdefault(k, []).append(
                            blk.astype(np.int64).ravel())
    rows = {k: [] for k in ("cell_ix", "cell_iy", "row_off", "col_off",
                            "n_dates", "q_sum", "n_hole")}
    for (ix, iy, ro, co), planes in acc.items():
        stack = np.stack(planes)
        qv = np.zeros(stack.shape[1], dtype=np.int64)
        holes = 0
        for px in range(stack.shape[1]):
            v = stack[:, px]
            v = np.sort(v[v != NODATA])
            if len(v):
                qv[px] = v[(len(v) - 1) * q_num // q_den]
            else:
                holes += 1
        rows["cell_ix"].append(ix)
        rows["cell_iy"].append(iy)
        rows["row_off"].append(ro)
        rows["col_off"].append(co)
        rows["n_dates"].append(stack.shape[0])
        rows["q_sum"].append(int(qv.sum()))
        rows["n_hole"].append(holes)
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    pq.write_table(t, str(out / "percentile_expected.parquet"))
    done.write_text(stamp)
    return str(out)


RESAMPLE_VERSION = 1
SILENCE_VERSION = 1
MOTION_VERSION = 1


def generate_motion_clips(sf_dir, n_clips=40, seed=7, radius=3):
    """Write ``media_motion.parquet`` (constant-velocity synthetic
    clips: payload + frame geometry, the decode spec is
    stages/media.py:synthetic_motion_frame) and
    ``media_motion_expected.parquet`` — the expected block-matching
    output derived CLOSED-FORM from the planted velocities (never by
    running the engine's SAD search): every consecutive pair moves by
    exactly (vy, vx), so the dominant vector is the velocity, all
    pairs agree, and the positional checksum is code·n(n+1)/2."""
    from ..stages.media import motion_vector_code

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_MOTION_DONE"
    stamp = "motion v%d n%d seed%d r%d" % (MOTION_VERSION, n_clips,
                                           seed, radius)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    rows = {k: [] for k in ("media_id", "bytes", "kind", "fps",
                            "n_frames", "h", "w", "caption")}
    exp = {k: [] for k in ("media_id", "n_pairs", "mode_dy", "mode_dx",
                           "n_agree", "pair_wsum")}
    for i in range(n_clips):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 73,
                                                            i]))
        buf = rng.bytes(64)
        nf = 20 + int(rng.integers(20))
        h, w = 48, 64
        vx = hashlib.blake2b(buf, digest_size=1,
                             person=b"mvx").digest()[0] % 5 - 2
        vy = hashlib.blake2b(buf, digest_size=1,
                             person=b"mvy").digest()[0] % 5 - 2
        rows["media_id"].append("mot%05d" % i)
        rows["bytes"].append(buf)
        rows["kind"].append("video")
        rows["fps"].append(12.0)
        rows["n_frames"].append(nf)
        rows["h"].append(h)
        rows["w"].append(w)
        rows["caption"].append("motion clip %05d v=(%d,%d)"
                               % (i, vx, vy))
        n_pairs = nf - 1
        code = motion_vector_code(vy, vx, radius)
        exp["media_id"].append("mot%05d" % i)
        exp["n_pairs"].append(n_pairs)
        exp["mode_dy"].append(vy)
        exp["mode_dx"].append(vx)
        exp["n_agree"].append(n_pairs)
        exp["pair_wsum"].append(code * n_pairs * (n_pairs + 1) // 2)
    pq.write_table(pa.table({
        "media_id": pa.array(rows["media_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "kind": pa.array(rows["kind"], pa.string()),
        "fps": pa.array(rows["fps"], pa.float32()),
        "n_frames": pa.array(rows["n_frames"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "w": pa.array(rows["w"], pa.int32()),
        "caption": pa.array(rows["caption"], pa.string())}),
        str(out / "media_motion.parquet"))
    pq.write_table(pa.table({
        "media_id": pa.array(exp["media_id"], pa.string()),
        **{k: pa.array(exp[k], pa.int64())
           for k in ("n_pairs", "mode_dy", "mode_dx", "n_agree",
                     "pair_wsum")}}),
        str(out / "media_motion_expected.parquet"))
    done.write_text(stamp)
    return str(out)


def generate_silence_expected(sf_dir, threshold=5000):
    """Write ``media_silence_expected.parquet``: per-clip silence-run
    summaries over the REAL WAV payloads, replayed with an independent
    Python STATE-MACHINE loop (the engine vectorizes the same spec via
    diff/flatnonzero — stages/media.py:silence_summary)."""
    from ..stages.media import decode_wav_raw_int16

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_SILENCE_DONE"
    stamp = "silence v%d t%d" % (SILENCE_VERSION, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    src = out / "media_audio.parquet"
    if not src.exists():
        return None
    t = pq.read_table(str(src), columns=["media_id", "bytes"])
    rows = {k: [] for k in ("media_id", "n_samples", "n_silent",
                            "n_runs", "max_run", "run_wsum")}
    for i in range(t.num_rows):
        x = [int(v) for v in decode_wav_raw_int16(t["bytes"][i].as_py())]
        n_silent = n_runs = max_run = run_wsum = 0
        cur_len = 0
        cur_start = -1
        for j, v in enumerate(x):
            if abs(v) < threshold:
                if cur_len == 0:
                    cur_start = j
                    n_runs += 1
                cur_len += 1
                n_silent += 1
            elif cur_len:
                max_run = max(max_run, cur_len)
                run_wsum += (cur_start + 1) * cur_len
                cur_len = 0
        if cur_len:
            max_run = max(max_run, cur_len)
            run_wsum += (cur_start + 1) * cur_len
        rows["media_id"].append(t["media_id"][i].as_py())
        rows["n_samples"].append(len(x))
        rows["n_silent"].append(n_silent)
        rows["n_runs"].append(n_runs)
        rows["max_run"].append(max_run)
        rows["run_wsum"].append(run_wsum)
    pq.write_table(pa.table({
        "media_id": pa.array(rows["media_id"], pa.string()),
        **{k: pa.array(rows[k], pa.int64())
           for k in ("n_samples", "n_silent", "n_runs", "max_run",
                     "run_wsum")}}),
        str(out / "media_silence_expected.parquet"))
    done.write_text(stamp)
    return str(out)


def generate_resample_expected(sf_dir, num=2, den=3):
    """Write ``media_resample_expected.parquet``: per-clip exact
    fixed-point linear-resample summaries over the REAL WAV payloads,
    replayed with an independent PYTHON-INT per-sample loop (the
    engine vectorizes the same spec — stages/media.py:
    resample_summary)."""
    from ..stages.media import RES_W_CYCLE, decode_wav_raw_int16

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_RESAMPLE_DONE"
    stamp = "resample v%d %d/%d" % (RESAMPLE_VERSION, num, den)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    src = out / "media_audio.parquet"
    if not src.exists():
        return None
    t = pq.read_table(str(src), columns=["media_id", "bytes"])
    rows = {"media_id": [], "n_in": [], "n_out": [], "y_sum": [],
            "y_wsum": []}
    for i in range(t.num_rows):
        x = [int(v) for v in decode_wav_raw_int16(t["bytes"][i].as_py())]
        n = len(x)
        m = (n - 1) * num // den + 1 if n else 0
        ys = yw = 0
        for j in range(m):
            pos = j * den
            i0 = pos // num
            f = pos - i0 * num
            x1 = x[i0 + 1] if i0 + 1 < n else x[i0]
            y = x[i0] * (num - f) + x1 * f
            ys += y
            yw += y * (j % RES_W_CYCLE + 1)
        rows["media_id"].append(t["media_id"][i].as_py())
        rows["n_in"].append(n)
        rows["n_out"].append(m)
        rows["y_sum"].append(ys)
        rows["y_wsum"].append(yw)
    pq.write_table(pa.table({
        "media_id": pa.array(rows["media_id"], pa.string()),
        "n_in": pa.array(rows["n_in"], pa.int64()),
        "n_out": pa.array(rows["n_out"], pa.int64()),
        "y_sum": pa.array(rows["y_sum"], pa.int64()),
        "y_wsum": pa.array(rows["y_wsum"], pa.int64())}),
        str(out / "media_resample_expected.parquet"))
    done.write_text(stamp)
    return str(out)


OTSU_VERSION = 1


def generate_otsu_expected(sf_dir, band=0, bins=256, lo=0, hi=10000):
    """Write ``otsu_hist_expected.parquet``: per-image band-0 histogram
    rows (image_id, bin, n) over valid pixels — an independent decode
    loop + inline binning (value·bins // (hi−lo+1) on the clipped
    value), NOT the engine's _bin_of. The oracle replays the entire
    Otsu chain (global hist → fixed-point argmax → per-image counts)
    in SQL from these rows."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_OTSU_DONE"
    stamp = "otsu v%d b%d bins%d" % (OTSU_VERSION, band, bins)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "bin": [], "n": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        v = arr[band].ravel()
        v = v[v != NODATA].astype(np.int64)
        v = np.minimum(np.maximum(v, lo), hi)
        b = (v - lo) * bins // (hi - lo + 1)
        h = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(h)
        rows["image_id"].extend([img] * len(nz))
        rows["bin"].extend(int(x) for x in nz)
        rows["n"].extend(int(h[x]) for x in nz)
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bin": pa.array(rows["bin"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64())})
    pq.write_table(t, str(out / "otsu_hist_expected.parquet"))
    done.write_text(stamp)
    return str(out)


HOUGH_VERSION = 2


def generate_hough_expected(sf_dir):
    """Write ``hough_expected.parquet``: the CLOSED-FORM strongest line
    per (planted image, direction) for stages/hough.py:hough_lines over
    the band-0 NODATA mask. The only NODATA in the corpus is the
    _plant strip (seq % 7 == 0 → rows 0..3, all IMG_W columns), so the
    per-direction maxima follow from the plant spec alone — the
    detector is never run here (motion-clip discipline):

    - dir 0 (dx,dy)=(1,0), rho=−y: rows 0..3 each get IMG_W votes;
      max-votes tie → smallest rho = −3;
    - dir 1 (0,1), rho=x: every column gets 4 votes → rho 0;
    - dir 2 (1,1), rho=x−y: 4 votes for rho 0..IMG_W−4, partial
      diagonals outside → rho 0;
    - dir 3 (1,−1), rho=−x−y: 4 votes for x+y = 3..IMG_W−1 →
      smallest rho = −(IMG_W−1).

    A decode assertion on the first planted image guards the spec
    against generator drift."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_HOUGH_DONE"
    stamp = "hough v%d w%d" % (HOUGH_VERSION, IMG_W)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    ids = ds.to_table(columns=["image_id"])["image_id"].to_pylist()

    def _has_strip(image_id):
        # the seq % 97 == 1 images are exact COPIES of seq − 1 (the
        # dedup plant in generate_corpus), so they carry the previous
        # image's strip, not their own
        seq = int(image_id[3:])
        eff = seq - 1 if (seq % 97 == 1 and seq >= 1) else seq
        return eff % 7 == 0

    planted = sorted(i for i in ids if _has_strip(i))
    # guard: decode one planted image, assert the mask IS the strip
    if planted:
        t = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"],
                        filter=(pads.field("image_id") == planted[0]))
        arr = decode_image(t["bytes"][0].as_py(), t["fmt"][0].as_py(),
                           t["w"][0].as_py(), t["h"][0].as_py())
        m = arr[0] == NODATA
        assert m[0:4, :].all() and not m[4:, :].any(), \
            "plant spec drifted: NODATA mask is not the rows-0..3 strip"
    rows = {"image_id": [], "dir": [], "best_rho": [], "votes": []}
    for img in planted:
        for d, rho, v in ((0, -3, IMG_W), (1, 0, 4), (2, 0, 4),
                          (3, -(IMG_W - 1), 4)):
            rows["image_id"].append(img)
            rows["dir"].append(d)
            rows["best_rho"].append(rho)
            rows["votes"].append(v)
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "dir": pa.array(rows["dir"], pa.int64()),
        "best_rho": pa.array(rows["best_rho"], pa.int64()),
        "votes": pa.array(rows["votes"], pa.int64())})
    pq.write_table(t, str(out / "hough_expected.parquet"))
    done.write_text(stamp)
    return str(out)


MORPH_VERSION = 1


def generate_morph_expected(sf_dir, threshold=2500):
    """Write ``morph_expected.parquet``: per-tile opening counts for
    stages/morphology.py:morph_open_tiles replayed FULL-IMAGE — fg =
    band0 > threshold (NODATA → 0), 3×3 erosion then dilation with
    image-border windows shrunk (pad 1 is min-neutral, pad 0 is
    max-neutral), then per-TILE (n_open, position-weighted sum)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_MORPH_DONE"
    stamp = "morph v%d t%d" % (MORPH_VERSION, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None

    def shrink3(a, pad, op):
        p = np.pad(a, 1, constant_values=pad)
        o = a.copy()
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                o = op(o, p[1 + dr:1 + dr + a.shape[0],
                            1 + dc:1 + dc + a.shape[1]])
        return o

    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "row_off": [], "col_off": [],
            "n_open": [], "open_wsum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[0]
        fg = ((z != NODATA) & (z > threshold)).astype(np.int64)
        er = shrink3(fg, 1, np.minimum)
        op_ = shrink3(er, 0, np.maximum)
        H, W = op_.shape
        for ro in range(0, H, TILE):
            for co in range(0, W, TILE):
                sub = op_[ro:ro + TILE, co:co + TILE]
                ii, jj = np.nonzero(sub)
                wsum = ((ii + ro) * np.int64(100003) + jj + co).sum()
                rows["image_id"].append(img)
                rows["row_off"].append(ro)
                rows["col_off"].append(co)
                rows["n_open"].append(int(len(ii)))
                rows["open_wsum"].append(int(wsum))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "row_off": pa.array(rows["row_off"], pa.int64()),
        "col_off": pa.array(rows["col_off"], pa.int64()),
        "n_open": pa.array(rows["n_open"], pa.int64()),
        "open_wsum": pa.array(rows["open_wsum"], pa.int64())})
    pq.write_table(t, str(out / "morph_expected.parquet"))
    done.write_text(stamp)
    return str(out)


HULL_VERSION = 1


def generate_hull_expected(sf_dir, band=0, threshold=2000):
    """Write ``hull_expected.parquet``: per-image strict convex hull
    summaries for stages/hull.py:image_hulls, recomputed full-image
    with the INDEPENDENT gift-wrapping algorithm (hull_gift_wrap) over
    the same mask (band > threshold, NODATA excluded)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..stages.hull import hull_gift_wrap, _area2

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_HULL_DONE"
    stamp = "hull v%d b%d t%d" % (HULL_VERSION, band, threshold)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "n_hull": [], "area2": [], "hull_wsum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[band]
        ii, jj = np.nonzero((z != NODATA) & (z > threshold))
        if not len(ii):
            continue
        h = hull_gift_wrap(np.stack([jj, ii], axis=1))
        rows["image_id"].append(img)
        rows["n_hull"].append(int(len(h)))
        rows["area2"].append(abs(_area2(h)))
        rows["hull_wsum"].append(int(
            (h[:, 0] * np.int64(100003) + h[:, 1]).sum()))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "n_hull": pa.array(rows["n_hull"], pa.int64()),
        "area2": pa.array(rows["area2"], pa.int64()),
        "hull_wsum": pa.array(rows["hull_wsum"], pa.int64())})
    pq.write_table(t, str(out / "hull_expected.parquet"))
    done.write_text(stamp)
    return str(out)


SIMPLIFY_VERSION = 1


def generate_simplify_expected(sf_dir, band=0, threshold=2000, eps=2):
    """Write ``simplify_expected.parquet``: per-image Douglas–Peucker
    hull simplification replayed independently — gift-wrap hull
    (hull_gift_wrap), an inline chain split (side-of-chord sign, both
    chains min→max) and a RECURSIVE DP with the exact integer test
    cross² > eps²·|b−a|² (the engine uses an iterative stack)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image
    from ..stages.hull import hull_gift_wrap

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_SIMPLIFY_DONE"
    stamp = "simp v%d b%d t%d e%d" % (SIMPLIFY_VERSION, band,
                                      threshold, eps)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    def dp(chain, e2):
        if len(chain) <= 2:
            return list(chain)
        a, b = chain[0], chain[-1]
        seg2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
        best_i, best_c2 = -1, -1
        for i in range(1, len(chain) - 1):
            c = cross(a, b, chain[i])
            if c * c > best_c2:
                best_i, best_c2 = i, c * c
        if best_c2 > e2 * seg2:
            return dp(chain[:best_i + 1], e2) + \
                dp(chain[best_i:], e2)[1:]
        return [a, b]

    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "n_hull": [], "n_simplified": [],
            "simp_wsum": []}
    for i in range(tbl.num_rows):
        img = tbl["image_id"][i].as_py()
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[band]
        ii, jj = np.nonzero((z != NODATA) & (z > threshold))
        if not len(ii):
            continue
        h = hull_gift_wrap(np.stack([jj, ii], axis=1))
        P = sorted(map(tuple, h.tolist()))
        kept = set()
        if len(P) <= 2:
            kept.update(P)
        else:
            vmin, vmax = P[0], P[-1]
            above = [p for p in P[1:-1] if cross(vmin, vmax, p) > 0]
            below = [p for p in P[1:-1] if cross(vmin, vmax, p) <= 0]
            for chain in ([vmin] + above + [vmax],
                          [vmin] + below + [vmax]):
                kept.update(map(tuple, dp(chain, eps * eps)))
        ks = sorted(kept)
        rows["image_id"].append(img)
        rows["n_hull"].append(int(len(h)))
        rows["n_simplified"].append(len(ks))
        rows["simp_wsum"].append(int(sum(
            x * 100003 + y for x, y in ks)))
    t = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "n_hull": pa.array(rows["n_hull"], pa.int64()),
        "n_simplified": pa.array(rows["n_simplified"], pa.int64()),
        "simp_wsum": pa.array(rows["simp_wsum"], pa.int64())})
    pq.write_table(t, str(out / "simplify_expected.parquet"))
    done.write_text(stamp)
    return str(out)


DHASH_VERSION = 1


def generate_dhash_expected(sf_dir, band=0, max_hamming=10):
    """Write ``dhash_pairs_expected.parquet``: the exact ≤max_hamming
    dHash pair set, replayed independently — inline block means (same
    documented spec as stages/dedup.py:image_dhash, reimplemented) and
    a full O(n²) XOR+popcount over all images."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_DHASH_DONE"
    stamp = "dhash v%d b%d h%d" % (DHASH_VERSION, band, max_hamming)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None
    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    cols = [(k * 64) // 9 for k in range(10)]
    ids, sigs = [], []
    for i in range(tbl.num_rows):
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[band].astype(np.int64)
        sig = 0
        for r in range(8):
            rows = z[r * 8:(r + 1) * 8]
            means = [int(rows[:, cols[c]:cols[c + 1]].sum())
                     // (8 * (cols[c + 1] - cols[c]))
                     for c in range(9)]
            for c in range(8):
                if means[c] > means[c + 1]:
                    sig |= 1 << (r * 8 + c)
        ids.append(tbl["image_id"][i].as_py())
        sigs.append(sig)
    order = np.argsort(np.array(ids, dtype=object))
    ids = [ids[i] for i in order]
    s = np.array(sigs, dtype=np.uint64)[order]
    rows = {"img_a": [], "img_b": [], "hamming": []}
    x = s[:, None] ^ s[None, :]
    pop = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for _ in range(8):
        pop += np.unpackbits((v & np.uint64(0xFF)).astype(np.uint8)
                             [..., None], axis=-1).sum(-1) \
            .astype(np.int64)
        v >>= np.uint64(8)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if pop[i, j] <= max_hamming:
                rows["img_a"].append(ids[i])
                rows["img_b"].append(ids[j])
                rows["hamming"].append(int(pop[i, j]))
    t = pa.table({
        "img_a": pa.array(rows["img_a"], pa.string()),
        "img_b": pa.array(rows["img_b"], pa.string()),
        "hamming": pa.array(rows["hamming"], pa.int64())})
    pq.write_table(t, str(out / "dhash_pairs_expected.parquet"))
    done.write_text(stamp)
    return str(out)


LETTERBOX_VERSION = 1


def generate_letterbox_expected(sf_dir, band=0):
    """Write ``letterbox_expected.parquet``: uniform-border run
    lengths replayed independently (argmax-on-flags formulation vs the
    engine's while-loops; bottom run counted only below the top run,
    matching the fully-constant-image convention)."""
    import pyarrow.dataset as pads
    from ..codecs import decode_image

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_LETTERBOX_DONE"
    stamp = "lbox v%d b%d" % (LETTERBOX_VERSION, band)
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None

    def runs(flags):
        n = len(flags)
        nc = np.flatnonzero(~flags)
        if not len(nc):
            return n, 0
        top = int(nc[0])
        bot = int(n - 1 - nc[-1])
        return top, bot

    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "bytes", "w", "h", "fmt"])
    rows = {"image_id": [], "n_top": [], "n_bottom": [], "n_left": [],
            "n_right": [], "boxed": []}
    for i in range(tbl.num_rows):
        arr = decode_image(tbl["bytes"][i].as_py(), tbl["fmt"][i].as_py(),
                           tbl["w"][i].as_py(), tbl["h"][i].as_py())
        z = arr[band]
        t, b = runs((z == z[:, :1]).all(axis=1))
        lf, r = runs((z == z[:1, :]).all(axis=0))
        rows["image_id"].append(tbl["image_id"][i].as_py())
        rows["n_top"].append(t)
        rows["n_bottom"].append(b)
        rows["n_left"].append(lf)
        rows["n_right"].append(r)
        rows["boxed"].append(int(max(t, b, lf, r) >= 2))
    t_ = pa.table({k: pa.array(v, pa.string() if k == "image_id"
                               else pa.int64())
                   for k, v in rows.items()})
    pq.write_table(t_, str(out / "letterbox_expected.parquet"))
    done.write_text(stamp)
    return str(out)


CAPLCS_VERSION = 1


def generate_caption_lcs_expected(sf_dir):
    """Write ``caption_lcs_expected.parquet``: (keeper, other) caption
    LCS lengths per phash dup cluster, replayed independently — phash
    clusters straight off the images table, LCS via a RECURSIVE
    memoized formulation (the engine uses the iterative DP)."""
    import functools
    import pyarrow.dataset as pads

    out = pathlib.Path(corpus_dir_for(sf_dir))
    done = out / "_CAPLCS_DONE"
    stamp = "caplcs v%d" % CAPLCS_VERSION
    if done.exists() and done.read_text() == stamp:
        return str(out)
    if not (out / "images").is_dir():
        return None

    def lcs(a, b):
        @functools.lru_cache(maxsize=None)
        def f(i, j):
            if i == 0 or j == 0:
                return 0
            if a[i - 1] == b[j - 1]:
                return f(i - 1, j - 1) + 1
            return max(f(i - 1, j), f(i, j - 1))
        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(10000)
        try:
            return f(len(a), len(b))
        finally:
            sys.setrecursionlimit(old)

    ds = pads.dataset(str(out / "images"), format="parquet")
    tbl = ds.to_table(columns=["image_id", "phash", "caption"]) \
        .to_pandas()
    rows = {"img_a": [], "img_b": [], "lcs_len": [], "len_a": [],
            "len_b": []}
    for _ph, g in tbl.groupby("phash"):
        if len(g) < 2:
            continue
        g = g.sort_values("image_id")
        ka, ca = g["image_id"].iloc[0], g["caption"].iloc[0]
        for _, r in g.iloc[1:].iterrows():
            rows["img_a"].append(ka)
            rows["img_b"].append(r["image_id"])
            rows["lcs_len"].append(int(lcs(ca, r["caption"])))
            rows["len_a"].append(len(ca))
            rows["len_b"].append(len(r["caption"]))
    t = pa.table({
        "img_a": pa.array(rows["img_a"], pa.string()),
        "img_b": pa.array(rows["img_b"], pa.string()),
        "lcs_len": pa.array(rows["lcs_len"], pa.int64()),
        "len_a": pa.array(rows["len_a"], pa.int64()),
        "len_b": pa.array(rows["len_b"], pa.int64())})
    pq.write_table(t, str(out / "caption_lcs_expected.parquet"))
    done.write_text(stamp)
    return str(out)
