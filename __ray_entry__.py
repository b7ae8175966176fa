"""Driver contract for the Ray-Data unmixing engine.

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init``/``ray.shutdown``. ``queries()`` returns
one callable per implemented operator/pipeline (SURVEY.md §2 inventory);
``oracle_sql()`` the DuckDB-equivalent SQL. Geospatial queries run over
the deterministic synthetic image corpus (generated on first use under
/tmp/ray_unmix_data/<sf>/ — the engine's input table per BASELINE.json
input_hint); their oracles read the corpus sidecar parquet directly.
Column names and integer scalings match between both sides so the
driver's order-insensitive value-hash comparison is exact.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

SF01_CORPUS = "/tmp/ray_unmix_data/sf0.01"

# support-2 part co-purchase edge CTE shared by the graph oracles
_COPURCHASE_E2_CTE = """e AS (
              SELECT least(x.l_partkey, y.l_partkey) AS a,
                     greatest(x.l_partkey, y.l_partkey) AS b
              FROM (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) x
              JOIN (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2)"""


def _corpus(sf_dir):
    from unmixing_ray.sources import synth
    return synth.ensure_corpus(sf_dir)


def _read(sf_dir, name, **kw):
    import ray.data
    return ray.data.read_parquet(
        os.path.join(str(sf_dir), name + ".parquet"), **kw)


# ---------------------------------------------------------------------------
# entry

def _out_dir(tag, sf_dir):
    """Output dir keyed by corpus generation stamp: checkpoint-resume
    assumes immutable input, so a regenerated corpus gets a fresh dir
    (a fixed dir accumulated stale partitions across generator bumps)."""
    from unmixing_ray.sources import synth
    name = os.path.basename(str(sf_dir))
    return "/tmp/ray_unmix_out/%s_%s_v%d" % (tag, name,
                                             synth.GENERATOR_VERSION)


def entry() -> Any:
    """Flagship pipeline at sf0.001: decode → tile → MNF → NFINDR → FCLS
    → join; returns the abundance-tile Dataset."""
    import ray.data
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    corpus = _corpus("/root/testdata/sf0.001")
    out = _out_dir("entry", "/root/testdata/sf0.001")
    res = flagship.run_flagship(
        corpus, out, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
        q=3, k_knn=2)
    return ray.data.read_parquet(res["abundances_dir"],
                                 file_extensions=["parquet"])


# ---------------------------------------------------------------------------
# geospatial queries (synthetic corpus)

def _tiles_ds(sf_dir, clean=False):
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import masks as mstage
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    if clean:
        tiles = tiles.map_batches(mstage.make_clean_stage(),
                                  batch_format="pyarrow", batch_size=64)
    return corpus, tiles


def q_tile_assignment(sf_dir):
    """Bit-exact tile→cell assignment through the decode path."""
    import pyarrow as pa
    from unmixing_ray import cellindex
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        ix, iy, lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        return pa.table({
            "tile_id": batch["tile_id"],
            "image_id": batch["image_id"],
            "row_off": batch["row_off"].cast(pa.int64()),
            "col_off": batch["col_off"].cast(pa.int64()),
            "cell_ix": pa.array(ix, pa.int64()),
            "cell_iy": pa.array(iy, pa.int64()),
            "cx": batch["cx"], "cy": batch["cy"],
        })

    return tiles.map_batches(project, batch_format="pyarrow")


def q_focal_mean(sf_dir):
    """Radius-1 focal mean via cross-tile HALO EXCHANGE (stages/focal.py)
    summarized to per-(tile, band) int64 sums. Oracle: the full-image
    shift-sum sidecar — a match proves the halo plumbing end to end."""
    from unmixing_ray.stages import focal
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return focal.focal_band_sums(
        focal.focal_mean_tiles(tiles, radius=1, scale=1000))


def q_focal_median(sf_dir):
    """Radius-1 focal MEDIAN (exact lower median, the edge-preserving
    speckle smoother) via the same cross-tile halo exchange
    (stages/focal.py stat="median"), summarized to per-(tile, band)
    int64 sums. Oracle: the full-image sorted-layers sidecar."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import focal
    synth.generate_focal_median_expected(sf_dir)
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return focal.focal_band_sums(
        focal.focal_stat_tiles(tiles, stat="median", radius=1))


def q_convolve_gaussian(sf_dir):
    """5x5 binomial (Gaussian) kernel convolution via a RADIUS-2
    cross-tile halo exchange (stages/focal.py:convolve_tiles) — the one
    query exercising 2-deep halo strips (corner strips are 2x2, edge
    strips 2xT). Full-window border rule: pixels whose 5x5 window
    leaves the image contribute 0 and drop out of n_valid. Oracle: the
    full-image shift-sum sidecar."""
    import numpy as np
    from unmixing_ray.stages import focal
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    k1 = np.array([1, 4, 6, 4, 1], dtype=np.int64)
    return focal.convolve_tiles(tiles, np.outer(k1, k1))


def q_contour_segments(sf_dir):
    """Marching-squares contour summary per tile (stages/contour.py):
    band-0 prune → radius-1 halo exchange → per-tile case counts,
    segment totals and a position-weighted case checksum (exact
    int64). Oracle: the full-image marching-squares sidecar — a match
    proves the cross-tile cell assembly end to end."""
    from unmixing_ray.stages import contour
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return contour.contour_tiles(tiles, threshold=2500)


def q_glcm_texture(sf_dir):
    """Per-image GLCM co-occurrence counts (stages/texture.py):
    quantized band-0 pairs at displacement (0,1) via anchor-in-tile
    partitioning + a DIRECTED band-pruned leading-edge halo (~1.6% of
    corpus bytes through the exchange vs focal's ~113%). Texture
    aggregates (contrast/energy/homogeneity) are SQL over these rows.
    Oracle: the full-image shifted-pair sidecar."""
    from unmixing_ray.stages import texture
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return texture.glcm_counts(tiles, levels=16, vmax=9999, dy=0, dx=1,
                               band=0)


def q_pyramid_overview(sf_dir):
    """Level-1 image overview via the spatial reduction tree
    (stages/pyramid.py: local factor-2 block-sum decimation, then a
    groupby assembly of up to 4 children per parent), summarized to
    per-(parent, band) int64 sums. Oracle: the full-image downsample
    sidecar — a match proves the cross-tile assembly end to end."""
    from unmixing_ray.stages import pyramid
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return pyramid.overview_band_sums(pyramid.build_overview(tiles))


def q_terrain_slope(sf_dir):
    """Horn-method slope gradients via the cross-tile halo exchange
    (stages/terrain.py): band 0 pruned out of the payload BEFORE the
    exchange, integer gradient numerators summarized per tile. Oracle:
    the full-image shift-computed sidecar — a match proves the halo
    plumbing and the border rule end to end."""
    from unmixing_ray.stages import terrain
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return terrain.terrain_slope_tiles(tiles)


def q_hillshade(sf_dir):
    """Horn hillshade (gdaldem shading, az 315 / alt 45) via the same
    cross-tile halo exchange as q_terrain_slope; per-pixel shading
    floored to 1/255 integer units, summed per tile. Oracle: the
    full-image sidecar replaying the identical float64 elementwise
    kernel (bit-identical by construction) — a match proves the halo
    plumbing carries exact neighbor DEM values."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import terrain
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return terrain.hillshade_tiles(tiles, cellsize=synth.PX,
                                   azimuth_deg=315.0, altitude_deg=45.0)


def q_focal_majority(sf_dir):
    """Majority-filter smoothing of a band-0 classification — the
    classic post-classification cleanup — via the cross-tile halo
    exchange (stages/focal.py stat="majority": window values sorted,
    exhaustive count of the 9 layers, smallest-value tiebreak; the
    classification runs BEFORE the exchange so one small band
    travels). Oracle: the full-image replay sidecar — a match proves
    the halo plumbing and the exact tie rule end to end."""
    from unmixing_ray.stages import focal
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return focal.focal_class_counts(focal.focal_majority_tiles(tiles))


def q_flow_direction(sf_dir):
    """D8 steepest-descent flow direction over band 0 via the
    cross-tile halo exchange (stages/terrain.py:flow_direction_tiles):
    exact integer slope surrogate (2·d² cardinal vs d² diagonal — no
    √2 ever enters), deterministic E,SE,S,SW,W,NW,N,NE tie precedence,
    per-(tile, code) counts. Oracle: the full-image replay sidecar."""
    from unmixing_ray.stages import terrain
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return terrain.flow_direction_tiles(tiles)


def q_intersect_resample(sf_dir):
    """Raster intersection/alignment (the reference's
    intersect_rasters, utils.py:676-731, as a co-grouped exchange —
    stages/align.py:intersect_tiles): a 2x-coarser source raster (same
    origin, double pixel size, covering all but the last 2 rows/cols of
    each tile) is resampled back onto the reference tile grid by the
    generic gt-arithmetic nearest resampler; uncovered ref pixels take
    the NODATA fill (the clip/pad branch). Summarized to per-tile
    band-0 sums/valid counts; the sidecar oracle replays the CLOSED
    FORM of the same grid geometry (synth.generate_intersect_expected),
    so a match proves the gt math, the co-group plumbing and the fill
    rule. Pair key = the tile id (1 ref + 1 src per group — immune to
    several tiles sharing a cell)."""
    from unmixing_ray.constants import NODATA
    from unmixing_ray.stages import align
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    cols = ["tile_id", "image_id", "cell", "h", "w", "bands",
            "pixels", "gt"]
    ref = tiles.select_columns(cols)

    def coarsen(df: pd.DataFrame) -> pd.DataFrame:
        out = {c: [] for c in cols}
        for _, row in df.iterrows():
            h, w, p = int(row["h"]), int(row["w"]), int(row["bands"])
            if h <= 2 or w <= 2:
                continue
            arr = np.frombuffer(row["pixels"], dtype=np.int16).reshape(
                (p, h, w))
            c = np.ascontiguousarray(arr[:, 0:h - 2:2, 0:w - 2:2])
            gt = list(row["gt"])
            gt[1] *= 2.0
            gt[5] *= 2.0
            out["tile_id"].append(row["tile_id"])
            out["image_id"].append(row["image_id"])
            out["cell"].append(row["cell"])
            out["h"].append(c.shape[1])
            out["w"].append(c.shape[2])
            out["bands"].append(p)
            out["pixels"].append(c.tobytes())
            out["gt"].append(gt)
        # arrow out so gt keeps the ref side's fixed_size_list[6] type
        # (a plain list<double> would fork the union schema)
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "image_id": pa.array(out["image_id"], pa.string()),
            "cell": pa.array(out["cell"], pa.uint64()),
            "h": pa.array(out["h"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
            "bands": pa.array(out["bands"], pa.int32()),
            "pixels": pa.array(out["pixels"], pa.binary()),
            "gt": pa.array(out["gt"], pa.list_(pa.float64(), 6))})

    src = ref.map_batches(coarsen, batch_format="pandas")
    aligned = align.intersect_tiles(ref, src, key="tile_id")

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        sums, ns = [], []
        for _, row in df.iterrows():
            hw = int(row["h"]) * int(row["w"])
            b0 = np.asarray(row["pixels"][:hw], dtype=np.float64)
            valid = b0 != NODATA
            sums.append(int(b0[valid].sum()))
            ns.append(int(valid.sum()))
        return pd.DataFrame({
            "tile_id": df["tile_id"].astype(str),
            "b0_sum": pd.Series(sums, dtype="int64"),
            "n_valid": pd.Series(ns, dtype="int64")})

    return aligned.map_batches(summarize, batch_format="pandas")


def q_histogram_match(sf_dir):
    """Per-image histogram MATCHING to the corpus-global distribution
    (stages/enhance.py:match_histogram_tiles): tiny global-histogram
    pass, then ONE groupby(image_id) — each image's inclusive CDF rank
    mapped to the global CDF by exact integer cross-multiplication.
    Oracle: single-machine full replay sidecar
    (synth.generate_match_expected)."""
    from unmixing_ray.stages import enhance
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return enhance.match_histogram_tiles(tiles)


def q_histogram_equalize(sf_dir):
    """Corpus-GLOBAL histogram equalization (stages/enhance.py) — the
    two-pass global-statistics transform family (reference BCI/RNDSI
    global min-max, mask_ledaps_qa global mode) as a distributed
    combiner-before-shuffle histogram fit + broadcast-LUT remap;
    integer-exact. Oracle: the single-machine full-corpus replay
    sidecar (synth.generate_equalize_expected) — a match proves the
    distributed two-pass plumbing, not just the LUT formula."""
    from unmixing_ray.stages import enhance
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return enhance.equalize_tiles(tiles)


def q_distance_transform(sf_dir):
    """Saturated Chebyshev distance-to-NODATA transform (the
    buffer-around-gaps masking primitive) via radius-4 halo exchange +
    integer chamfer iteration (stages/morphology.py), summarized to
    per-tile (sum_dist, n_cap, n_px). Oracle: the full-image
    box-dilation-ladder sidecar (synth.generate_distance_expected) — an
    INDEPENDENT formulation, so a match proves both the kernel and the
    cross-tile halo plumbing plus the radius-saturation contract."""
    from unmixing_ray.stages import morphology
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return morphology.distance_to_nodata_tiles(tiles, radius=4)


def q_warp_bilinear(sf_dir):
    """5/4 bilinear upsample via the cross-tile halo exchange
    (stages/warp.py): integer fixed-point interpolation, edge
    replication at image borders, summarized to per-(tile, band) int64
    sums. Oracle: the full-image warp sidecar — a match proves the
    cross-tile interpolation plumbing end to end."""
    from unmixing_ray.stages import warp
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return warp.warp_band_sums(warp.warp_tiles(tiles, num=5, den=4))


def q_retile(sf_dir):
    """Re-chunk the tile grid 2x coarser (stages/retile.py): the whole
    pixel payload moves through exactly one groupby(parent) exchange —
    the raster-grid analogue of Dataset.repartition. Summarized to
    non-NoData band-0 sums per parent so the oracle regroups the
    per-child zonal sidecar by parent key (no new sidecar); exact
    pixel PLACEMENT is pinned byte-for-byte in pytest
    (tests/test_retile.py)."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import retile as rstage
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    parents = rstage.retile(tiles, tile=synth.TILE, factor=2)
    return rstage.retile_band0_summary(parents)


def q_raster_components(sf_dir):
    """Distributed raster connected-component labeling (polygonize):
    per-tile local labels -> border-adjacency halo exchange ->
    distributed connected components over the edge list
    (stages/label.py). Oracle: the full-image union-find sidecar — a
    match proves local labeling, the border rule, node encoding, and
    the global merge end to end."""
    from unmixing_ray.stages import label
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return label.raster_components(tiles, threshold=1300)


def q_areal_interp(sf_dir):
    """AREAL INTERPOLATION — the GIS reweighting that moves a value
    surface from one zonal system to another: per polygon,
    Σ over overlapping tiles of (exact intersection area ×
    tile band-0 sum). A pure COMPOSITION of engine operators: the
    grid-partitioned overlay join (box_overlap_join, one
    groupby(cell) shuffle) → partitioned hash_join with the per-tile
    value sums (combiner-computed, never a pixel payload) → exact
    int64 groupby(poly). Oracle: the overlay SQL joined to the
    tile-sums sidecar."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from unmixing_ray import geo
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage, relational
    from unmixing_ray.stages.decode import binary_views
    corpus, tiles = _tiles_ds(sf_dir)

    def to_bbox(batch: pa.Table) -> pa.Table:
        gts = batch["gt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        n = len(gts)
        x0 = np.empty(n)
        y0 = np.empty(n)
        x1 = np.empty(n)
        y1 = np.empty(n)
        for i, gt in enumerate(gts):
            (a, b), (c, d) = geo.pixel_to_xy(
                [(0, 0), (int(ws[i]), int(hs[i]))], gt)
            x0[i], y1[i], x1[i], y0[i] = a, b, c, d
        return pa.table({
            "tile_id": batch["tile_id"],
            "xmin": pa.array(x0), "ymin": pa.array(y0),
            "xmax": pa.array(x1), "ymax": pa.array(y1)})

    boxes = tiles.select_columns(["tile_id", "gt", "w", "h"])        .map_batches(to_bbox, batch_format="pyarrow")
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    overlay = jstage.box_overlap_join(boxes, polys,
                                      level=synth.CELL_LEVEL)

    def b0_sums(batch: pa.Table) -> pa.Table:
        values, offsets = binary_views(batch["pixels"], np.int16)
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        sums = []
        for i in range(batch.num_rows):
            n = int(hs[i]) * int(ws[i])
            sums.append(int(values[offsets[i]:offsets[i] + n]
                            .astype(np.int64).sum()))
        return pa.table({"tile_id": batch["tile_id"],
                         "b0_sum": pa.array(sums, pa.int64())})

    tsums = tiles.select_columns(
        ["tile_id", "h", "w", "bands", "pixels"]).map_batches(
        b0_sums, batch_format="pyarrow")
    joined = relational.hash_join(
        overlay, tsums, "tile_id",
        left_cols=["poly_id", "area_x4"], right_cols=["b0_sum"])
    out = joined.map_batches(
        lambda df: pd.DataFrame({
            "poly_id": df["poly_id"].astype(str),
            "n_tiles": np.int64(1),
            "area_x4_sum": df["area_x4"].astype("int64"),
            "wsum": df["area_x4"].astype("int64").to_numpy()
            * df["b0_sum"].astype("int64").to_numpy()})
        .groupby("poly_id", as_index=False).sum(),
        batch_format="pandas").groupby("poly_id").aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("area_x4_sum", alias_name="area_x4_sum"),
        Sum("wsum", alias_name="wsum"))
    return out.map_batches(
        lambda df: df.astype({"n_tiles": "int64",
                              "area_x4_sum": "int64",
                              "wsum": "int64"}), batch_format="pandas")


def q_region_props(sf_dir):
    """Per-image region properties (area / centroid numerators / bbox)
    of the largest connected component (stages/label.py:region_props —
    the local-label + border-halo + global-merge chain with spatial
    partials merged associatively per canonical component; the output
    IS the deterministic ordering tuple). Oracle: the full-image
    union-find replay sidecar."""
    from unmixing_ray.stages import label
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return label.region_props(tiles, threshold=1300)


def q_pixel_to_xy(sf_dir):
    """The bit-for-bit affine transform: per-tile origin and far-corner
    map coordinates computed from the tile gt through pixel_to_xy."""
    import pyarrow as pa
    from unmixing_ray import geo
    _c, tiles = _tiles_ds(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        gts = batch["gt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        x0 = np.empty(len(gts))
        y0 = np.empty(len(gts))
        x1 = np.empty(len(gts))
        y1 = np.empty(len(gts))
        for i, gt in enumerate(gts):
            (a, b), (c, d) = geo.pixel_to_xy(
                [(0, 0), (int(ws[i]), int(hs[i]))], gt)
            x0[i], y0[i], x1[i], y1[i] = a, b, c, d
        return pa.table({
            "tile_id": batch["tile_id"],
            "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x1), "y1": pa.array(y1),
        })

    return tiles.map_batches(project, batch_format="pyarrow")


def q_spatial_join_pip(sf_dir):
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    joined = jstage.broadcast_spatial_join(tiles, polygons, k=0)
    df = joined.to_pandas()
    return df[df["kind"] == "pip"][["tile_id", "poly_id"]]\
        .reset_index(drop=True)


def q_spatial_join_knn(sf_dir):
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    joined = jstage.broadcast_spatial_join(tiles, polygons, k=2)
    df = joined.to_pandas()
    knn = df[df["kind"] == "knn"].copy()
    knn["knn_rank"] = knn["rank"].astype("int64")
    knn["dist_u6"] = np.floor(knn["dist"] * 1_000_000).astype("int64")
    return knn[["tile_id", "knn_rank", "poly_id", "dist_u6"]]\
        .reset_index(drop=True)


def q_polygon_metrics(sf_dir):
    """Vector-side geometry analytics (stages/join.py:polygon_metrics):
    exact fixed-point shoelace area, L1 perimeter, vertex and
    covering-cell counts per polygon; DuckDB replays the identical
    doubled-integer arithmetic over the same ring lists."""
    import ray.data
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.polygon_metrics(polys)


def q_polygon_centroids(sf_dir):
    """Exact polygon centroid ingredients
    (stages/join.py:polygon_centroids): signed doubled-integer
    shoelace sum + centroid numerators per polygon; DuckDB replays
    the identical integer arithmetic over the same ring lists."""
    import ray.data
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.polygon_centroids(polys)


def q_chunk_docs(sf_dir):
    """Overlapping token-window chunking (stages/text.py:chunk_docs):
    the RAG/context splitter as an exchange-free flat map; chunk_md5
    fingerprints each chunk's exact text so the SQL replay
    (list_slice + md5) pins content, not just counts."""
    from unmixing_ray.stages import text
    return text.chunk_docs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        window=32, stride=24)


def q_kcore(sf_dir):
    """Bounded-round k-core peeling (stages/relational.py:kcore_peel)
    over the support-2 part co-purchase graph: 3 synchronous peel
    rounds at k=4, each ONE degree groupby + two node semi-joins;
    zero-degree survivors re-enter via an anti-join so the synchronous
    semantics hold exactly. Oracle: stacked-CTE SQL replay
    (relational.kcore_sql)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = relational.basket_pairs(
        ds, "l_orderkey", "l_partkey", min_support=2,
        pairs_only=True).map_batches(
        lambda df: df[["a", "b"]].astype("int64"),
        batch_format="pandas")
    return relational.kcore_peel(edges, k=4, rounds=3)


def _copurchase_edges(sf_dir, min_support=2):
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return relational.basket_pairs(
        ds, "l_orderkey", "l_partkey", min_support=min_support,
        pairs_only=True).map_batches(
        lambda df: df[["a", "b"]].astype("int64"),
        batch_format="pandas")


def q_graph_components(sf_dir):
    """Bounded-round connected components
    (stages/relational.py:graph_components): hash-to-min label
    propagation over the support-2 part co-purchase graph — 4
    synchronous min rounds, each ONE partitioned hash join + ONE
    groupby(node) min. Oracle: stacked-CTE SQL replay
    (relational.graph_components_sql)."""
    from unmixing_ray.stages import relational
    return relational.graph_components(
        _copurchase_edges(sf_dir, min_support=2), rounds=4)


def q_clustering_coeff(sf_dir):
    """Per-node clustering-coefficient ingredients
    (stages/relational.py:clustering_coeff): degree-ordered wedge
    closure keeping the wedge apex, each closed triangle exploded to
    its 3 member nodes through a count-combiner groupby; exact int64
    (deg, n_tri, n_wedge) per node so the distributed result
    hash-checks against DuckDB's full triangle enumeration."""
    from unmixing_ray.stages import relational
    return relational.clustering_coeff(
        _copurchase_edges(sf_dir, min_support=2))


def q_dsir_weights(sf_dir):
    """DSIR-style importance weights (stages/text.py:dsir_weights):
    hashed-unigram bucket counts (ONE groupby(bucket) exchange of
    ≤ 256 rows per batch), integer ratio surrogate broadcast via
    ray.put, stateless scoring pass. Oracle replays the md5 bucket
    hash and floor-div ratio in SQL."""
    from unmixing_ray.stages import text
    return text.dsir_weights(
        _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]))


def q_polygon_cover(sf_dir):
    """Spatial-index cover build (stages/join.py:polygon_cover): the
    level-12 covering cells of every polygon bbox, the key set the
    partitioned join plans shuffle on; the DuckDB oracle replays the
    closed-form floor-grid arithmetic."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.polygon_cover(polys, level=synth.CELL_LEVEL)


def q_box_join(sf_dir):
    """Rectangle-intersection self-join (grid-partitioned range join,
    stages/join.py:box_intersection_join): every overlapping polygon
    pair with its exact intersection area — replicate-to-cover,
    groupby(cell), local vectorized all-pairs, reference-point dedup.
    Oracle: DuckDB self-join with least/greatest overlap arithmetic."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.box_intersection_join(polys, level=synth.CELL_LEVEL)


def q_tile_poly_overlap(sf_dir):
    """Two-table grid-partitioned spatial overlay (stages/join.py:
    box_overlap_join): every (tile extent × polygon) pair with its
    exact intersection area — the area-weighted zonal join, through
    the real decode path (tile bboxes from each tile's gt via the
    bit-for-bit pixel_to_xy transform). One groupby(cell) shuffle over
    the tagged union; reference-point dedup. Oracle: DuckDB join of the
    tile-lattice sidecar with the polygon table, least/greatest
    overlap arithmetic."""
    import pyarrow as pa
    import ray.data
    from unmixing_ray import geo
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)

    def to_bbox(batch: pa.Table) -> pa.Table:
        gts = batch["gt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        n = len(gts)
        x0 = np.empty(n)
        y0 = np.empty(n)
        x1 = np.empty(n)
        y1 = np.empty(n)
        for i, gt in enumerate(gts):
            (a, b), (c, d) = geo.pixel_to_xy(
                [(0, 0), (int(ws[i]), int(hs[i]))], gt)
            # gt5 < 0: (0,0) is the top-left corner, so b is ymax
            x0[i], y1[i], x1[i], y0[i] = a, b, c, d
        return pa.table({
            "tile_id": batch["tile_id"],
            "xmin": pa.array(x0), "ymin": pa.array(y0),
            "xmax": pa.array(x1), "ymax": pa.array(y1)})

    boxes = tiles.select_columns(["tile_id", "gt", "w", "h"])\
        .map_batches(to_bbox, batch_format="pyarrow")
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.box_overlap_join(boxes, polys, level=synth.CELL_LEVEL)


def q_polygon_union_area(sf_dir):
    """The measure problem (union-of-rectangles area) distributed
    (stages/join.py:box_union_area): boxes pre-clipped to covering
    cells (cells partition the plane, so per-cell slab-sweep unions sum
    to the exact global union — no dedup pass), doubled-integer sweep
    arithmetic. Oracle: a pure-SQL Bentley sweep (y slabs via lead(),
    per-slab 1D x-union via a running-max window)."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    return jstage.box_union_area(polys, level=synth.CELL_LEVEL)


def q_polygon_dissolve_area(sf_dir):
    """GIS DISSOLVE: union-of-rectangles area per attribute class
    (stages/join.py:box_union_area_by) — per-(cell, class) slab sweeps
    behind ONE groupby; class = numeric suffix of poly_id mod 4
    (deterministic, SQL-replayable). Oracle: the pure-SQL Bentley
    sweep partitioned by class."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))

    def add_grp(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["poly_id", "xmin", "ymin", "xmax", "ymax"]].copy()
        df["grp"] = df["poly_id"].str[4:].astype(np.int64) % 4
        return df

    return jstage.box_union_area_by(
        polys.map_batches(add_grp, batch_format="pandas"),
        level=synth.CELL_LEVEL, key_col="grp")


def q_cell_density(sf_dir):
    """3x3 neighborhood tile density per cell
    (stages/rollup.py:cell_density) — the hot-spot statistic behind
    salting decisions, computed combiner-before-shuffle (one partial
    row per occupied cell x 9 offsets per batch; small int64 lattice
    keys). Oracle: SQL shift-and-sum over the closed-form tile
    lattice sidecar."""
    from unmixing_ray.stages import rollup
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return rollup.cell_density(tiles)


def q_zonal_majority(sf_dir):
    """Zonal MAJORITY — the categorical sibling of zonal_stats
    (land-cover share per polygon): per-tile class-count vectors
    (combiner), broadcast STRtree PIP probe, (poly, class) partials,
    argmax with smallest-class tiebreak
    (stages/join.py:zonal_majority). Oracle: SQL over the per-tile
    class sidecar joined to the polygon bboxes with a window argmax."""
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    return jstage.zonal_majority(tiles, polygons)


def q_lineitem_cube(sf_dir):
    """GROUP BY CUBE(returnflag, linestatus) — all four grouping sets
    in one shuffle via the subset combiner
    (stages/relational.py:cube_sums); exact cents."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_extendedprice"])
    return relational.cube_sums(
        ds, ["l_returnflag", "l_linestatus"], "l_extendedprice")


def q_zonal_stats(sf_dir):
    """Zonal statistics (raster×vector classic): per polygon, sum +
    valid-pixel count of band 0 over tiles whose center is inside.
    Combiner-before-shuffle (stages/join.py:zonal_stats); oracle joins
    the per-tile zonal sidecar to the bbox polygons in SQL."""
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    return jstage.zonal_stats(tiles, polygons, band=0)


def q_zonal_median(sf_dir):
    """EXACT zonal median (stages/join.py:zonal_median): per polygon
    the lower/upper band-0 median over member tiles, via sparse
    bounded-range histogram partials (combiner-before-shuffle, pixels
    never shuffle) and a per-polygon cumsum walk. Oracle: independent
    full-sort replay sidecar (synth.generate_zonalmedian_expected)."""
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    return jstage.zonal_median(tiles, polygons, band=0)


def q_rasterize_count(sf_dir):
    """Vector burn-in: per PIP join pair, the number of pixel CENTERS
    inside the polygon — per-axis vectorized comparisons multiplied, the
    exact IEEE expression the SQL oracle evaluates per pixel
    (stages/join.py:rasterize_count)."""
    import pyarrow.parquet as pq
    from unmixing_ray.stages import join as jstage
    corpus, tiles = _tiles_ds(sf_dir)
    polygons = pq.read_table(os.path.join(corpus, "polygons.parquet"))
    return jstage.rasterize_count(tiles, polygons)


def q_mask_counts(sf_dir):
    """Planted-feature mask counts per image through the decode path:
    density-slice water, saturation, NoData, cfmask-QA (reference ops
    utils.py:560-579, 971-997, 230-263)."""
    import pyarrow as pa
    from unmixing_ray.kernels import masks as mk
    from unmixing_ray.sources import images
    from unmixing_ray.stages.decode import decode_batch
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus)

    def counts(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import binary_views, \
            tiles_to_ndarray
        dec = decode_batch(batch)
        arrays, uniform = tiles_to_ndarray(dec)
        qa_vals, qa_off = binary_views(dec["qa"], np.uint8)
        hs = dec["h"].to_numpy()
        ws = dec["w"].to_numpy()
        out = {"image_id": dec["image_id"],
               "n_water": [], "n_saturated": [], "n_nodata": [],
               "n_qa_masked": []}
        for i in range(dec.num_rows):
            arr = uniform[i] if uniform is not None else arrays[i]
            qa = qa_vals[qa_off[i]:qa_off[i + 1]]\
                .reshape((int(hs[i]), int(ws[i])))
            out["n_water"].append(
                int(mk.density_slice(arr[4:5], threshold=1000).sum()))
            out["n_saturated"].append(int(mk.saturation_mask(arr).sum()))
            out["n_nodata"].append(int((arr[0] == -9999).sum()))
            out["n_qa_masked"].append(int(mk.cfmask(qa).sum()))
        return pa.table({
            "image_id": out["image_id"],
            "n_water": pa.array(out["n_water"], pa.int64()),
            "n_saturated": pa.array(out["n_saturated"], pa.int64()),
            "n_nodata": pa.array(out["n_nodata"], pa.int64()),
            "n_qa_masked": pa.array(out["n_qa_masked"], pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow", batch_size=32)


def q_band_stats(sf_dir):
    """Per-image per-band min/max/sum/count of valid pixels through the
    decode path (report_raster_dynamic_range / fill-bandwise statistics,
    reference lsma.py:799-839 / utils.py:629-654)."""
    import pyarrow as pa
    from unmixing_ray.sources import images
    from unmixing_ray.stages.decode import decode_batch
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus)

    def stats(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import tiles_to_ndarray
        dec = decode_batch(batch)
        arrays, uniform = tiles_to_ndarray(dec)
        nb = 6
        out = {}
        if uniform is not None:
            # fully vectorized across the batch's images
            a = uniform.reshape(uniform.shape[0], nb, -1)\
                .astype(np.int64)
            valid = a != -9999
            cnt = valid.sum(axis=2)
            s = np.where(valid, a, 0).sum(axis=2)
            mn = np.where(valid, a, np.iinfo(np.int64).max).min(axis=2)
            mx = np.where(valid, a, np.iinfo(np.int64).min).max(axis=2)
            mn = np.where(cnt > 0, mn, 0)
            mx = np.where(cnt > 0, mx, 0)
            for b in range(nb):
                out["b%d_min" % b] = mn[:, b]
                out["b%d_max" % b] = mx[:, b]
                out["b%d_sum" % b] = s[:, b]
                out["b%d_count" % b] = cnt[:, b]
        else:
            for b in range(nb):
                for stat in ("min", "max", "sum", "count"):
                    out["b%d_%s" % (b, stat)] = []
            for arr3 in arrays:
                arr = arr3.astype(np.int64).reshape(nb, -1)
                for b in range(nb):
                    v = arr[b][arr[b] != -9999]
                    vals = (int(v.min()), int(v.max()), int(v.sum()),
                            int(v.size)) if v.size else (0, 0, 0, 0)
                    for stat, val in zip(("min", "max", "sum", "count"),
                                         vals):
                        out["b%d_%s" % (b, stat)].append(val)
        cols = {"image_id": dec["image_id"]}
        for k, v in out.items():
            cols[k] = pa.array(np.asarray(v, dtype=np.int64))
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=32)


def q_spectral_indices(sf_dir):
    """Distributed NDVI + Tasseled Cap over the decode path: per-image
    NDVI>0.3 pixel count and floor(TC1-brightness sum) over valid pixels
    (reference transform.py:80-101, 146-182), verified against the
    corpus's inline-numpy ground truth."""
    import pyarrow as pa
    from unmixing_ray.kernels import spectral as sp
    from unmixing_ray.sources import images
    from unmixing_ray.stages.decode import decode_batch
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus)

    def indices(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import tiles_to_ndarray
        dec = decode_batch(batch)
        arrays, uniform = tiles_to_ndarray(dec)
        out = {"n_ndvi_pos": [], "tc1_sum_floor": []}
        # float64 copy of the published Crist (1985) brightness row:
        # the kernel table is float32 (reference parity) but the
        # oracle computes in float64, and float32(0.2043) != 0.2043
        tc1_row = np.array([0.2043, 0.4158, 0.5524, 0.5741, 0.3124,
                            0.2303])
        for i in range(dec.num_rows):
            arr = uniform[i] if uniform is not None else arrays[i]
            nd = sp.ndvi(arr)[0]
            valid = (arr[2] != -9999) & (arr[3] != -9999)
            n_pos = int(((nd > 0.3) & valid).sum())
            flat = arr.reshape(arr.shape[0], -1).astype(np.float64)
            tc1 = tc1_row @ flat
            v0 = flat[0] != -9999
            out["n_ndvi_pos"].append(n_pos)
            out["tc1_sum_floor"].append(int(np.floor(np.sum(tc1[v0]))))
        return pa.table({
            "image_id": dec["image_id"],
            "n_ndvi_pos": pa.array(out["n_ndvi_pos"], pa.int64()),
            "tc1_sum_floor": pa.array(out["tc1_sum_floor"], pa.int64()),
        })

    return ds.map_batches(indices, batch_format="pyarrow", batch_size=32)


def q_image_dedup_phash(sf_dir):
    from unmixing_ray.sources import images
    from unmixing_ray.stages.dedup import exact_dedup_images
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus, columns=["image_id", "phash"])
    return exact_dedup_images(ds)


def q_hull_simplify(sf_dir):
    """Exact Douglas–Peucker simplification of each image's hull ring
    (stages/hull.py:simplified_hulls): canonical chain split + integer
    cross²>eps²·|b−a|² test, iterative stack. Oracle: independent
    gift-wrap + RECURSIVE DP replay sidecar."""
    from unmixing_ray.stages import hull
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return hull.simplified_hulls(tiles, threshold=2000, eps=2)


def q_caption_lcs(sf_dir):
    """Caption LCS alignment inside exact-dup clusters
    (stages/dedup.py:caption_lcs_pairs): count combiner finds the n≥2
    phashes, the tiny hot set broadcasts into ONE filtered gather, and
    the exact iterative-DP LCS grades each (keeper, other) pair.
    Oracle: independent recursive-memo LCS replay sidecar."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages.dedup import caption_lcs_pairs
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus,
                            columns=["image_id", "phash", "caption"])
    return caption_lcs_pairs(ds)


def q_letterbox(sf_dir):
    """Uniform-border letterbox detection
    (stages/curate.py:letterbox_scores): exact constant-row/column run
    lengths per side, stateless decode pass; the NODATA strips
    register closed-form. Oracle: independent argmax-on-flags replay
    sidecar."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages.curate import letterbox_scores
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus,
                            columns=["image_id", "bytes", "w", "h",
                                     "fmt"])
    return letterbox_scores(ds)


def q_dhash_pairs(sf_dir):
    """Decode-derived dHash near-dup pairs
    (stages/dedup.py:image_dhash_pairs): 64-bit difference hash from
    decoded pixels + the exhaustive pigeonhole Hamming join — catches
    the planted copies AND their lossy-codec twins. Oracle:
    independent dhash replay + full O(n²) popcount sidecar."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages.dedup import image_dhash_pairs
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus,
                            columns=["image_id", "bytes", "w", "h",
                                     "fmt"])
    return image_dhash_pairs(ds, max_hamming=10)


def q_caption_consistency(sf_dir):
    """Caption-consistency audit over exact-duplicate image clusters
    (stages/dedup.py:caption_consistency): per phash cluster the image
    count, distinct-caption count, canonical keeper and a consistency
    flag — combiner before the ONE groupby(phash). Oracle: direct SQL
    over the corpus images table."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages.dedup import caption_consistency
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus,
                            columns=["image_id", "phash", "caption"])
    return caption_consistency(ds)


def q_spatial_split(sf_dir):
    """Spatially-blocked train/val/test split
    (stages/rollup.py:spatial_block_split): folds assigned per coarse
    cell BLOCK so autocorrelated neighbor tiles never straddle splits;
    md5-threshold discipline of split_assign, stateless one pass over
    the decode-derived tile cells. Oracle: the same block arithmetic +
    CASE over the closed-form tile-lattice sidecar."""
    from unmixing_ray import cellindex
    from unmixing_ray.stages import rollup

    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        return pa.table({
            "tile_id": batch["tile_id"],
            "cell_ix": pa.array(ix, pa.int64()),
            "cell_iy": pa.array(iy, pa.int64())})

    cells = tiles.map_batches(project, batch_format="pyarrow")
    return rollup.spatial_block_split(cells)


def q_decode_invariants(sf_dir):
    """Per-row decode invariant (rows-only check): lossless exact or
    PSNR >= 40 dB, plus caption passthrough."""
    import pyarrow as pa
    from unmixing_ray.codecs import LOSSLESS, decode_image, encode_image, \
        psnr
    from unmixing_ray.sources import images
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus)

    def check(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "fmt": [], "psnr_ok": [], "caption": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            arr = decode_image(batch["bytes"][i].as_py(), fmt, w, h)
            if fmt in LOSSLESS:
                # lossless: encode→decode round trip must be exact
                rt = decode_image(encode_image(arr, fmt), fmt, w, h)
                ok = bool(np.array_equal(rt, arr))
            else:
                # lossy: re-encoding the reconstruction must stay within
                # the PSNR >= 40 dB invariant
                rt = decode_image(encode_image(arr, fmt), fmt, w, h)
                ok = bool(psnr(arr, rt) >= 40.0)
            out["image_id"].append(batch["image_id"][i].as_py())
            out["fmt"].append(fmt)
            out["psnr_ok"].append(ok)
            out["caption"].append(batch["caption"][i].as_py())
        return pa.table({k: pa.array(v) for k, v in out.items()})

    return ds.map_batches(check, batch_format="pyarrow", batch_size=32)


def _summarize_abundance_u4(ab):
    """Per-tile abundance band means in 1e-4 units (float32 storage
    semantics), caption preserved."""
    import pyarrow as pa

    def summarize(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import binary_views
        values, offsets = binary_views(batch["abundance"], np.float32)
        qs = batch["q"].to_numpy()
        rows = {"mean_ab0_u4": [], "mean_ab1_u4": [], "mean_ab2_u4": []}
        for i in range(batch.num_rows):
            a = values[offsets[i]:offsets[i + 1]].astype(np.float64)\
                .reshape((int(qs[i]), -1))
            for b in range(3):
                rows["mean_ab%d_u4" % b].append(
                    int(np.floor(a[b].mean() * 10_000)))
        return pa.table({
            "tile_id": batch["tile_id"],
            "caption": batch["caption"],
            "q": batch["q"].cast(pa.int64()),
            "mean_ab0_u4": pa.array(rows["mean_ab0_u4"], pa.int64()),
            "mean_ab1_u4": pa.array(rows["mean_ab1_u4"], pa.int64()),
            "mean_ab2_u4": pa.array(rows["mean_ab2_u4"], pa.int64()),
        })

    return ab.map_batches(summarize, batch_format="pyarrow")


def q_unmix_abundance(sf_dir):
    """FCLS abundance against the corpus's TRUE endmember spectra (the
    reference's known-library use case, lsma.py FCLSAbundanceMapper) run
    as the engine's actor-pool stage over raw reflectance tiles — hard
    oracle: the corpus sidecar computes the same means with an
    independent geometric FCLS solver at generation time."""
    import json as _json
    from unmixing_ray.stages import unmix as unmix_stage
    corpus, tiles = _tiles_ds(sf_dir)
    man = _json.loads(open(os.path.join(corpus, "manifest.json")).read())
    U = np.asarray(man["endmembers"], dtype=np.float64)
    ab = unmix_stage.unmix(tiles, U, input_col="pixels", n_dims=None,
                           dtype=np.int16)
    return _summarize_abundance_u4(ab)


def q_flagship_abundance(sf_dir):
    """Flagship MNF→NFINDR→FCLS invariant summary. The induced
    endmembers are corpus-dependent (MNF-sign-sensitive), so exact
    abundance values are not generation-time predictable — but the FCLS
    simplex contract IS: every expected tile yields exactly one
    abundance row with q=3, 1024 pixels, zero sum-to-one violations and
    zero range violations, caption preserved. Hash-checked against the
    tile sidecar (VERDICT r02 item 7)."""
    import pyarrow as pa
    import ray.data
    from unmixing_ray.pipelines import flagship
    from unmixing_ray.sources import synth
    corpus = _corpus(sf_dir)
    out = _out_dir("flagship", sf_dir)
    res = flagship.run_flagship(
        corpus, out, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
        q=3, k_knn=0)
    ab = ray.data.read_parquet(res["abundances_dir"],
                               file_extensions=["parquet"])

    def invariants(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import binary_views
        values, offsets = binary_views(batch["abundance"], np.float32)
        qs = batch["q"].to_numpy()
        rows = {"n_px": [], "n_sum_viol": [], "n_range_viol": []}
        for i in range(batch.num_rows):
            a = values[offsets[i]:offsets[i + 1]].astype(np.float64)\
                .reshape((int(qs[i]), -1))
            rows["n_px"].append(a.shape[1])
            rows["n_sum_viol"].append(
                int((np.abs(a.sum(axis=0) - 1.0) > 1e-3).sum()))
            rows["n_range_viol"].append(
                int(((a < -1e-6) | (a > 1.0 + 1e-6)).sum()))
        return pa.table({
            "tile_id": batch["tile_id"],
            "caption": batch["caption"],
            "q": batch["q"].cast(pa.int64()),
            "n_px": pa.array(rows["n_px"], pa.int64()),
            "n_sum_viol": pa.array(rows["n_sum_viol"], pa.int64()),
            "n_range_viol": pa.array(rows["n_range_viol"], pa.int64()),
        })

    return ab.map_batches(invariants, batch_format="pyarrow")


def q_composite_cells(sf_dir):
    """Multi-date composite over synthetic dates (rows-only): per tile,
    three deterministic 'dates' composited per band with max*/median
    reducers (reference composite3 semantics)."""
    import pyarrow as pa
    from unmixing_ray.kernels import composite as ck
    from unmixing_ray.stages.decode import tiles_to_ndarray
    _c, tiles = _tiles_ds(sf_dir)

    def comp(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        rows = {"tile_id": [], "comp_checksum_x6": []}
        n = batch.num_rows
        for i in range(n):
            a = uniform[i] if uniform is not None else arrays[i]
            dates = [a, np.where(a == -9999, -9999, a + 10),
                     np.where(a == -9999, -9999, a - 10)]
            out = ck.composite3(
                ("max*", "median", "mean*", "min*", "median", "max*"),
                *dates, normalize=None)
            # every reduced value is a multiple of 1/6, so x6 rounds to
            # an exact integer on both engine and oracle sides
            rows["tile_id"].append(batch["tile_id"][i].as_py())
            rows["comp_checksum_x6"].append(
                int(np.rint(np.where(out == -9999, 0, out).sum() * 6.0)))
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    return tiles.map_batches(comp, batch_format="pyarrow", batch_size=64)


# ---------------------------------------------------------------------------
# engine-generality queries over the provided TPC-H-ish tables

def q_tpch_q1(sf_dir):
    """Pricing summary with exact integer cent-scaled sums."""

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        price_c = np.rint(df["l_extendedprice"].to_numpy() * 100)\
            .astype(np.int64)
        disc_c = np.rint(df["l_discount"].to_numpy() * 100)\
            .astype(np.int64)
        tax_c = np.rint(df["l_tax"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty": qty, "price_c": price_c,
            "disc_price": price_c * (100 - disc_c),
            "charge": price_c * (100 - disc_c) * (100 + tax_c),
            "one": np.ones(len(df), dtype=np.int64),
        })
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False)\
            .sum()

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax"])
    partials = ds.map_batches(agg, batch_format="pandas").to_pandas()
    out = partials.groupby(["l_returnflag", "l_linestatus"],
                           as_index=False).sum()
    out = out.rename(columns={
        "qty": "sum_qty", "price_c": "sum_base_price_c",
        "disc_price": "sum_disc_price_c2", "charge": "sum_charge_c4",
        "one": "count_order"})
    return out


def q_revenue_by_nation(sf_dir):
    """lineitem ⨝ supplier ⨝ nation with broadcast small sides (the
    broadcast hash-join pattern), revenue in exact cent^2 units."""
    sup = _read(sf_dir, "supplier").to_pandas()
    nat = _read(sf_dir, "nation").to_pandas()
    sup_nat = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.rint(df["l_extendedprice"].to_numpy() * 100)\
            .astype(np.int64)
        disc_c = np.rint(df["l_discount"].to_numpy() * 100)\
            .astype(np.int64)
        nation = df["l_suppkey"].map(
            lambda s: nat_name[sup_nat[s]])
        g = pd.DataFrame({
            "n_name": nation,
            "revenue_c2": price_c * (100 - disc_c),
            "one": np.ones(len(df), dtype=np.int64)})
        return g.groupby("n_name", as_index=False).sum()

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    partials = ds.map_batches(agg, batch_format="pandas").to_pandas()
    out = partials.groupby("n_name", as_index=False).sum()
    return out.rename(columns={"one": "n_items"})


def q_events_window(sf_dir):
    """Tumbling 1-hour windows per event_type: count + exact min/max."""

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (df["ts"].astype("int64") // 1_000_000 // 3600)\
            .astype("int64")
        g = pd.DataFrame({
            "event_type": df["event_type"], "hour_bucket": bucket,
            "value": df["value"]})
        out = g.groupby(["event_type", "hour_bucket"]).agg(
            n=("value", "size"), min_value=("value", "min"),
            max_value=("value", "max")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    partials = ds.map_batches(agg, batch_format="pandas").to_pandas()
    out = partials.groupby(["event_type", "hour_bucket"],
                           as_index=False).agg(
        n=("n", "sum"), min_value=("min_value", "min"),
        max_value=("max_value", "max"))
    return out


def q_orders_topk(sf_dir):
    """Top 10 orders by o_totalprice (sort + limit), exact cents."""

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "total_c": np.rint(df["o_totalprice"].to_numpy() * 100)
                .astype(np.int64)})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    top = ds.map_batches(to_cents, batch_format="pandas")\
        .sort(["total_c", "o_orderkey"], descending=[True, False])\
        .limit(10)
    return top.to_pandas()


def q_events_sessions(sf_dir):
    """Gap-based sessionization (stream-shaped op over the events log)."""
    from unmixing_ray.stages import events as ev
    return ev.sessionize(
        _read(sf_dir, "events", columns=["user_id", "event_id", "ts"]))


def q_events_asof_forward(sf_dir):
    """Forward as-of join with tolerance (next-click attribution within
    one hour): the direction/tolerance variants of the key-partitioned
    sorted-merge join (stages/events.py:asof_join). The 1-hour bound is
    non-vacuous — matches beyond it exist and are dropped."""
    from unmixing_ray.stages import events as ev
    return ev.asof_join(_read(sf_dir, "events"), direction="forward",
                        tolerance_us=3_600_000_000)


def q_events_asof(sf_dir):
    """Distributed as-of join (key-partitioned sorted merge): each
    purchase matched to the user's most recent prior click. One of the
    'custom operators Ray Data lacks' (as-of/range join); hard DuckDB
    lateral-join oracle."""
    from unmixing_ray.stages import events as ev
    return ev.asof_join(_read(sf_dir, "events"))


def q_events_sliding(sf_dir):
    """Trailing sliding-window aggregate (RANGE-frame semantics) per
    event_type: count + exact cent sum over [ts - 1h, ts] for every
    event. Prefix-sum + searchsorted per co-partitioned series; hard
    DuckDB window-frame oracle."""
    from unmixing_ray.stages import events as ev
    return ev.sliding_window(_read(sf_dir, "events"))


def q_events_lag(sf_dir):
    """Per-key window functions (ROW_NUMBER / LAG family): per user in
    (ts, event_id) order, the row number, the microsecond gap to the
    previous event, and the previous event's type. Key-partitioned
    vectorized shifts (stages/events.py:lag_delta); DuckDB window
    oracle."""
    from unmixing_ray.stages import events as ev
    return ev.lag_delta(_read(sf_dir, "events"))


def q_events_session_join(sf_dir):
    """Interval (range) join without a broadcast: sessionize the log,
    then tag-union + groupby(user) + searchsorted matches every purchase
    event to its enclosing session interval
    (stages/events.py:interval_join)."""
    from unmixing_ray.stages import events as ev
    return ev.session_lookup(_read(sf_dir, "events"))


def q_retention_cohorts(sf_dir):
    """Cohort retention over the event log
    (stages/events.py:retention_cohorts): per-batch (user, day) dedup
    combiner -> one groupby(user) -> tiny cohort-day count shuffle;
    exact int64 days-since-epoch."""
    from unmixing_ray.stages import events as ev
    return ev.retention_cohorts(_read(sf_dir, "events"))


def q_funnel_conversions(sf_dir):
    """Within-session view->purchase funnel per user
    (stages/events.py:funnel_conversions): one groupby(user) exchange,
    conversion = strictly-earlier-microsecond compare inside the
    session (gap rule shared with sessionize)."""
    from unmixing_ray.stages import events as ev
    return ev.funnel_conversions(_read(sf_dir, "events"))


def q_user_top_event(sf_dir):
    """Grouped MODE (stages/relational.py:grouped_mode): each user's
    most frequent event type with a deterministic (count desc, value
    asc) tiebreak; two-level count combiner."""
    from unmixing_ray.stages import relational
    return relational.grouped_mode(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        "user_id", "event_type", alias="top_event")


def q_rolling_active_users(sf_dir):
    """Trailing 2-day distinct active users
    (stages/events.py:rolling_active_users): (user, day) dedup combiner
    -> window replication of deduped pairs -> exact count-distinct;
    interior windows only. window_days=2 keeps counts non-saturated at
    oracle scales (7-day windows cover every user every week)."""
    from unmixing_ray.stages import events as ev
    return ev.rolling_active_users(_read(sf_dir, "events"),
                                   window_days=2)


def q_transition_counts(sf_dir):
    """Within-session event-type transition matrix (Markov sequence
    analytics; stages/events.py:transition_counts) — one groupby(user)
    exchange, per-user pre-counted partials, tiny type-pair merge."""
    from unmixing_ray.stages import events as ev
    return ev.transition_counts(_read(sf_dir, "events"))


def q_value_histogram(sf_dir):
    """Equi-width ANALYZE histogram of lineitem quantities
    (stages/relational.py:value_histogram): per-batch bincount partials
    (one row per non-empty bin per batch through the shuffle)."""
    from unmixing_ray.stages import relational
    return relational.value_histogram(
        _read(sf_dir, "lineitem", columns=["l_quantity"]),
        "l_quantity", lo=1, hi=50, bins=10)


def q_lineitem_rollup(sf_dir):
    """GROUP BY ROLLUP grouping sets in one shuffle: exact cent sums +
    counts for (returnflag, linestatus), (returnflag,) and the grand
    total, via a per-batch all-grouping-sets combiner
    (stages/relational.py:rollup_sums)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    return relational.rollup_sums(
        ds, ["l_returnflag", "l_linestatus"], "l_extendedprice")


def q_cell_rollup(sf_dir):
    """Hierarchical cell rollup (H3/S2 parent aggregation): tile counts
    at cell levels L..L-3 in ONE shuffle — the per-batch combiner emits
    parent-cell partials for every level (stages/rollup.py). Oracle is
    closed-form bit arithmetic over the tile-lattice sidecar."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import rollup
    _c, tiles = _tiles_ds(sf_dir)
    return rollup.cell_rollup(tiles, base_level=synth.CELL_LEVEL,
                              steps=(0, 1, 2, 3))


def q_customer_orders(sf_dir):
    """orders ⨝ customer (broadcast small side) → per-market-segment
    exact cent totals."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        total_c = np.rint(df["o_totalprice"].to_numpy() * 100)\
            .astype(np.int64)
        g = pd.DataFrame({
            "c_mktsegment": df["o_custkey"].map(seg),
            "total_c": total_c,
            "one": np.ones(len(df), dtype=np.int64)})
        return g.groupby("c_mktsegment", as_index=False).sum()

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(agg, batch_format="pandas").to_pandas()
    out = out.groupby("c_mktsegment", as_index=False).sum()
    return out.rename(columns={"one": "n_orders"})


def q_orders_join_lineitem(sf_dir):
    """orders ⨝ lineitem with BOTH sides large — the partitioned
    shuffle hash join (stages/relational.py:hash_join), then per-order-
    priority exact totals."""
    from ray.data.aggregate import Count, Sum
    from unmixing_ray.stages import relational
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "okey"}),
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_quantity"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"],
            "qty_c": np.rint(df["l_quantity"].to_numpy() * 100)
            .astype(np.int64)}), batch_format="pandas")
    joined = relational.hash_join(orders, li, "okey", how="inner")
    return joined.groupby("o_orderpriority").aggregate(
        Sum("qty_c", alias_name="sum_qty_c"),
        Count(alias_name="n_rows")).map_batches(
        lambda df: df.astype({"sum_qty_c": "int64", "n_rows": "int64"}),
        batch_format="pandas")


def q_tpch_q3(sf_dir):
    """TPC-H Q3 shape — a THREE-table distributed plan composed from
    the engine's relational operators: semi_join (customer segment
    gate, keys-only exchange) → hash_join (orders ⨝ lineitem, both
    sides large, partitioned tag-union) → exact-cents groupby →
    global top-10 by revenue (sort+limit on the already-aggregated
    per-order rows). Date filters pushed into the per-batch maps."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    cutoff = pd.Timestamp("1995-03-15")

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])\
        .filter(expr="c_mktsegment == 'BUILDING'").map_batches(
        lambda df: pd.DataFrame({"ckey": df["c_custkey"]}),
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"], "ckey": df["o_custkey"],
        })[df["o_orderdate"].to_numpy() < cutoff.to_numpy()],
        batch_format="pandas")
    orders = relational.semi_join(orders, cust, "ckey")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"],
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64)),
        })[df["l_shipdate"].to_numpy() > cutoff.to_numpy()],
        batch_format="pandas")
    joined = relational.hash_join(
        orders.map_batches(lambda df: df[["okey"]],
                           batch_format="pandas"),
        li, "okey", how="inner")
    per_order = joined.groupby("okey").aggregate(
        Sum("rev_c2", alias_name="revenue_c2"))
    return per_order.map_batches(
        lambda df: df.astype({"revenue_c2": "int64"}),
        batch_format="pandas")\
        .sort(["revenue_c2", "okey"], descending=[True, False])\
        .limit(10).to_pandas()


def q_tpch_q5(sf_dir):
    """TPC-H Q5 shape — a SIX-table plan mixing both join strategies:
    region→nation (driver-tiny) prunes to one region's nations;
    customer (filtered to those nations) hash-joins orders (both sides
    large); lineitem hash-joins in; supplier (small) is a BROADCAST
    dict; the local-supplier condition c_nationkey = s_nationkey is an
    equality side-condition applied vectorized after the broadcast
    lookup; exact-cents groupby by nation name."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    lo = pd.Timestamp("1996-01-01").to_numpy()
    hi = pd.Timestamp("1997-01-01").to_numpy()

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    asia_rk = int(region[region["r_name"] == "ASIA"]
                  ["r_regionkey"].iloc[0])
    asia = nation[nation["n_regionkey"] == asia_rk]
    nkeys = set(int(k) for k in asia["n_nationkey"])
    nname = dict(zip(asia["n_nationkey"].astype(int),
                     asia["n_name"]))
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = dict(zip(supp["s_suppkey"].astype(int),
                     supp["s_nationkey"].astype(int)))

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame({
            "ckey": df["c_custkey"],
            "c_nat": df["c_nationkey"].astype("int64"),
        })[df["c_nationkey"].astype(int).isin(nkeys).to_numpy()],
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"], "ckey": df["o_custkey"],
        })[((df["o_orderdate"].to_numpy() >= lo)
            & (df["o_orderdate"].to_numpy() < hi))],
        batch_format="pandas")
    ord_cn = relational.hash_join(orders, cust, "ckey", how="inner")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"],
            "skey": df["l_suppkey"].astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64))}), batch_format="pandas")
    def proj(df: pd.DataFrame) -> pa.Table:
        # declared Arrow schema: empty blocks keep their column names,
        # so the downstream hash_join can read schema() without hitting
        # a nameless empty-pandas block first
        return pa.table({
            "okey": pa.array(df["okey"].astype("int64"), pa.int64()),
            "c_nat": pa.array(df["c_nat"].astype("int64"),
                              pa.int64())})

    joined = relational.hash_join(
        ord_cn.map_batches(proj, batch_format="pandas"),
        li, "okey", how="inner", left_cols=["okey", "c_nat"])

    def local_supplier(df: pd.DataFrame) -> pd.DataFrame:
        s_n = df["skey"].map(s_nat).astype("int64")
        keep = (s_n.to_numpy() == df["c_nat"].to_numpy())
        out = df[keep].copy()
        out["n_name"] = out["c_nat"].map(nname)
        return out[["n_name", "rev_c2"]]

    per_nation = joined.map_batches(local_supplier,
                                    batch_format="pandas")\
        .groupby("n_name").aggregate(
        Sum("rev_c2", alias_name="revenue_c2"))
    return per_nation.map_batches(
        lambda df: df.astype({"revenue_c2": "int64"}),
        batch_format="pandas")


def q_lineitem_rank(sf_dir):
    """Full per-key ANSI ranking with ties — rank() (gaps) and
    dense_rank() (no gaps) per return flag ordered by quantity desc
    (stages/relational.py:grouped_rank: vectorized searchsorted rank
    assignment, deterministic WITHOUT a tiebreak because ties share
    ranks by definition). Quantities are small integers, so tie groups
    are huge — the tie semantics are genuinely exercised."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_orderkey", "l_linenumber",
                        "l_quantity"]).map_batches(
        lambda df: pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_orderkey": df["l_orderkey"],
            "l_linenumber": df["l_linenumber"].astype("int64"),
            "qty": np.rint(df["l_quantity"].to_numpy())
            .astype(np.int64)}), batch_format="pandas")
    return relational.grouped_rank(
        ds, "l_returnflag", "qty", descending=True,
        keep=["l_orderkey", "l_linenumber"])


def q_big_orders(sf_dir):
    """TPC-H Q18 shape (HAVING + join back): per-order quantity sums
    with a combiner before the groupby, HAVING-filtered to the heavy
    tail, then the small qualifying set broadcast back onto orders
    (aggregate → broadcast-back — the result of a selective HAVING is
    small BY CONSTRUCTION, so the join-back needs no second shuffle)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_quantity"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"],
            "qty_c": np.rint(df["l_quantity"].to_numpy() * 100)
            .astype(np.int64)}).groupby("okey", as_index=False).sum(),
        batch_format="pandas")
    per_order = li.groupby("okey").aggregate(
        Sum("qty_c", alias_name="qty_c")).map_batches(
        lambda df: df.astype({"qty_c": "int64"})
        [df["qty_c"].to_numpy() > 25_000], batch_format="pandas")
    qual = per_order.to_pandas()
    qmap = dict(zip(qual["okey"].astype(int),
                    qual["qty_c"].astype(int)))
    qref = _ray.put(qmap)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        qm = _ray.get(qref)
        keep = df["o_orderkey"].astype(int).isin(qm.keys()).to_numpy()
        out = df[keep]
        return pd.DataFrame({
            "okey": out["o_orderkey"].astype("int64"),
            "o_custkey": out["o_custkey"].astype("int64"),
            "total_c": np.rint(out["o_totalprice"].to_numpy() * 100)
            .astype(np.int64),
            "qty_c": out["o_orderkey"].astype(int).map(qm)
            .astype("int64")})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.map_batches(attach, batch_format="pandas")


def q_orders_running_total(sf_dir):
    """Ordered window function SUM OVER (PARTITION BY customer ORDER BY
    date, key): per-customer cumulative exact-cents order spend
    (stages/relational.py:running_total — one groupby(key) shuffle,
    per-group mergesort + vectorized cumsum)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate",
                        "o_totalprice"])
    out = relational.running_total(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"], "o_totalprice",
        scale=100, alias="running_c")
    return out.map_batches(
        lambda df: df[["o_custkey", "o_orderkey", "running_c"]],
        batch_format="pandas")


def q_orders_ntile(sf_dir):
    """ANSI distribution window functions — ntile(7), percent_rank()
    and cume_dist() per order priority
    (stages/relational.py:grouped_ntile): ntile on the TOTAL order
    (coarsened price DESC, key ASC) with the ANSI first-r-buckets-
    larger rule; percent_rank/cume_dist on the coarsened price alone,
    whose $1000 buckets create real tie groups. The two ratios are
    float64 divisions of exact int64 counts, so the DuckDB window
    replay is bit-identical."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderkey",
                        "o_totalprice"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "okey": df["o_orderkey"].astype("int64"),
            "val_i": np.rint(df["o_totalprice"].to_numpy() * 100)
            .astype(np.int64) // 100_000}), batch_format="pandas")
    return relational.grouped_ntile(
        ds, "o_orderpriority", "val_i", ["okey"], n=7)


def q_lineitem_setops(sf_dir):
    """Distributed multiset EXCEPT ALL / INTERSECT ALL
    (stages/relational.py:multiset_ops): the 1996 vs 1997 shipment
    multisets of (returnflag, quantity) rows compared with exact
    multiset arithmetic — per-batch count combiners bound the exchange
    to two int64 per distinct key per batch; the oracle runs DuckDB's
    real EXCEPT ALL / INTERSECT ALL and groups the surviving rows."""
    from unmixing_ray.stages import relational

    def year_rows(y):
        lo = pd.Timestamp(f"{y}-01-01").to_numpy()
        hi = pd.Timestamp(f"{y + 1}-01-01").to_numpy()
        return _read(sf_dir, "lineitem",
                     columns=["l_returnflag", "l_quantity",
                              "l_shipdate"]).map_batches(
            lambda df: pd.DataFrame({
                "flag": df["l_returnflag"],
                "qty": np.rint(df["l_quantity"].to_numpy())
                .astype(np.int64),
            })[((df["l_shipdate"].to_numpy() >= lo)
                & (df["l_shipdate"].to_numpy() < hi))],
            batch_format="pandas")

    return relational.multiset_ops(
        year_rows(1996), year_rows(1997), ["flag", "qty"])


def q_tpch_q17(sf_dir):
    """TPC-H Q17 shape (correlated scalar subquery decorrelated):
    small-quantity revenue for one brand's small parts. The part
    filter is driver-tiny and broadcast; pass 1 computes per-part
    (n, Σqty) with a combiner before a groupby bounded by the part
    count; the per-part thresholds broadcast back onto pass 2, whose
    predicate qty < avg/5 is evaluated as the EXACT integer
    cross-multiplication 5·qty·n < Σqty (no float division anywhere);
    the qualifying rows reduce to one exact-cents row."""
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"])\
        .filter(expr="p_brand == 'Brand#23' and p_size < 15")\
        .to_pandas()
    pkeys = (set() if part.empty
             else set(int(k) for k in part["p_partkey"]))

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_partkey"].astype(int).isin(pkeys).to_numpy()
        g = df[keep]
        return pd.DataFrame({
            "pkey": g["l_partkey"].astype("int64"),
            "n": np.int64(1),
            "sum_qty": np.rint(g["l_quantity"].to_numpy())
            .astype(np.int64),
        }).groupby("pkey", as_index=False).sum()

    from ray.data.aggregate import Sum
    th = _read(sf_dir, "lineitem", columns=li_cols)\
        .map_batches(pass1, batch_format="pandas")\
        .groupby("pkey").aggregate(
        Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty"))\
        .to_pandas()
    n_map = dict(zip(th["pkey"].astype(int), th["n"].astype(int)))
    s_map = dict(zip(th["pkey"].astype(int), th["sum_qty"].astype(int)))

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["l_partkey"].astype(int).isin(pkeys).to_numpy()
        g = df[keep]
        qty = np.rint(g["l_quantity"].to_numpy()).astype(np.int64)
        n = g["l_partkey"].astype(int).map(n_map)\
            .to_numpy(dtype=np.int64)
        s = g["l_partkey"].astype(int).map(s_map)\
            .to_numpy(dtype=np.int64)
        small = 5 * qty * n < s
        ep_c = np.rint(g["l_extendedprice"].to_numpy() * 100)\
            .astype(np.int64)
        return pd.DataFrame({
            "n_small_lines": [np.int64(small.sum())],
            "total_c": [np.int64(ep_c[small].sum())]})

    agg = _read(sf_dir, "lineitem", columns=li_cols)\
        .map_batches(pass2, batch_format="pandas")\
        .map_batches(lambda df: df.assign(one=np.int64(1)),
                     batch_format="pandas")\
        .groupby("one").aggregate(
        Sum("n_small_lines", alias_name="n_small_lines"),
        Sum("total_c", alias_name="total_c")).to_pandas()
    if agg.empty:
        agg = pd.DataFrame({"n_small_lines": [0], "total_c": [0]})
    return pd.DataFrame({
        "n_parts": [np.int64(len(pkeys))],
        "n_small_lines": agg["n_small_lines"].astype("int64"),
        "total_c": agg["total_c"].astype("int64")})


def q_tpch_q10(sf_dir):
    """TPC-H Q10 shape (returned-item top customers): a four-table
    plan — per-order R-flag revenue combiner → hash_join with the
    quarter's orders (both sides large) → exact-cents groupby per
    customer → global top-20 (sort+limit on the aggregated rows) →
    the 20 winners' attributes gathered by a driver-tiny broadcast
    lookup against customer and nation."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    lo = pd.Timestamp("1995-10-01").to_numpy()
    hi = pd.Timestamp("1996-01-01").to_numpy()

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "ckey": df["o_custkey"].astype("int64"),
        })[((df["o_orderdate"].to_numpy() >= lo)
            & (df["o_orderdate"].to_numpy() < hi))],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64)),
        })[(df["l_returnflag"] == "R").to_numpy()]
        .groupby("okey", as_index=False).sum(), batch_format="pandas")
    joined = relational.hash_join(orders, li, "okey", how="inner",
                                  left_cols=["okey", "ckey"])
    top = joined.groupby("ckey").aggregate(
        Sum("rev_c2", alias_name="revenue_c2")).map_batches(
        lambda df: df.astype({"revenue_c2": "int64",
                              "ckey": "int64"}),
        batch_format="pandas")\
        .sort(["revenue_c2", "ckey"], descending=[True, False])\
        .limit(20).to_pandas()

    ckeys = set(int(k) for k in top["ckey"])
    cust = _read(sf_dir, "customer").map_batches(
        lambda df: df[df["c_custkey"].astype(int).isin(ckeys)
                      .to_numpy()], batch_format="pandas").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"]))
    cust = cust.set_index(cust["c_custkey"].astype(int))
    out = top.copy()
    out["c_name"] = [cust.loc[k, "c_name"] for k in out["ckey"]]
    out["n_name"] = [nname[int(cust.loc[k, "c_nationkey"])]
                     for k in out["ckey"]]
    out["acctbal_c"] = [
        np.int64(np.rint(cust.loc[k, "c_acctbal"] * 100))
        for k in out["ckey"]]
    return out[["ckey", "c_name", "n_name", "acctbal_c", "revenue_c2"]]


def q_user_streaks(sf_dir):
    """Gaps-and-islands: per-user consecutive-day activity streaks
    (stages/events.py:user_streaks — (user, day) dedup combiner, one
    user-key shuffle, vectorized sorted-diff island split). Oracle:
    DuckDB's day − row_number() islands trick."""
    from unmixing_ray.stages import events as estage
    return estage.user_streaks(
        _read(sf_dir, "events", columns=["user_id", "ts"]))


def q_orders_snapshot_diff(sf_dir):
    """Keyed snapshot diff (CDC between two table versions —
    stages/relational.py:snapshot_diff, tag-union with a loud
    key-uniqueness contract): per-customer 1995 vs 1996 order COUNTS,
    so all four statuses are non-vacuous (equal counts → same)."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational

    def year_counts(y):
        lo = pd.Timestamp(f"{y}-01-01").to_numpy()
        hi = pd.Timestamp(f"{y + 1}-01-01").to_numpy()
        return _read(sf_dir, "orders",
                     columns=["o_custkey", "o_orderdate"]).map_batches(
            lambda df: pd.DataFrame({
                "ckey": df["o_custkey"].astype("int64"),
                "n": np.int64(1),
            })[((df["o_orderdate"].to_numpy() >= lo)
                & (df["o_orderdate"].to_numpy() < hi))]
            .groupby("ckey", as_index=False).sum(),
            batch_format="pandas").groupby("ckey").aggregate(
            Sum("n", alias_name="n")).map_batches(
            lambda df: df.astype({"ckey": "int64", "n": "int64"}),
            batch_format="pandas")

    return relational.snapshot_diff(
        year_counts(1995), year_counts(1996), "ckey", "n")


def q_sequence_match(sf_dir):
    """Ordered 3-step sequence match (MATCH_RECOGNIZE-lite) — sessions
    containing view -> click -> purchase as a strict-time subsequence,
    with the greedy earliest-feasible step timestamps
    (stages/events.py:sequence_match — one user-key shuffle,
    vectorized per-session scan). Oracle: sessionize-and-chain
    min-pick SQL with identical greedy semantics."""
    from unmixing_ray.stages import events as estage
    return estage.sequence_match(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "event_id", "event_type"]),
        gap_s=86400)


def q_events_twap(sf_dir):
    """Per-user time-weighted average (TWAP) ingredients
    (stages/events.py:time_weighted_avg — value held until the next
    event, exact cents·µs integers). Oracle: DuckDB lead() window
    with identical integer math."""
    from unmixing_ray.stages import events as estage
    return estage.time_weighted_avg(
        _read(sf_dir, "events",
              columns=["user_id", "ts", "value", "event_id"]))


def q_pagerank(sf_dir):
    """Fixed-point PageRank, 3 exact integer iterations over the part
    co-purchase graph (stages/relational.py:pagerank_iters — one
    partitioned hash join + one groupby sum per message-passing
    round; no float ever enters, so the DuckDB replay of the
    iterations as stacked CTEs hash-matches bit for bit)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = relational.basket_pairs(
        ds, "l_orderkey", "l_partkey", min_support=1).map_batches(
        lambda df: df[["a", "b"]].astype("int64"),
        batch_format="pandas")
    return relational.pagerank_iters(edges, iters=3)


def q_cell_bfs(sf_dir):
    """Depth-capped BFS hop distance over the occupied tile-cell
    LATTICE from its min-packed-key corner
    (stages/relational.py:bfs_levels — driver-sequenced rounds, every
    round a distributed frontier⨝edges hash join + tag-union
    anti-join of the visited set). Nodes are distinct occupied cells
    packed ix·2²¹+iy; arcs connect 4-neighbors that are BOTH occupied
    (a semi-join against the node set), so holes in the lattice bend
    the frontier. Oracle: a DuckDB recursive CTE over the
    tiles_expected sidecar."""
    import ray.data
    from unmixing_ray import cellindex
    from unmixing_ray.stages import relational
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def nodes_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        return pd.DataFrame({"v": np.unique(pk)})

    from ray.data.aggregate import Count
    nodes = tiles.map_batches(nodes_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Count()).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64")}),
        batch_format="pandas").materialize()

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame({
            "s": np.concatenate([v, v]),
            "t": np.concatenate([v + (np.int64(1) << 21), v + 1])})

    half = relational.semi_join(
        nodes.map_batches(cands, batch_format="pandas"),
        nodes, "t", right_key="v")
    edges = half.union(half.map_batches(
        lambda df: pd.DataFrame({"s": df["t"].astype("int64"),
                                 "t": df["s"].astype("int64")}),
        batch_format="pandas"))
    seed_v = int(nodes.min("v"))
    seeds = ray.data.from_items([{"v": seed_v}])
    out = relational.bfs_levels(edges, seeds, max_depth=8)
    return out.map_batches(
        lambda df: df.astype({"v": "int64", "level": "int64"}),
        batch_format="pandas")


def q_cell_sssp(sf_dir):
    """Capped Bellman-Ford shortest path over the occupied tile-cell
    lattice (stages/relational.py:sssp_rounds — per round ONE
    distributed frontier⨝edges hash join + a groupby-min label merge).
    Arc weight = 1 + (target_ix + target_iy) mod 5 (deterministic,
    SQL-replayable); after 6 rounds dist = exact min over ≤6-hop
    walks, which a DuckDB recursive CTE enumerates identically.
    Oracle: recursive walk enumeration over the tiles_expected
    sidecar."""
    import ray.data
    from unmixing_ray import cellindex
    from unmixing_ray.stages import relational
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def nodes_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        return pd.DataFrame({"v": np.unique(pk)})

    from ray.data.aggregate import Count
    nodes = tiles.map_batches(nodes_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Count()).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64")}),
        batch_format="pandas").materialize()

    def cands(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame({
            "s": np.concatenate([v, v]),
            "t": np.concatenate([v + (np.int64(1) << 21), v + 1])})

    half = relational.semi_join(
        nodes.map_batches(cands, batch_format="pandas"),
        nodes, "t", right_key="v")

    def weighted(df: pd.DataFrame) -> pd.DataFrame:
        sv = df["s"].to_numpy(np.int64)
        tv = df["t"].to_numpy(np.int64)
        out = pd.DataFrame({
            "s": np.concatenate([sv, tv]),
            "t": np.concatenate([tv, sv])})
        tt = out["t"].to_numpy(np.int64)
        ix, iy = tt >> 21, tt & ((np.int64(1) << 21) - 1)
        out["w"] = 1 + (ix + iy) % 5
        return out

    edges = half.map_batches(weighted, batch_format="pandas")
    seed_v = int(nodes.min("v"))
    seeds = ray.data.from_items([{"v": seed_v}])
    out = relational.sssp_rounds(edges, seeds, rounds=6)
    return out.map_batches(
        lambda df: df.astype({"v": "int64", "dist": "int64"}),
        batch_format="pandas")


def q_flow_accumulation(sf_dir):
    """Flow ACCUMULATION over the occupied tile-cell lattice
    (stages/terrain.py:flow_accumulation_lattice) — each cell flows
    to its lowest strictly-lower occupied 4-neighbor under the
    deterministic synthetic elevation (ix·1000003 + iy·7919) mod
    104729 (tie-break by direction precedence), then 4 rounds of
    mass-hop message passing count the upstream cells within ≤4 hops.
    Per round: ONE frontier⨝edges hash join + ONE groupby sum; the
    downstream-edge argmin is an associative packed-int64 Min (no
    per-node map_groups). Oracle: the downstream pick as a
    row_number() window + the rounds as stacked CTEs."""
    from unmixing_ray import cellindex
    from unmixing_ray.stages import terrain
    from ray.data.aggregate import Count
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def nodes_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        return pd.DataFrame({"v": np.unique(pk)})

    nodes = tiles.map_batches(nodes_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Count()).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64")}),
        batch_format="pandas").materialize()
    out = terrain.flow_accumulation_lattice(nodes, rounds=4)
    return out.map_batches(
        lambda df: df.astype({"ix": "int64", "iy": "int64",
                              "acc": "int64"}),
        batch_format="pandas")


def _lattice_nodes(sf_dir):
    """Occupied tile-cell lattice node set (v = ix·2²¹ + iy) — shared
    by the flow-graph analytics (accumulation, basins, Strahler)."""
    from unmixing_ray import cellindex
    from ray.data.aggregate import Count
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def nodes_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        return pd.DataFrame({"v": np.unique(pk)})

    return tiles.map_batches(nodes_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Count()).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64")}),
        batch_format="pandas").materialize()


def q_strahler_order(sf_dir):
    """Strahler stream order over the occupied-cell flow graph
    (stages/terrain.py:strahler_order_lattice): 4 fixed rounds of
    order propagation — per round one orders⨝edges hash join, one
    (cell, ord) count aggregate, and one associative packed Max
    (ord·2 + (c≥2) is monotone in ord, so max order and its
    multiplicity flag reduce together). Oracle: the rounds replayed
    as stacked CTEs over the same deterministic lattice elevation."""
    from unmixing_ray.stages import terrain
    out = terrain.strahler_order_lattice(_lattice_nodes(sf_dir),
                                         rounds=4)
    return out.map_batches(
        lambda df: df.astype({"ix": "int64", "iy": "int64",
                              "strahler": "int64"}),
        batch_format="pandas")


def q_viewshed(sf_dir):
    """Bounded-radius viewshed over the occupied tile-cell lattice
    (stages/terrain.py:viewshed_lattice): per cell, the count of
    visible cells within 4 steps along the 8 principal rays — exact
    integer LOS cross-multiplication over the closed-form lattice
    elevation; the ONLY exchange is one ray-cell occupancy semi-join
    + one groupby(v) bit-OR mask reduce. Oracle: pure SQL (occupancy
    prefix + LOS as correlated NOT EXISTS over generate_series)."""
    from unmixing_ray.stages import terrain
    out = terrain.viewshed_lattice(_lattice_nodes(sf_dir), radius=4)
    return out.map_batches(
        lambda df: df.astype({"ix": "int64", "iy": "int64",
                              "n_visible": "int64"}),
        batch_format="pandas")


def q_basin_label(sf_dir):
    """Watershed basin labels over the occupied tile-cell lattice
    (stages/terrain.py:basin_label_lattice) — pointer DOUBLING over
    the downstream functional graph: 4 rounds of ONE partitioned hash
    join each give every cell its 16-hop downstream pointer (= its
    basin outlet once converged; pits self-loop). Oracle: the pointer
    table composed with itself in 4 stacked self-join CTEs."""
    from unmixing_ray import cellindex
    from unmixing_ray.stages import terrain
    from ray.data.aggregate import Count
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def nodes_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        return pd.DataFrame({"v": np.unique(pk)})

    nodes = tiles.map_batches(nodes_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Count()).map_batches(
        lambda df: pd.DataFrame({"v": df["v"].astype("int64")}),
        batch_format="pandas").materialize()
    out = terrain.basin_label_lattice(nodes, doublings=4)
    return out.map_batches(
        lambda df: df.astype({"ix": "int64", "iy": "int64",
                              "basin_ix": "int64",
                              "basin_iy": "int64"}),
        batch_format="pandas")


def q_morans_i(sf_dir):
    """Global Moran's I over per-cell tile counts on the occupied
    lattice (stages/rollup.py:morans_ingredients) — rook-contiguity
    spatial autocorrelation reduced to six exact int64 ingredients
    (n, Σv, Σv², W, Σdeg·v, Σcross); the float statistic is
    postprocessing. Pairs are semi-join-bounded (≤4n), values attach
    via two partitioned hash joins. Oracle: the same directed
    4-neighbor pair sums in SQL."""
    from unmixing_ray import cellindex
    from unmixing_ray.stages import rollup
    from ray.data.aggregate import Sum
    _corpus_dir, tiles = _tiles_ds(sf_dir)

    def counts_fn(batch):
        ix, iy, _lv = cellindex.cell_to_ixiy(
            batch["cell"].to_numpy(zero_copy_only=False))
        pk = ix * (np.int64(1) << 21) + iy
        u, c = np.unique(pk, return_counts=True)
        return pd.DataFrame({"v": u, "val": c.astype(np.int64)})

    cells = tiles.map_batches(counts_fn, batch_format="pyarrow")\
        .groupby("v").aggregate(Sum("val", alias_name="val"))\
        .map_batches(
        lambda df: df.astype({"v": "int64", "val": "int64"}),
        batch_format="pandas").materialize()
    return rollup.morans_ingredients(cells)


def q_tpch_q4(sf_dir):
    """TPC-H Q4 shape (EXISTS decorrelated to a semi-join): orders
    placed in 1996 with at least one returned line, counted per
    priority. The lineitem side is reduced to bare R-flag order keys
    (the semi_join combiner dedups them), so the exchange carries
    order rows + O(distinct returned orders) — never the lineitem
    payload."""
    from unmixing_ray.stages import relational
    from ray.data.aggregate import Sum
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "o_orderpriority": df["o_orderpriority"],
        })[(df["o_orderdate"].to_numpy() >= lo.to_numpy())
           & (df["o_orderdate"].to_numpy() < hi.to_numpy())],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
        })[df["l_returnflag"].to_numpy() == "R"],
        batch_format="pandas")
    sem = relational.semi_join(orders, li, "okey")
    out = sem.map_batches(
        lambda df: df.groupby("o_orderpriority", as_index=False)
        .size().rename(columns={"size": "n"}),
        batch_format="pandas").groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="order_count"))
    return out.map_batches(
        lambda df: df.astype({"order_count": "int64"}),
        batch_format="pandas")


def q_tpch_q12(sf_dir):
    """TPC-H Q12 shape (join + CASE-bucketed counts): 1997 shipments
    per line status, split into high-priority (1-URGENT / 2-HIGH)
    vs low-priority order counts. Lineitem is PRE-AGGREGATED to
    (orderkey, status, n) per batch BEFORE the join — the
    combiner-before-join discipline — so the partitioned hash join
    carries at most one row per (order, status), not per line."""
    from unmixing_ray.stages import relational
    from ray.data.aggregate import Sum
    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linestatus", "l_shipdate"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
            "l_linestatus": df["l_linestatus"],
            "n": np.int64(1),
        })[(df["l_shipdate"].to_numpy() >= lo.to_numpy())
           & (df["l_shipdate"].to_numpy() < hi.to_numpy())]
        .groupby(["okey", "l_linestatus"], as_index=False).sum(),
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "pri": df["o_orderpriority"]}),
        batch_format="pandas")
    joined = relational.hash_join(
        li, orders, "okey",
        left_cols=["l_linestatus", "n"], right_cols=["pri"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        high = df["pri"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        return pd.DataFrame({
            "l_linestatus": df["l_linestatus"],
            "high_line_count": np.where(high, n, 0).astype(np.int64),
            "low_line_count": np.where(high, 0, n).astype(np.int64),
        }).groupby("l_linestatus", as_index=False).sum()

    out = joined.map_batches(bucket, batch_format="pandas")\
        .groupby("l_linestatus").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count"))
    return out.map_batches(
        lambda df: df.astype({"high_line_count": "int64",
                              "low_line_count": "int64"}),
        batch_format="pandas")


def q_tpch_q14(sf_dir):
    """TPC-H Q14 shape (promo revenue share): one shipment month
    joined to part types via a partitioned hash join, reduced to the
    EXACT integer ratio ingredients (promo cent² revenue, total cent²
    revenue) — the float percentage is driver postprocessing, never
    part of the distributed result."""
    from unmixing_ray.stages import relational
    from ray.data.aggregate import Sum
    lo = pd.Timestamp("1996-03-01")
    hi = pd.Timestamp("1996-04-01")
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "pkey": df["l_partkey"].astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64)),
        })[(df["l_shipdate"].to_numpy() >= lo.to_numpy())
           & (df["l_shipdate"].to_numpy() < hi.to_numpy())],
        batch_format="pandas")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "pkey": df["p_partkey"].astype("int64"),
            "promo": (df["p_type"].to_numpy() == "PROMO")
            .astype(np.int64)}),
        batch_format="pandas")
    joined = relational.hash_join(li, part, "pkey",
                                  left_cols=["rev_c2"],
                                  right_cols=["promo"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_c2"].to_numpy(np.int64)
        promo = df["promo"].to_numpy(np.int64)
        return pd.DataFrame({
            "one": [np.int64(1)],
            "promo_rev_c2": [np.int64((rev * promo).sum())],
            "total_rev_c2": [np.int64(rev.sum())]})

    out = joined.map_batches(fold, batch_format="pandas")\
        .groupby("one").aggregate(
        Sum("promo_rev_c2", alias_name="promo_rev_c2"),
        Sum("total_rev_c2", alias_name="total_rev_c2")).to_pandas()
    if out.empty:
        out = pd.DataFrame({"one": [1], "promo_rev_c2": [0],
                            "total_rev_c2": [0]})
    return pd.DataFrame({
        "promo_rev_c2": out["promo_rev_c2"].astype("int64"),
        "total_rev_c2": out["total_rev_c2"].astype("int64")})


TPCH_Q19_BRANCHES = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)


def q_tpch_q19(sf_dir):
    """TPC-H Q19 shape (disjunctive multi-branch predicate join):
    revenue over three (brand, size-range, quantity-range) OR
    branches. The part side filtered to the three brands is SMALL BY
    CONSTRUCTION, so it broadcasts as per-branch key sets (the
    broadcast-small-side discipline, q17 pattern) and the disjunction
    evaluates vectorized inside one lineitem pass — no shuffle at
    all; the result is one exact-cent² row."""
    from ray.data.aggregate import Sum
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"])\
        .filter(expr="p_size >= 1 and p_size <= 15").to_pandas()
    branch_keys = []
    for brand, max_size, _qlo, _qhi in TPCH_Q19_BRANCHES:
        m = (part["p_brand"] == brand) & (part["p_size"] <= max_size)
        branch_keys.append(
            set(int(k) for k in part.loc[m, "p_partkey"]))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["l_partkey"].astype(int)
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        rev = (np.rint(df["l_extendedprice"].to_numpy() * 100)
               .astype(np.int64)
               * (100 - np.rint(df["l_discount"].to_numpy() * 100)
                  .astype(np.int64)))
        hit = np.zeros(len(df), dtype=bool)
        for keys, (_b, _s, qlo, qhi) in zip(branch_keys,
                                            TPCH_Q19_BRANCHES):
            hit |= (pk.isin(keys).to_numpy()
                    & (qty >= qlo) & (qty <= qhi))
        return pd.DataFrame({
            "one": [np.int64(1)],
            "rev_c2": [np.int64(rev[hit].sum())],
            "n_lines": [np.int64(hit.sum())]})

    out = _read(sf_dir, "lineitem",
                columns=["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"])\
        .map_batches(fold, batch_format="pandas")\
        .groupby("one").aggregate(
        Sum("rev_c2", alias_name="rev_c2"),
        Sum("n_lines", alias_name="n_lines")).to_pandas()
    if out.empty:
        out = pd.DataFrame({"one": [1], "rev_c2": [0], "n_lines": [0]})
    return pd.DataFrame({
        "rev_c2": out["rev_c2"].astype("int64"),
        "n_lines": out["n_lines"].astype("int64")})


def q_tpch_q7(sf_dir):
    """TPC-H Q7 shape (bi-directional nation-pair volume): revenue
    shipped between NATION_1 and NATION_2 in either direction, grouped
    by (supp_nation, cust_nation, ship year). Supplier→nation is a
    broadcast dict (q5 discipline); customer filtered to the two
    nations hash-joins orders, lineitem hash-joins in, and the
    DIRECTION predicate ((F,G) or (G,F)) evaluates vectorized after
    the broadcast lookup — the nation pair is never a shuffle key."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    lo = pd.Timestamp("1995-01-01").to_numpy()
    hi = pd.Timestamp("1997-01-01").to_numpy()
    nation = _read(sf_dir, "nation").to_pandas()
    nk = {n: int(k) for k, n in zip(nation["n_nationkey"],
                                    nation["n_name"])}
    pair = (nk["NATION_1"], nk["NATION_2"])
    nname = {pair[0]: "NATION_1", pair[1]: "NATION_2"}
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = dict(zip(supp["s_suppkey"].astype(int),
                     supp["s_nationkey"].astype(int)))

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame({
            "ckey": df["c_custkey"].astype("int64"),
            "c_nat": df["c_nationkey"].astype("int64"),
        })[df["c_nationkey"].astype(int).isin(pair).to_numpy()],
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "ckey": df["o_custkey"].astype("int64")}),
        batch_format="pandas")
    ord_cn = relational.hash_join(orders, cust, "ckey",
                                  left_cols=["okey"],
                                  right_cols=["c_nat"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
            "skey": df["l_suppkey"].astype("int64"),
            "l_year": df["l_shipdate"].dt.year.astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64)),
        })[(df["l_shipdate"].to_numpy() >= lo)
           & (df["l_shipdate"].to_numpy() < hi)],
        batch_format="pandas")
    joined = relational.hash_join(
        ord_cn.map_batches(lambda df: pa.table({
            "okey": pa.array(df["okey"].astype("int64"), pa.int64()),
            "c_nat": pa.array(df["c_nat"].astype("int64"),
                              pa.int64())}), batch_format="pandas"),
        li, "okey", how="inner", left_cols=["okey", "c_nat"])

    def direction(df: pd.DataFrame) -> pd.DataFrame:
        sn = df["skey"].map(s_nat).astype("int64").to_numpy()
        cn = df["c_nat"].to_numpy(np.int64)
        keep = (((sn == pair[0]) & (cn == pair[1]))
                | ((sn == pair[1]) & (cn == pair[0])))
        out = df[keep].copy()
        out["supp_nation"] = pd.Series(sn[keep]).map(nname).to_numpy()
        out["cust_nation"] = out["c_nat"].map(nname)
        return out.groupby(["supp_nation", "cust_nation", "l_year"],
                           as_index=False)["rev_c2"].sum()

    out = joined.map_batches(direction, batch_format="pandas")\
        .groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("rev_c2", alias_name="revenue_c2")).to_pandas()
    if out.empty:
        # schema-stable empty (tiny corpora may have no qualifying
        # shipments; an empty Ray aggregate drops its column names)
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype="int64"),
            "revenue_c2": pd.Series([], dtype="int64")})
    out["l_year"] = out["l_year"].astype("int64")
    out["revenue_c2"] = out["revenue_c2"].astype("int64")
    return out.reset_index(drop=True)


def q_tpch_q8(sf_dir):
    """TPC-H Q8 shape (market share — the deepest composed plan):
    PROMO-part lineitems (semi-join against the filtered part side)
    within 1995–1996 orders of AMERICA-region customers (semi-join
    against the region-pruned customer side), reduced per order year
    to the EXACT integer ratio ingredients — NATION_3-supplier cent²
    revenue vs total. Two partitioned hash joins + two semi-joins +
    one broadcast dict; the float share is driver postprocessing."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    lo = pd.Timestamp("1995-01-01").to_numpy()
    hi = pd.Timestamp("1997-01-01").to_numpy()
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    am_rk = int(region[region["r_name"] == "AMERICA"]
                ["r_regionkey"].iloc[0])
    am_nk = set(int(k) for k in
                nation[nation["n_regionkey"] == am_rk]["n_nationkey"])
    target_nk = int(nation[nation["n_name"] == "NATION_3"]
                    ["n_nationkey"].iloc[0])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = dict(zip(supp["s_suppkey"].astype(int),
                     supp["s_nationkey"].astype(int)))

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])\
        .map_batches(lambda df: pd.DataFrame({
            "pkey": df["p_partkey"].astype("int64"),
        })[(df["p_type"].to_numpy() == "PROMO")],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]).map_batches(
        lambda df: pd.DataFrame({
            "pkey": df["l_partkey"].astype("int64"),
            "okey": df["l_orderkey"].astype("int64"),
            "skey": df["l_suppkey"].astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64))}), batch_format="pandas")
    li_promo = relational.semi_join(li, part, "pkey")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])\
        .map_batches(lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "ckey": df["o_custkey"].astype("int64"),
            "o_year": df["o_orderdate"].dt.year.astype("int64"),
        })[(df["o_orderdate"].to_numpy() >= lo)
           & (df["o_orderdate"].to_numpy() < hi)],
        batch_format="pandas")
    joined = relational.hash_join(
        li_promo.map_batches(lambda df: pa.table({
            "okey": pa.array(df["okey"].astype("int64"), pa.int64()),
            "skey": pa.array(df["skey"].astype("int64"), pa.int64()),
            "rev_c2": pa.array(df["rev_c2"].astype("int64"),
                               pa.int64())}), batch_format="pandas"),
        orders, "okey", left_cols=["skey", "rev_c2"],
        right_cols=["ckey", "o_year"])

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame({
            "ckey": df["c_custkey"].astype("int64"),
        })[df["c_nationkey"].astype(int).isin(am_nk).to_numpy()],
        batch_format="pandas")
    in_region = relational.semi_join(
        joined.map_batches(lambda df: pa.table({
            "ckey": pa.array(df["ckey"].astype("int64"), pa.int64()),
            "skey": pa.array(df["skey"].astype("int64"), pa.int64()),
            "o_year": pa.array(df["o_year"].astype("int64"),
                               pa.int64()),
            "rev_c2": pa.array(df["rev_c2"].astype("int64"),
                               pa.int64())}), batch_format="pandas"),
        cust, "ckey")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_c2"].to_numpy(np.int64)
        tgt = (df["skey"].map(s_nat).astype("int64").to_numpy()
               == target_nk)
        return pd.DataFrame({
            "o_year": df["o_year"].astype("int64"),
            "nation_rev_c2": np.where(tgt, rev, 0).astype(np.int64),
            "total_rev_c2": rev,
        }).groupby("o_year", as_index=False).sum()

    out = in_region.map_batches(fold, batch_format="pandas")\
        .groupby("o_year").aggregate(
        Sum("nation_rev_c2", alias_name="nation_rev_c2"),
        Sum("total_rev_c2", alias_name="total_rev_c2"))
    return out.map_batches(
        lambda df: df.astype({"nation_rev_c2": "int64",
                              "total_rev_c2": "int64"}),
        batch_format="pandas")


def q_tpch_q13(sf_dir):
    """TPC-H Q13 shape (distribution of distributions): orders per
    customer EXCLUDING one priority class, as a histogram of customer
    counts INCLUDING the zero-order customers. Orders pre-aggregate to
    (custkey, n) per batch (combiner), one groupby(custkey) merge, a
    LEFT hash join onto customer fills the zeros, and the
    count-of-counts reduces through a second (tiny-key) combiner
    groupby — two exchanges total, both over count rows."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational
    cnt = _read(sf_dir, "orders",
                columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda df: pd.DataFrame({
            "ckey": df["o_custkey"].astype("int64"),
            "n": np.int64(1),
        })[(df["o_orderpriority"].to_numpy() != "1-URGENT")]
        .groupby("ckey", as_index=False).sum(),
        batch_format="pandas")\
        .groupby("ckey").aggregate(Sum("n", alias_name="c_count"))
    cust = _read(sf_dir, "customer", columns=["c_custkey"])\
        .map_batches(lambda df: pd.DataFrame({
            "ckey": df["c_custkey"].astype("int64")}),
        batch_format="pandas")
    joined = relational.hash_join(
        cust, cnt.map_batches(lambda df: pa.table({
            "ckey": pa.array(df["ckey"].astype("int64"), pa.int64()),
            "c_count": pa.array(df["c_count"].astype("int64"),
                                pa.int64())}), batch_format="pandas"),
        "ckey", how="left", left_cols=[], right_cols=["c_count"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.to_numeric(df["c_count"], errors="coerce")\
            .fillna(0).astype("int64")
        return pd.DataFrame({"c_count": c, "custdist": np.int64(1)})\
            .groupby("c_count", as_index=False).sum()

    out = joined.map_batches(hist, batch_format="pandas")\
        .groupby("c_count").aggregate(
        Sum("custdist", alias_name="custdist"))
    return out.map_batches(
        lambda df: df.astype({"c_count": "int64",
                              "custdist": "int64"}),
        batch_format="pandas")


def q_tpch_q15(sf_dir):
    """TPC-H Q15 shape (global argmax with ties): per-supplier revenue
    for 1996Q1 (per-batch combiner → one groupby(suppkey)), the global
    maximum pulled as ONE scalar (aggregate of a one-row-per-supplier
    table — never the lineitems), and the equality filter + broadcast
    name lookup emit every supplier at the max. The max is exact cent²
    so ties are real ties, not float noise."""
    from ray.data.aggregate import Sum
    lo = pd.Timestamp("1996-01-01").to_numpy()
    hi = pd.Timestamp("1996-04-01").to_numpy()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    s_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    rev = _read(sf_dir, "lineitem",
                columns=["l_suppkey", "l_extendedprice", "l_discount",
                         "l_shipdate"]).map_batches(
        lambda df: pd.DataFrame({
            "skey": df["l_suppkey"].astype("int64"),
            "rev_c2": np.rint(df["l_extendedprice"].to_numpy() * 100)
            .astype(np.int64)
            * (100 - np.rint(df["l_discount"].to_numpy() * 100)
               .astype(np.int64)),
        })[(df["l_shipdate"].to_numpy() >= lo)
           & (df["l_shipdate"].to_numpy() < hi)]
        .groupby("skey", as_index=False).sum(),
        batch_format="pandas")\
        .groupby("skey").aggregate(Sum("rev_c2",
                                       alias_name="total_rev_c2"))
    rev = rev.map_batches(
        lambda df: df.astype({"skey": "int64",
                              "total_rev_c2": "int64"}),
        batch_format="pandas").materialize()
    top = int(rev.max("total_rev_c2"))
    out = rev.filter(expr=f"total_rev_c2 == {top}").to_pandas()
    out["s_name"] = out["skey"].map(s_name)
    return out[["skey", "s_name", "total_rev_c2"]]\
        .sort_values("skey").reset_index(drop=True)


def q_tpch_q22(sf_dir):
    """TPC-H Q22 shape (global scalar threshold + anti-join): positive
    -balance customers of five nations, kept when acctbal exceeds the
    global average (exact integer cross-multiplication acctbal_c · N >
    Σbal_c — no float average anywhere) AND they have no URGENT orders
    (tag-union anti-join, no broadcast of the orders side; every
    customer has SOME order in this corpus, so the classic no-orders
    predicate would be vacuous); per-nation count + exact-cent balance
    sum."""
    from ray.data.aggregate import Sum, Count
    from unmixing_ray.stages import relational
    codes = (1, 2, 3, 4, 5)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.rint(df["c_acctbal"].to_numpy() * 100)\
            .astype(np.int64)
        keep = (df["c_nationkey"].astype(int).isin(codes).to_numpy()
                & (bal_c > 0))
        return pd.DataFrame({
            "ckey": df["c_custkey"].astype("int64"),
            "cntrycode": df["c_nationkey"].astype("int64"),
            "bal_c": bal_c})[keep]

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])\
        .map_batches(pick, batch_format="pandas")
    # global scalar (Σbal_c, N) over the positive-balance candidates
    stats = cust.map_batches(
        lambda df: pd.DataFrame({
            "one": [np.int64(1)],
            "s": [np.int64(df["bal_c"].sum())],
            "n": [np.int64(len(df))]}), batch_format="pandas")\
        .groupby("one").aggregate(Sum("s", alias_name="s"),
                                  Sum("n", alias_name="n")).to_pandas()
    tot_s, tot_n = int(stats["s"].iloc[0]), int(stats["n"].iloc[0])

    rich = cust.map_batches(
        lambda df: df[df["bal_c"].to_numpy(np.int64) * tot_n > tot_s],
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])\
        .map_batches(lambda df: pd.DataFrame({
            "ckey": df["o_custkey"].astype("int64"),
        })[(df["o_orderpriority"].to_numpy() == "1-URGENT")]
        .drop_duplicates("ckey"), batch_format="pandas")
    noorder = relational.anti_join(rich, orders, "ckey")
    out = noorder.groupby("cntrycode").aggregate(
        Count(alias_name="numcust"),
        Sum("bal_c", alias_name="totacctbal_c"))
    return out.map_batches(
        lambda df: df.astype({"cntrycode": "int64",
                              "numcust": "int64",
                              "totacctbal_c": "int64"}),
        batch_format="pandas")


def q_tpch_q6(sf_dir):
    """TPC-H Q6 (forecast revenue change): the canonical
    scan-filter-aggregate — predicate pushed into the per-batch
    combiner (shipdate window, discount band as exact cent integers,
    quantity cap), revenue as exact cent² sums, ONE one-row-per-batch
    partial through a single-group aggregate. Nothing but two int64
    scalars per batch ever leaves a worker."""
    from ray.data.aggregate import Sum
    lo = pd.Timestamp("1997-01-01").to_numpy()
    hi = pd.Timestamp("1998-01-01").to_numpy()

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        disc_c = np.rint(df["l_discount"].to_numpy() * 100)\
            .astype(np.int64)
        price_c = np.rint(df["l_extendedprice"].to_numpy() * 100)\
            .astype(np.int64)
        ship = df["l_shipdate"].to_numpy()
        keep = ((ship >= lo) & (ship < hi)
                & (disc_c >= 5) & (disc_c <= 7)
                & (df["l_quantity"].to_numpy() < 24))
        return pd.DataFrame({
            "one": [np.int64(1)],
            "revenue_c2": [np.int64((price_c[keep] * disc_c[keep]).sum())],
            "n_lines": [np.int64(int(keep.sum()))]})

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])
    out = ds.map_batches(agg, batch_format="pandas")\
        .groupby("one").aggregate(Sum("revenue_c2", alias_name="revenue_c2"),
                                  Sum("n_lines", alias_name="n_lines"))\
        .to_pandas()
    return out[["revenue_c2", "n_lines"]].astype("int64")


Q21_LATE_DAYS = 60
_US_PER_DAY = 86_400_000_000


def q_tpch_q21(sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS / NOT EXISTS on a lineitem self-join,
    decorrelated to per-order set aggregates. The testdata lineitem
    has no receipt/commit dates, so lateness is l_shipdate >
    o_orderdate + 60 days (documented surrogate; the plan shape is
    the reference point). Lineitem is pre-combined per batch to
    (order, supplier, max shipdate) — never the line payload — then
    ONE partitioned hash join brings in the F-order date (dates ride
    as int64 µs: hash_join's tag-union pads with None, so only
    integer columns survive dtype-stable), and ONE groupby(order)
    computes {supplier count ≥ 2, exactly one late supplier} per
    group. Group count is bounded by |orders|, output by |suppliers|;
    the top-10 is a driver sort of ≤ |suppliers| rows with the
    deterministic (numwait DESC, s_name) total order."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderstatus"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "odate_us": df["o_orderdate"].to_numpy()
            .astype("datetime64[us]").astype(np.int64),
        })[df["o_orderstatus"].to_numpy() == "F"],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])\
        .map_batches(
        lambda df: pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
            "skey": df["l_suppkey"].astype("int64"),
            "ship_us": df["l_shipdate"].to_numpy()
            .astype("datetime64[us]").astype(np.int64),
        }).groupby(["okey", "skey"], as_index=False).max(),
        batch_format="pandas")
    joined = relational.hash_join(
        li, orders, "okey",
        left_cols=["skey", "ship_us"], right_cols=["odate_us"])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["ship_us"].to_numpy(np.int64)
                > df["odate_us"].to_numpy(np.int64)
                + Q21_LATE_DAYS * _US_PER_DAY)
        g = pd.DataFrame({"skey": df["skey"].to_numpy(np.int64),
                          "late": late.astype(np.int64)})\
            .groupby("skey", as_index=False).max()
        if len(g) >= 2 and int(g["late"].sum()) == 1:
            lsk = int(g.loc[g["late"] == 1, "skey"].iloc[0])
            return pd.DataFrame({"skey": np.array([lsk], dtype=np.int64),
                                 "n": np.array([1], dtype=np.int64)})
        return pd.DataFrame({"skey": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})

    waits = joined.groupby("okey").map_groups(
        per_order, batch_format="pandas")
    agg = waits.map_batches(
        lambda df: df.groupby("skey", as_index=False).sum(),
        batch_format="pandas").groupby("skey").aggregate(
        Sum("n", alias_name="numwait")).to_pandas()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    agg["s_name"] = agg["skey"].astype(int).map(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))
    out = agg.sort_values(["numwait", "s_name"],
                          ascending=[False, True]).head(10)
    return out[["s_name", "numwait"]].astype({"numwait": "int64"})\
        .reset_index(drop=True)


MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}


def q_parts_skyline(sf_dir):
    """Skyline / Pareto frontier of parts — cheapest-for-their-size
    (minimize p_retailprice, maximize p_size) via the local-skyline
    combiner (stages/relational.py:skyline — dominated rows dropped
    per batch BEFORE anything moves; dominance is transitive so the
    combiner is lossless). Oracle: the SQL NOT EXISTS dominance
    query."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_retailprice", "p_size"])
    out = relational.skyline(
        ds, ["p_retailprice", "p_size"], ["min", "max"],
        keep=["p_partkey"])
    return out.map_batches(
        lambda df: pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "price_c": np.rint(df["p_retailprice"].to_numpy() * 100)
            .astype(np.int64),
            "p_size": df["p_size"].astype("int64")}),
        batch_format="pandas")


def q_mixture_sample(sf_dir):
    """Training-data mixture construction: per-source deterministic
    Bernoulli rates (stages/relational.py:mixture_sample — md5
    threshold per row, growth-stable, zero exchange); sources beyond
    the spec drop to the default rate 0.1."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = relational.mixture_sample(
        ds, "source", "doc_id", MIXTURE_RATES, default_rate=0.1)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"]}), batch_format="pandas")


# 8 bands: totals above $400k fall outside every band -> label -1,
# keeping the miss path non-vacuous
PRICE_BANDS = [(i * 5_000_000, (i + 1) * 5_000_000, i)
               for i in range(8)]


def q_merge_aggregate(sf_dir):
    """Incremental view maintenance
    (stages/relational.py:merge_aggregate): the 1995-96 per-customer
    spend state folded with the 1997 delta WITHOUT recomputation —
    delta pre-aggregated per batch, one tag-union groupby. Oracle:
    the full recomputation over 1995-97."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational

    def spend(lo_y, hi_y, aggregated):
        lo = pd.Timestamp(f"{lo_y}-01-01").to_numpy()
        hi = pd.Timestamp(f"{hi_y}-01-01").to_numpy()
        ds = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate",
                            "o_totalprice"]).map_batches(
            lambda df: pd.DataFrame({
                "ckey": df["o_custkey"].astype("int64"),
                "spend_c": np.rint(df["o_totalprice"].to_numpy() * 100)
                .astype(np.int64),
            })[((df["o_orderdate"].to_numpy() >= lo)
                & (df["o_orderdate"].to_numpy() < hi))],
            batch_format="pandas")
        if not aggregated:
            return ds
        return ds.map_batches(
            lambda df: df.groupby("ckey", as_index=False).sum(),
            batch_format="pandas").groupby("ckey").aggregate(
            Sum("spend_c", alias_name="spend_c")).map_batches(
            lambda df: df.astype({"ckey": "int64",
                                  "spend_c": "int64"}),
            batch_format="pandas")

    return relational.merge_aggregate(
        spend(1995, 1997, aggregated=True),
        spend(1997, 1998, aggregated=False), "ckey", "spend_c")


def q_orders_price_band(sf_dir):
    """Non-equi BETWEEN lookup against a broadcast band table
    (stages/relational.py:range_lookup — one searchsorted per batch,
    zero exchange where a naive plan shuffles a theta-join): order
    totals bucketed into $50k price bands, out-of-range -> -1.
    Oracle: the SQL BETWEEN join against an inline VALUES table."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda df: pd.DataFrame({
            "okey": df["o_orderkey"].astype("int64"),
            "price_c": np.rint(df["o_totalprice"].to_numpy() * 100)
            .astype(np.int64)}), batch_format="pandas")
    return relational.range_lookup(ds, "price_c", PRICE_BANDS,
                                   keep=["okey"])


def q_basket_pairs(sf_dir):
    """Market-basket pair mining over orders
    (stages/relational.py:basket_pairs): per-order distinct part pairs
    with exact support/confidence integer ingredients — dedup
    combiner → one groupby(order) pair expansion → narrow pair-count
    groupby → item supports attached by two partitioned hash joins."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    out = relational.basket_pairs(ds, "l_orderkey", "l_partkey",
                                  min_support=2)
    return out.map_batches(
        lambda df: df.astype({c: "int64" for c in
                              ("a", "b", "n_ab", "n_a", "n_b")}),
        batch_format="pandas")


def q_triangle_count(sf_dir):
    """EXACT distributed triangle count of the part co-purchase graph
    (stages/relational.py:triangle_count — degree-ordered wedge
    closure: count combiner degrees, hash-join orientation, per-source
    C(outdeg,2) wedges, semi-join closure on a packed pair key). The
    edge set is every distinct co-purchased part pair (min_support=1
    basket_pairs)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = relational.basket_pairs(
        ds, "l_orderkey", "l_partkey", min_support=1).map_batches(
        lambda df: df[["a", "b"]].astype("int64"),
        batch_format="pandas")
    return relational.triangle_count(edges)


def q_fk_audit(sf_dir):
    """Referential-integrity audit (stages/relational.py:
    referential_audit): orphan counts for lineitem→orders and
    lineitem→part (clean), plus orders→customer against a STALE
    dimension snapshot (customers with c_custkey % 7 == 0 dropped —
    the partial-load scenario the audit exists to catch; the filter
    is replayed in SQL). Each check is one tag-union anti-join."""
    import ray.data
    from unmixing_ray.stages import relational
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_partkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    part = _read(sf_dir, "part", columns=["p_partkey"])
    def stale(df):
        return df[df["c_custkey"].to_numpy() % 7 != 0]

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey"]).map_batches(
        stale, batch_format="pandas")
    return relational.referential_audit([
        ("lineitem->orders", lineitem, "l_orderkey", orders,
         "o_orderkey"),
        ("lineitem->part", lineitem, "l_partkey", part, "p_partkey"),
        ("orders->customer_stale", orders, "o_custkey", cust,
         "c_custkey"),
    ])


def q_events_mad(sf_dir):
    """Per-user robust dispersion (stages/relational.py:grouped_mad):
    exact fixed-point median + MAD through two runs of the
    distributed-selection core. Oracle: percentile_disc replay on the
    same integer cents."""
    from unmixing_ray.stages import relational
    return relational.grouped_mad(_read(sf_dir, "events"),
                                  "user_id", "value", scale=100)


def q_link_predict(sf_dir):
    """Common-neighbor link prediction over the support-2 co-purchase
    graph (stages/relational.py:common_neighbors): apex-centric wedge
    counts under a deg_cap, hash-partitioned bounded pair merges,
    anti-join of existing edges, global top-20 with deterministic
    tiebreak. Oracle: adjacency self-join + NOT EXISTS + window."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = relational.basket_pairs(
        ds, "l_orderkey", "l_partkey", min_support=2,
        pairs_only=True).map_batches(
        lambda df: df[["a", "b"]].astype("int64"),
        batch_format="pandas")
    return relational.common_neighbors(edges, k=20, deg_cap=64,
                                       min_common=2)


def q_nations_agg(sf_dir):
    """Deterministic ordered string_agg per region
    (stages/relational.py:grouped_string_agg): the within-group ORDER
    BY makes a distributed concat reproducible and oracle-checkable."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "nation", columns=["n_regionkey", "n_name"])
    out = relational.grouped_string_agg(
        ds, "n_regionkey", "n_name", ["n_name"])
    return out.map_batches(
        lambda df: df.astype({"n_regionkey": "int64"}),
        batch_format="pandas")


def q_orders_moving_window(sf_dir):
    """ROWS-frame window aggregate — trailing 5-order spend sum per
    customer (SUM OVER ... ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    via cumsum difference inside the per-key group
    (stages/relational.py:moving_window)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate",
                        "o_totalprice"])
    out = relational.moving_window(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"], "o_totalprice",
        k=5, scale=100)
    return out.map_batches(
        lambda df: df[["o_custkey", "o_orderkey", "win_sum_c",
                       "win_n"]], batch_format="pandas")


def q_lineitem_moments(sf_dir):
    """Exact grouped second moments (the sufficient statistics of
    Pearson corr / covariance / OLS slope) per return flag, via
    associative integer partials (stages/relational.py:grouped_moments;
    six int64 per key·batch through the exchange). y = extendedprice
    coarsened cents→floor-dollars (exact integer floor-div, no
    half-rounding ambiguity) so Σy² holds to ~sf100."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return relational.grouped_moments(
        ds, "l_returnflag", "l_quantity", "l_extendedprice",
        x_scale=1, y_scale=100, y_div=100)


def q_customer_orders_outer(sf_dir):
    """FULL OUTER partitioned hash join: positive-balance customers vs
    big orders — both join sides have unmatched rows (customers with no
    big order; big orders from negative-balance customers), so every
    outer branch is non-vacuous. Unmatched-side nulls are coalesced to
    sentinels ('' / -1) so the driver's value-hash compare is
    null-representation-independent."""
    from unmixing_ray.stages import relational
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_acctbal"])\
        .filter(expr="c_acctbal > 0").map_batches(
        lambda df: pd.DataFrame({
            "custkey": df["c_custkey"], "c_name": df["c_name"]}),
        batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])\
        .filter(expr="o_totalprice > 400000.0").map_batches(
        lambda df: pd.DataFrame({
            "custkey": df["o_custkey"], "o_orderkey": df["o_orderkey"]}),
        batch_format="pandas")
    joined = relational.hash_join(cust, orders, "custkey", how="outer")

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": df["custkey"].astype("int64"),
            "c_name": df["c_name"].fillna("").astype(str),
            "o_orderkey": df["o_orderkey"].fillna(-1).astype("int64")})

    return joined.map_batches(fill, batch_format="pandas")


def q_suppliers_with_returns(sf_dir):
    """Distributed semi-join (EXISTS): suppliers with at least one
    high-quantity returned lineitem (stages/relational.py:semi_join —
    tag-union, right side deduped to bare keys per batch, left
    multiplicity preserved, right payload never shuffled)."""
    from unmixing_ray.stages import relational
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_returnflag", "l_quantity"])\
        .filter(expr="l_returnflag == 'R' and l_quantity >= 45")
    return relational.semi_join(supp, li, "s_suppkey",
                                right_key="l_suppkey")


def q_heavy_hitters_tokens(sf_dir):
    """Exact global top-20 tokens via the Misra-Gries sketch pass +
    candidate-restricted exact verify (stages/relational.py:
    heavy_hitters) — the bounded-bandwidth path for billion-key token
    universes; result is provably exact or falls back loudly."""
    import re
    from collections import Counter
    from unmixing_ray.stages import relational
    tok = re.compile(r"[a-z0-9]+")

    def cf(df):
        c = Counter()
        for s in df["text"]:
            c.update(tok.findall(s.lower()))
        return c

    return relational.heavy_hitters(
        _read(sf_dir, "documents", columns=["text"]),
        counter_fn=cf, k=20, key_name="token")


def q_part_filter_topk(sf_dir):
    """Predicate + sort + limit over part (filter pushdown pattern)."""
    import pyarrow.compute as pc_
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_size", "p_retailprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc_.greater(t["p_size"], 25)),
        batch_format="pyarrow")

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": df["p_partkey"],
            "price_c": np.rint(df["p_retailprice"].to_numpy() * 100)
                .astype(np.int64)})

    return ds.map_batches(to_cents, batch_format="pandas")\
        .sort(["price_c", "p_partkey"], descending=[True, False])\
        .limit(15).to_pandas()


def q_top_orders_per_segment(sf_dir):
    """Grouped top-k: top-3 orders by value per market segment —
    per-batch partial top-k (combiner) before the groupby merge
    (stages/relational.py:grouped_topk)."""
    from unmixing_ray.stages import relational
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["o_custkey"].map(seg),
            "o_orderkey": df["o_orderkey"],
            "total_c": np.rint(df["o_totalprice"].to_numpy() * 100)
                .astype(np.int64)})

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])\
        .map_batches(prep, batch_format="pandas")
    return relational.grouped_topk(
        ds, "c_mktsegment", "total_c", k=3, descending=True,
        tiebreak=("o_orderkey",))


def q_supplier_distinct_parts(sf_dir):
    """Exact distributed COUNT(DISTINCT): distinct parts shipped per
    supplier — per-batch pair dedup bounds the shuffle
    (stages/relational.py:count_distinct)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    return relational.count_distinct(ds, "l_suppkey", "l_partkey",
                                     alias="n_parts")


def q_customers_without_orders(sf_dir):
    """Distributed anti-join (tag-union, no broadcast): customers that
    never placed a large (> $400k) order — the threshold keeps the
    result non-vacuous on this corpus, where every customer has SOME
    order (stages/relational.py:anti_join)."""
    import pyarrow.compute as pc_
    from unmixing_ray.stages import relational

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"], "c_name": df["c_name"],
            "acctbal_c": np.rint(df["c_acctbal"].to_numpy() * 100)
                .astype(np.int64)})

    left = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_acctbal"])\
        .map_batches(prep, batch_format="pandas")
    right = _read(sf_dir, "orders",
                  columns=["o_custkey", "o_totalprice"])\
        .map_batches(lambda t: t.filter(
            pc_.greater(t["o_totalprice"], 400000.0)),
        batch_format="pyarrow")
    return relational.anti_join(left, right, "c_custkey",
                                right_key="o_custkey")


def q_events_quantiles(sf_dir):
    """EXACT per-type p50/p90/p99 of event value via distributed
    selection — sampling pass → cheap counting passes → one bounded
    band collect; never a per-group sort of the full column
    (stages/relational.py:grouped_quantile_disc). percentile_disc
    semantics: results are actual data elements, so the micro-unit
    floor matches DuckDB bit-for-bit."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = relational.grouped_quantile_disc(
        ds, "event_type", "value", qs=(0.5, 0.9, 0.99))
    res = pd.DataFrame({"event_type": out["event_type"]})
    for c in ("p50", "p90", "p99"):
        res[c + "_u6"] = np.floor(
            out[c].to_numpy() * 1e6).astype(np.int64)
    return res


def q_events_quantiles_cont(sf_dir):
    """ANSI percentile_cont (interpolated quantiles) per event type via
    the same distributed-selection core: floor/ceil order statistics +
    the exact rational fraction (stages/relational.py:
    grouped_quantile_cont). The query emits the exact INGREDIENTS
    (lo/hi data elements micro-floored, frac as int rational) so the
    SQL replay is hash-exact; the float interpolation is a pure
    function of these and is pinned separately in pytest."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = relational.grouped_quantile_cont(
        ds, "event_type", "value", qs=((1, 2), (9, 10)))
    return pd.DataFrame({
        "event_type": out["event_type"],
        "qn": out["qn"], "qd": out["qd"], "n": out["n"],
        "lo_u6": np.floor(out["lo"].to_numpy() * 1e6).astype(np.int64),
        "hi_u6": np.floor(out["hi"].to_numpy() * 1e6).astype(np.int64),
        "frac_num": out["frac_num"], "frac_den": out["frac_den"]})


def q_events_quantiles_by_user(sf_dir):
    """EXACT per-USER quantiles — the high-cardinality complement of
    events_quantiles: one groupby(user_id) shuffle, each group's exact
    order statistics computed where the key lives, keys/values never on
    the driver (stages/relational.py:grouped_quantile_shuffled). The
    selection core refuses key counts this shape (loud max_keys guard,
    pytest-pinned); this is its routed fallback."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    out = relational.grouped_quantile_shuffled(
        ds, "user_id", "value", qs=(0.5, 0.9)).to_pandas()
    res = pd.DataFrame({"user_id": out["user_id"].astype(np.int64)})
    for c in ("p50", "p90"):
        res[c + "_u6"] = np.floor(
            out[c].to_numpy() * 1e6).astype(np.int64)
    return res


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir):
    """Long → wide pivot: per-user event-type count columns. Per-batch
    crosstab partials, one fixed-width combiner shuffle
    (stages/relational.py:pivot_count)."""
    from unmixing_ray.stages import relational
    return relational.pivot_count(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        "user_id", "event_type", EVENT_TYPES)


def q_bigram_topk(sf_dir):
    """Global top-20 word bigrams (n-gram statistics with
    combiner-before-shuffle; stages/text.py:bigram_topk)."""
    from unmixing_ray.stages import text
    return text.bigram_topk(
        _read(sf_dir, "documents", columns=["text"]), k=20)


def q_inverted_index(sf_dir):
    """Inverted-index dictionary (term -> df, total tf) —
    combiner-before-shuffle postings build
    (stages/text.py:inverted_index). The synthetic corpus vocabulary is
    small (~31 terms), so the query checks the FULL dictionary
    (vocab_prefix=''); at 100 TB the md5 prefix IS the job shard key
    (one run per hex prefix, 1/16th of the dictionary per exchange)."""
    from unmixing_ray.stages import text
    return text.inverted_index(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        vocab_prefix="")


def q_embedding_covariance(sf_dir):
    """Exact distributed Gram/second-moment matrix of the embeddings
    (fixed-point floor(x * 2^16) int64 quantization BEFORE accumulation
    — bit-identical at every parallelism, and the SQL oracle replays the
    quantization inline: stages/linalg.py:embedding_gram). The PCA on
    top (driver eigh over this reduced integer matrix) is
    pytest-pinned (tests/test_linalg.py)."""
    from unmixing_ray.stages import linalg
    return linalg.embedding_gram(
        _read(sf_dir, "embeddings", columns=["embedding"]))


def q_pca_project(sf_dir):
    """EXACT fixed-point PCA projection of the embeddings
    (stages/linalg.py:pca_project_exact): ONE distributed integer-Gram
    pass (d² fixed-width rows per batch through the shuffle, never an
    embedding), O(d³) driver eigh, then a broadcast map-only
    projection with every value floored to int64 BEFORE accumulation —
    bit-identical at any partitioning. Oracle: single-machine replay
    sidecar (sources/synth.py:generate_pca_expected)."""
    from unmixing_ray.stages import linalg
    return linalg.pca_project_exact(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=4)


def q_tfidf_topk(sf_dir):
    """Top-3 TF-IDF terms per document with an integer-exact idf
    (tf * ((N * 1e6) // df)) — no broadcast vocabulary: inverted-index
    explode, groupby(token) for df, groupby(doc_id) for the top-k
    (stages/text.py:tfidf_topk)."""
    from unmixing_ray.stages import text
    return text.tfidf_topk(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), k=3)


def q_lineitem_sample(sf_dir):
    """Deterministic Bernoulli sample (md5-threshold, seed 7): keep all
    lineitems of ~5% of orders — reproducible across runs, partitionings
    and engines (stages/relational.py:bernoulli_sample)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = relational.bernoulli_sample(ds, "l_orderkey", 0.05, seed=7)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "l_linenumber": df["l_linenumber"].astype(np.int64),
            "qty": np.rint(df["l_quantity"].to_numpy())
                .astype(np.int64)})

    return out.map_batches(clean, batch_format="pandas")


def q_orders_sample_per_priority(sf_dir):
    """Exactly-4-per-priority uniform sample without replacement
    (md5-ranked; stages/relational.py:stratified_sample — reuses the
    grouped_topk combiner)."""
    from unmixing_ray.stages import relational
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderkey"])
    out = relational.stratified_sample(ds, "o_orderpriority",
                                       "o_orderkey", n=4, seed=0)
    return out.map_batches(
        lambda df: df[["o_orderpriority", "o_orderkey", "rank"]],
        batch_format="pandas")


def q_kmeans_assign(sf_dir):
    """Nearest-centroid assignment over the embeddings table with fixed
    centroids (the vec_id < 8 vectors — data-defined so the SQL oracle
    reconstructs them exactly with a self-join). The full distributed
    Lloyd training loop is stages/cluster.py:kmeans_fit (pytest-pinned:
    monotone inertia, batching invariance, blob recovery)."""
    from unmixing_ray.stages import cluster
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.filter(lambda r: r["vec_id"] < 8).to_pandas()\
        .sort_values("vec_id")
    C = np.array([np.asarray(v, dtype=np.float64)
                  for v in head["embedding"]])
    return cluster.assign(ds, C)


def q_bpe_merges(sf_dir):
    """Distributed BPE tokenizer training (stages/text.py:bpe_train):
    the corpus is reduced ONCE to the distinct-word table (Counter
    combiner → groupby(word)); each merge round is a pair-count
    combiner pass over that Zipf-bounded table + a contains-filtered
    rewrite. Oracle: an independent single-machine dict replay
    (synth.generate_bpe_expected) — ties break to the smallest
    (lhs, rhs) in both."""
    from unmixing_ray.stages import text
    return text.bpe_train(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        n_merges=12)


def q_bpe_encode(sf_dir):
    """Tokenizer APPLICATION (stages/text.py:bpe_encode): train the
    12-merge table distributed (bpe_train), then encode every document
    with an actor-pool stage — merge list in constructor state, per-
    actor word→length memo, no exchange at all. Returns (doc_id,
    n_words, n_tokens). Oracle: an independent single-machine replay
    that tracks each distinct word's symbol sequence THROUGH training
    (synth.generate_bpe_encode_expected) — equal because greedy encode
    replays the same rewrites in the same order."""
    from unmixing_ray.stages import text
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = text.bpe_train(docs, n_merges=12)
    return text.bpe_encode(
        docs, list(zip(merges["lhs"], merges["rhs"])))


def q_semdedup(sf_dir):
    """SemDeDup semantic dedup (stages/ann.py:semdedup): cluster-first
    (broadcast nearest-centroid assign), then keep-min-id cosine
    verdicts WITHIN each cluster — one groupby(cluster_id) exchange
    bounds the quadratic to (n/k)² per group. Centroids are the
    vec_id < 8 vectors (data-defined, kmeans_assign discipline) so the
    SQL oracle replays assignment + verdicts exactly."""
    from unmixing_ray.stages import ann, cluster
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.filter(lambda r: r["vec_id"] < 8).to_pandas()\
        .sort_values("vec_id")
    C = np.array([np.asarray(v, dtype=np.float64)
                  for v in head["embedding"]])
    return ann.semdedup(ds, C, threshold=0.45)


def _planted_neardup_docs(sf_dir, n_dups=20, seed=99):
    """documents ∪ token-perturbed copies of the first n_dups docs
    (deterministic, shared construction synth.perturb_docs) — makes the
    near-dup operators non-vacuous since the provided corpus has no
    near-duplicates. The generation-time O(n^2) exact-Jaccard/Hamming
    sidecars over the same union are the oracles."""
    import ray.data
    from unmixing_ray.sources import synth
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])
    head = base.to_pandas().sort_values("doc_id").head(n_dups)
    planted = synth.perturb_docs(
        dict(zip((int(i) for i in head["doc_id"]), head["text"])),
        n_dups=n_dups, seed=seed)
    rows = [{"doc_id": i, "text": t} for i, t in planted]
    return base.union(ray.data.from_items(rows))


def q_minhash_pairs_planted(sf_dir):
    from unmixing_ray.stages import dedup
    return dedup.minhash_lsh_pairs(_planted_neardup_docs(sf_dir),
                                   threshold=0.5)


def q_simhash_pairs_planted(sf_dir):
    from unmixing_ray.stages import dedup
    return dedup.simhash_pairs(_planted_neardup_docs(sf_dir),
                               max_hamming=8)


def q_ssjoin_pairs(sf_dir):
    """EXACT set-similarity join via prefix filtering
    (stages/dedup.py:ssjoin_prefix, PPJoin/AllPairs family) over
    documents ∪ planted at Jaccard ≥ 0.4 — exhaustive by the prefix
    lemma, so the generation-time O(n²) exact-Jaccard sidecar IS the
    answer (no banding-recall caveat, unlike minhash_pairs)."""
    from unmixing_ray.stages import dedup
    return dedup.ssjoin_prefix(_planted_neardup_docs(sf_dir),
                               threshold=0.4)


def q_spectra_at_points(sf_dir):
    """Broadcast point→pixel spectra lookup (spectra_at_xy as a
    distributed join: points broadcast, each tile gathers hits inside
    its extent — SURVEY.md §2.4 row 1)."""
    import pyarrow as pa
    from unmixing_ray import geo
    from unmixing_ray.stages.decode import tiles_to_ndarray
    corpus, tiles = _tiles_ds(sf_dir)
    # deterministic probe points: centers of the first 20 images
    import json as _json
    man = _json.loads(open(os.path.join(corpus, "manifest.json")).read())
    from unmixing_ray.sources.synth import image_geotransform
    pts = []
    for seq in range(20):
        gt = image_geotransform(seq, man["n_images"])
        pts.append((seq, gt[0] + 32 * gt[1] + 1.0,
                    gt[3] + 32 * gt[5] - 1.0))

    def gather(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        out = {"point_id": [], "tile_id": [], "b0": [], "b5": []}
        gts = batch["gt"].to_pylist()
        for i in range(batch.num_rows):
            a = uniform[i] if uniform is not None else arrays[i]
            gt = tuple(gts[i])
            h, w = a.shape[1], a.shape[2]
            for pid, x, y in pts:
                (px, py), = geo.xy_to_pixel([(x, y)], gt)
                if 0 <= px < w and 0 <= py < h:
                    out["point_id"].append(pid)
                    out["tile_id"].append(batch["tile_id"][i].as_py())
                    out["b0"].append(int(a[0, py, px]))
                    out["b5"].append(int(a[5, py, px]))
        return pa.table({
            "point_id": pa.array(out["point_id"], pa.int64()),
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "b0": pa.array(out["b0"], pa.int64()),
            "b5": pa.array(out["b5"], pa.int64()),
        })

    return tiles.map_batches(gather, batch_format="pyarrow")


def q_hall_rectification(sf_dir):
    """Radiometric rectification of every image to the corpus's canonical
    bright/dark reference spectra (Hall 1991; reference lsma.py:523-584):
    the reference spectra are broadcast, each image's control-set means
    are gathered in-stage, and the rectified band-0 sum is emitted. Hard
    oracle: the corpus sidecar computes the same sums inline at
    generation time."""
    import json as _json
    import pyarrow as pa
    from unmixing_ray.kernels import rectify
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages.decode import decode_batch
    corpus = _corpus(sf_dir)
    man = _json.loads(open(os.path.join(corpus, "manifest.json")).read())
    U = np.asarray(man["endmembers"], dtype=np.float64)
    ref_bright, ref_dark = U[1], U[2]
    bright_px = list(synth.HALL_BRIGHT_PX)
    dark_px = list(synth.HALL_DARK_PX)
    ds = images.read_images(corpus)

    def rect(batch: pa.Table) -> pa.Table:
        from unmixing_ray.stages.decode import tiles_to_ndarray
        dec = decode_batch(batch)
        arrays, uniform = tiles_to_ndarray(dec)
        sums = []
        for i in range(dec.num_rows):
            arr = uniform[i] if uniform is not None else arrays[i]
            img_bright = np.array([arr[:, y, x] for x, y in bright_px])\
                .mean(axis=0)
            img_dark = np.array([arr[:, y, x] for x, y in dark_px])\
                .mean(axis=0)
            m, b = rectify.rectification_coefficients(
                ref_bright, ref_dark, img_bright, img_dark)
            rectified = rectify.apply_rectification(arr, m, b)
            sums.append(int(rectified[0][rectified[0] != -9999].sum()))
        return pa.table({
            "image_id": dec["image_id"],
            "b0_sum_rect": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(rect, batch_format="pyarrow", batch_size=32)


def q_sasma_abundance(sf_dir):
    """SASMA pipeline over a deterministic subset (CART + IDW + MESMA);
    rows-only. Subset keeps the sf0.01 driver run fast."""
    from unmixing_ray.pipelines import flagship, sasma
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import mnf as mnf_stage
    from unmixing_ray.stages import unmix as unmix_stage
    import pyarrow as pa
    corpus = _corpus(sf_dir)
    tiles = flagship.build_tiles(corpus, None, tile=synth.TILE,
                                 cell_level=synth.CELL_LEVEL,
                                 checkpoint=False)

    def first_images(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        keep = pc_.less(batch["image_id"], pa.scalar("img00000050"))
        return batch.filter(keep)

    subset = tiles.map_batches(first_images, batch_format="pyarrow")
    W, _ = mnf_stage.fit_mnf(subset)
    tiles_mnf = subset.map_batches(mnf_stage.make_apply_mnf(W),
                                   batch_format="pyarrow", batch_size=64)
    ems = unmix_stage.induce_endmembers_nfindr(tiles_mnf, q=3)
    out = sasma.run_sasma(tiles_mnf, ems, q=3, n_dims=2,
                          window_size=7).to_pandas()

    # invariant summary (VERDICT r02 item 7): every abundance value is
    # either the NoData sentinel or inside the simplex range, and no
    # unmasked pixel leaks past the instability mask (band 1 > 0.9999
    # pixels must be fully masked — kernels/spectral.py:241)
    def inv(a):
        a = np.asarray(a, dtype=np.float64).reshape(3, -1)
        masked = a[0] == -9999
        vals = a[:, ~masked]
        n_invalid = int(((vals < -1e-6) | (vals > 1.0 + 1e-6)).sum())
        n_invalid += int((a[:, masked] != -9999).sum())
        n_leak = int((a[1, ~masked] > 0.9999).sum())
        return n_invalid, n_leak

    res = out["abundance"].map(inv)
    out["n_invalid"] = res.map(lambda t: t[0]).astype("int64")
    out["n_unstable_leak"] = res.map(lambda t: t[1]).astype("int64")
    out["q"] = out["q"].astype("int64")
    return out[["tile_id", "image_id", "q", "n_invalid",
                "n_unstable_leak"]]


def q_forward_model_rmse(sf_dir):
    """Distributed forward-model validation (reference lsma.py:232-297):
    ONE fused streaming pass unmixes each reflectance tile against the
    corpus's true endmember spectra, forward-models, and emits residual
    partials (abundances never leave the worker). Near-exact recovery ⇒
    small normalized RMSE; returns one row (rows-only check)."""
    from unmixing_ray.stages import align
    import json as _json
    corpus, tiles = _tiles_ds(sf_dir)
    man = _json.loads(open(os.path.join(corpus, "manifest.json")).read())
    U = np.asarray(man["endmembers"], dtype=np.float64)
    rmse_pct, n_tiles = align.forward_model_rmse_streaming(
        tiles, U, sample_rate=0.08)
    # invariant summary: exact tile count + the reference's validation
    # acceptance bound (near-exact recovery ⇒ normalized RMSE < 2%),
    # hash-checked against the tile sidecar (VERDICT r02 item 7)
    return pd.DataFrame({"n_tiles": [int(n_tiles)],
                         "rmse_lt_2": [bool(rmse_pct is not None
                                            and rmse_pct < 2.0)]})


def q_epoch_change(sf_dir):
    """Bi-temporal change detection over the SKEWED corpus
    (stages/trend.py:epoch_change): exact rational late-minus-early
    mean delta of band-0 tile sum per position, both epochs in ONE
    associative-partials pass (the reference composites each epoch
    separately and differences rasters driver-side). Oracle:
    single-machine Python-int replay sidecar
    (synth.generate_change_expected)."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import trend
    corpus = synth.ensure_skewed_corpus(sf_dir)
    synth.generate_change_expected(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    t_split = synth.n_images_for_sf(synth.sf_of_dir(sf_dir)) // 4
    return trend.epoch_change(tiles, t_split)


def q_composite_cube(sf_dir):
    """Gap-filled 6-bin time-series composite cube over the SKEWED
    corpus (stages/trend.py:composite_cube): dense per-(position, bin)
    observation counts + exact band-0 sums with forward fill — the
    monthly/seasonal composite product as an associative-partials
    reduce plus one constant-size per-position densify group. Oracle:
    single-machine Python-int replay sidecar
    (synth.generate_cube_expected)."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import trend
    corpus = synth.ensure_skewed_corpus(sf_dir)
    synth.generate_cube_expected(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    t_count = synth.n_images_for_sf(synth.sf_of_dir(sf_dir))
    return trend.composite_cube(tiles, n_bins=6, t_count=t_count)


def q_temporal_trend(sf_dir):
    """Temporal trend composite over the SKEWED corpus (half the images
    stacked on one lattice position = a planted ~n/2-deep date stack):
    per tile position, the exact int64 rational least-squares slope of
    band-0 sum vs acquisition index (stages/trend.py — regression
    statistics as ASSOCIATIVE PARTIALS, one 5-int row per (batch, key)
    through the exchange, never a pixel payload, so the hot key needs
    no salting at any stack depth). Oracle: single-machine Python-int
    replay sidecar (synth.generate_trend_expected)."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import trend
    corpus = synth.ensure_skewed_corpus(sf_dir)
    synth.generate_trend_expected(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    return trend.temporal_trend(tiles)


def q_composite_latest(sf_dir):
    """Last-valid-observation composite over the SKEWED corpus
    (stages/trend.py:composite_latest): per-pixel argmax-by-date reduce
    carrying the (t, value) pair — at most 2 int64 planes per
    (batch, position) through the exchange regardless of the planted
    ~n/2-deep hot stack. Oracle: single-machine sequence-order replay
    sidecar (synth.generate_latest_expected)."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import trend
    corpus = synth.ensure_skewed_corpus(sf_dir)
    synth.generate_latest_expected(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    return trend.composite_latest(tiles)


def q_zonemap_prune(sf_dir):
    """Zone-map-pruned range count (state/zonemap.py): exact-ntile
    sorted partitioned write (layout via the distributed row_number),
    16-row min/max map, driver skip decision, pruned partition scan.
    The oracle replays layout + map + skip + count from the logical
    table — a hash match proves the PHYSICAL pruning agrees with the
    logical spec (files_read and rows_scanned included)."""
    from unmixing_ray.state import zonemap
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"])
    out = _out_dir("zonemap_orders", sf_dir)
    zmap = zonemap.write_sorted_zonemap(
        ds, "o_totalprice", "o_orderkey", out, n_files=16)
    return zonemap.pruned_range_count(out, zmap, "o_totalprice",
                                      50000, 100000)


_ZORDER_BOX = (10_000_000, 20_000_000,   # price cents 100k..200k
               9862, 10226)              # epoch days 1997-01-01..12-31


def q_zorder_prune(sf_dir):
    """Z-order-clustered storage (state/zonemap.py:write_zorder_zonemap):
    orders laid out by the Morton interleave of (price-cents, order-day)
    buckets — the Delta/Iceberg Z-ORDER BY shape — with a per-file
    min/max map on BOTH columns, so a 2-predicate box query skips files
    on either dimension (a 1-D sorted layout can only skip on its sort
    key). The oracle replays bucketing + Morton + ntile layout + map +
    skip, hash-checking files_read and rows_scanned — the physical
    clustering itself, not just the count."""
    from unmixing_ray.state import zonemap
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(df):
        x = np.rint(df["o_totalprice"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        y = (df["o_orderdate"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        return pd.DataFrame({
            "id": df["o_orderkey"].to_numpy().astype(np.int64),
            "x": x, "y": y.astype(np.int64)})

    xy = ds.map_batches(prep, batch_format="pandas")
    out = _out_dir("zorder_orders", sf_dir)
    zmap = zonemap.write_zorder_zonemap(xy, out, n_files=16)
    xlo, xhi, ylo, yhi = _ZORDER_BOX
    return zonemap.pruned_box_count(out, zmap, xlo, xhi, ylo, yhi)


def q_table_checksum(sf_dir):
    """Order-independent table content checksum
    (stages/relational.py:table_checksum): md5-row digests summed mod
    2^61-1 through the aggregate tree — the replication/migration
    audit primitive; two scalars reach the driver. Oracle: DuckDB
    HUGEINT sum of the same digests."""
    from unmixing_ray.stages import relational
    return relational.table_checksum(
        _read(sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])


def q_audio_silence(sf_dir):
    """Silence/VAD run-length segmentation (stages/media.py:
    AudioSilence): exact integer RLE of |sample| < threshold over REAL
    WAV payloads, position-weighted run checksum pinning the exact
    segmentation. Oracle: independent Python state-machine replay
    sidecar."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    synth.generate_silence_expected(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_audio.parquet"))
    return media.audio_silence(ds, threshold=5000)


def q_events_window_join(sf_dir):
    """Stream-stream window join (stages/events.py:window_join): all
    purchase-click pairs by the same user within +-1 day — the
    interval-bounded companion of the as-of join (all matches, not
    just nearest). Oracle: plain interval self-join."""
    from unmixing_ray.stages import events as estage
    return estage.window_join(_read(sf_dir, "events"),
                              left_type="purchase",
                              right_type="click", window_s=86400)


def q_image_dup_clusters(sf_dir):
    """Image near-dup CLUSTERS — composition of the planted phash
    Hamming pair join and bounded-round graph components (the
    LAION-style dedup-group resolution, multimodal counterpart of
    dedup_clusters). Ids map to ints (base seq; planted twin = seq +
    1e6), replayed in SQL."""
    from unmixing_ray.stages import relational
    pairs = q_phash_near_dup(sf_dir)

    def to_edges(df):
        def toid(s):
            seq = s.str.slice(3, 11).astype("int64")
            return seq + np.where(s.str.endswith("_nd"), 1_000_000, 0)
        return pd.DataFrame({"a": toid(df["img_a"]),
                             "b": toid(df["img_b"])}).astype("int64")

    edges = pairs.map_batches(to_edges, batch_format="pandas")
    return relational.graph_components(edges, rounds=4)


def q_user_trend(sf_dir):
    """Per-user activity-trend ingredients — composition: exact daily
    counts (one narrow groupby) feeding grouped_moments with x=day,
    y=count; the OLS slope/corr are pure functions of the six exact
    integers (computable identically in SQL)."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("datetime64[us]").astype("int64")
               // 86_400_000_000)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "day": day.astype("int64"),
                          "n": np.int64(1)})             .groupby(["user_id", "day"], as_index=False).sum()
        return g.astype({"n": "int64"})

    daily = _read(sf_dir, "events").select_columns(["user_id", "ts"])         .map_batches(partial, batch_format="pandas")         .groupby(["user_id", "day"]).aggregate(Sum("n", alias_name="n"))         .map_batches(lambda df: df.astype({"day": "int64",
                                           "n": "int64"}),
                     batch_format="pandas")
    return relational.grouped_moments(daily, "user_id", "day", "n")


def q_daily_locf(sf_dir):
    """Date-spine LOCF gap fill (stages/events.py:daily_locf): one row
    per (user, day) from first activity to the corpus end, carrying
    the latest value in exact cents. Oracle: generate_series spine +
    correlated latest-value replay."""
    from unmixing_ray.stages import events as estage
    return estage.daily_locf(_read(sf_dir, "events"), scale=100)


def q_polygon_clusters(sf_dir):
    """Overlap-graph polygon clustering — a pure COMPOSITION of two
    engine operators (the dissolve-adjacent-parcels shape): the
    rectangle-intersection self-join's pairs become edges, bounded-
    round hash-to-min components label each overlapping polygon.
    Oracle: the overlap self-join SQL feeding the stacked-CTE
    component replay."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import join as jstage
    from unmixing_ray.stages import relational
    import ray.data
    corpus = _corpus(sf_dir)
    polys = ray.data.read_parquet(os.path.join(corpus,
                                               "polygons.parquet"))
    pairs = jstage.box_intersection_join(polys, level=synth.CELL_LEVEL)

    def to_edges(df):
        return pd.DataFrame({
            "a": df["poly_a"].str.slice(4).astype("int64"),
            "b": df["poly_b"].str.slice(4).astype("int64")})

    edges = pairs.map_batches(to_edges, batch_format="pandas")
    return relational.graph_components(edges, rounds=6)


def q_video_motion(sf_dir):
    """Block-motion estimation (stages/media.py:MotionActor): per
    consecutive frame pair the integer-SAD-argmin translation in a
    +-3 window, dominant vector + positional code checksum. Oracle:
    closed-form expected table derived from the planted per-clip
    velocities at generation time (never by running the SAD)."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    synth.ensure_media(sf_dir)
    corpus = synth.generate_motion_clips(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_motion.parquet"))
    return media.video_motion(ds, radius=3, decoder="motion")


def q_trending_types(sf_dir):
    """Windowed trending top-k (stages/events.py:trending_types): per
    tumbling hour the 3 most frequent event types, count-combiner →
    one groupby → grouped_topk. Oracle: window row_number replay."""
    from unmixing_ray.stages import events as estage
    return estage.trending_types(_read(sf_dir, "events"),
                                 window_s=3600, k=3)


def q_session_overlap(sf_dir):
    """Per-user interval-overlap self-join (stages/events.py:
    session_overlap): view-sessions × click-sessions, ONE
    groupby(user_id) co-locating both interval sets, searchsorted
    contiguous-range pairing within the sorted disjoint session lists.
    Oracle: two sessionize CTEs + overlap-predicate join."""
    from unmixing_ray.stages import events as estage
    return estage.session_overlap(_read(sf_dir, "events"),
                                  type_a="view", type_b="click",
                                  gap_s=86400)


def q_decay_score(sf_dir):
    """Per-user recency-decay activity score (stages/events.py:
    decay_score): exact power-of-two decay summed as int64 through a
    count combiner + one groupby(user_id) — no float exp enters the
    reduce. Oracle: CASE-shift SQL replay."""
    from unmixing_ray.stages import events as estage
    return estage.decay_score(_read(sf_dir, "events"), max_age_days=20)


def q_scd2_intervals(sf_dir):
    """Type-2 SCD dimension build from the event log
    (stages/events.py:scd2_intervals): per-user validity intervals of
    the event_type attribute, ONE groupby(user_id) + vectorized
    run-length collapse, output bounded by value CHANGES. Oracle:
    gaps-and-islands window replay."""
    from unmixing_ray.stages import events as estage
    return estage.scd2_intervals(_read(sf_dir, "events"))


def q_seasonality(sf_dir):
    """Weekday-seasonality spectral ingredients per event type
    (stages/events.py:seasonality_score): exact fixed-point DFT bin at
    period 7 — integer weight literals shared with the SQL replay, one
    count combiner + ONE groupby(event_type). Oracle: VALUES-table
    weight join."""
    from unmixing_ray.stages import events as estage
    return estage.seasonality_score(_read(sf_dir, "events"))


def q_pq_codes(sf_dir):
    """Product-quantization code assignment (stages/ann.py:pq_assign):
    4×16-dim subspaces quantized against the data-defined vec_id<16
    codebook — exact expanded-L2 argmin, lowest-cid tiebreak, one
    stateless broadcast pass. The ADC search stage over these codes is
    pq_adc_topk (recall pytest-pinned). Oracle: list-slice
    self-join replay."""
    from unmixing_ray.stages import ann
    return ann.pq_assign(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]))


def q_json_props(sf_dir):
    """Semi-structured JSON property extraction + exact rollup
    (stages/events.py:json_prop_stats): stdlib parse per batch,
    per-(type, bucket) count/sum/min/max partials through ONE groupby.
    Oracle: DuckDB json_extract replay."""
    from unmixing_ray.stages import events as estage
    return estage.json_prop_stats(_read(sf_dir, "events"))


def q_attribution(sf_dir):
    """Multi-touch attribution (stages/events.py:attribution): each
    purchase splits exact fixed-point credit lcm(1..16)//n across the
    user's trailing-24h clicks — one groupby(user_id), searchsorted
    sweep, credits aggregated without materializing pair rows. Oracle:
    correlated-count SQL replay."""
    from unmixing_ray.stages import events as estage
    return estage.attribution(_read(sf_dir, "events"))


def q_orders_winsorized(sf_dir):
    """Per-priority winsorized spend
    (stages/relational.py:grouped_winsorized): percentile_disc bounds
    at q=0.1/0.9 from the distributed-selection core + one clipped-sum
    combiner pass under broadcast bounds — exact cents. Oracle:
    quantile_disc + LEAST/GREATEST replay."""
    from unmixing_ray.stages import relational

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "total_c": np.rint(df["o_totalprice"].to_numpy() * 100)
            .astype(np.int64)})

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"]) \
        .map_batches(to_cents, batch_format="pandas")
    return relational.grouped_winsorized(ds, "o_orderpriority",
                                         "total_c", trim=0.1)


def q_profile_orders(sf_dir):
    """ANALYZE-style table profile (stages/relational.py:
    profile_table): per-column n / nulls / EXACT distinct /
    lexicographic min-max through combiner passes. Oracle: direct SQL
    aggregates."""
    from unmixing_ray.stages import relational
    return relational.profile_table(
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderstatus",
                       "o_orderpriority"]),
        ["o_orderkey", "o_custkey", "o_orderstatus",
         "o_orderpriority"])


def q_rank_sum_drift(sf_dir):
    """Two-sample Mann–Whitney rank-sum ingredients between the 1995
    and 1996 order-value distributions — distribution-drift detection
    composed from the EXACT distributed row_number (relational.
    global_rank under ORDER BY (cents, o_orderkey)): per year n and
    Σrank, from which U = Σrank − n(n+1)/2 is driver/SQL arithmetic.
    Oracle: SQL window row_number replay."""
    from ray.data.aggregate import Sum
    from unmixing_ray.stages import relational

    lo = pd.Timestamp("1995-01-01")
    mid = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        keep = (d >= lo.to_numpy()) & (d < hi.to_numpy())
        df = df[keep]
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": np.rint(df["o_totalprice"].to_numpy() * 100)
            .astype(np.int64),
            "year": np.where(
                df["o_orderdate"].to_numpy() < mid.to_numpy(),
                1995, 1996).astype(np.int64)})

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"]) \
        .map_batches(prep, batch_format="pandas")
    ranked = relational.global_rank(ds, "cents", "o_orderkey",
                                    keep=("year",))
    out = ranked.map_batches(
        lambda df: pd.DataFrame({
            "year": df["year"].astype("int64"),
            "n": np.ones(len(df), dtype=np.int64),
            "rank_sum": df["rank"].astype("int64")})
        .groupby("year", as_index=False).sum(),
        batch_format="pandas") \
        .groupby("year").aggregate(
            Sum("n", alias_name="n"),
            Sum("rank_sum", alias_name="rank_sum"))
    return out.map_batches(
        lambda df: df.astype({"year": "int64", "n": "int64",
                              "rank_sum": "int64"}),
        batch_format="pandas")


def q_key_skew(sf_dir):
    """Hot-key skew audit (stages/relational.py:key_skew_audit): exact
    concentration ingredients (n_rows, n_keys, Σc² = self-join size,
    max_c) + the top-5 hottest keys — the planning pass behind the
    engine's salting decisions. Oracle: plain SQL aggregates over the
    per-key counts."""
    from unmixing_ray.stages import relational
    return relational.key_skew_audit(
        _read(sf_dir, "lineitem", columns=["l_orderkey"]),
        "l_orderkey", topk=5)


def q_embedding_clip(sf_dir):
    """Per-dimension activation-clipping stats — grouped_winsorized
    composed over the exploded embedding column (fixed-point
    floor(v·10^6); the preprocessing pass an int8 quantizer needs to
    pick saturation bounds per dimension). Oracle: parallel-unnest +
    quantile_disc replay."""
    from unmixing_ray.stages import relational

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        M = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        n, d = M.shape
        return pd.DataFrame({
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "v6": np.floor(M * 1e6).astype(np.int64).ravel()})

    ds = _read(sf_dir, "embeddings", columns=["embedding"]) \
        .map_batches(explode, batch_format="pandas")
    return relational.grouped_winsorized(ds, "dim", "v6", trim=0.05)


def q_interarrival(sf_dir):
    """Inter-arrival log2-bucket histogram
    (stages/events.py:interarrival_hist): exact doubling buckets via
    the frexp exponent (engine) vs length(printf('%b')) (SQL) — no
    float log on either side; one groupby(user_id) + count combiner."""
    from unmixing_ray.stages import events as estage
    return estage.interarrival_hist(_read(sf_dir, "events"))


def q_audio_resample(sf_dir):
    """Rational-rate audio resample (stages/media.py:AudioResampler):
    exact fixed-point linear interpolation at 2/3 rate over REAL WAV
    payloads, decoder resolved once per actor; position-weighted
    checksum pins every output sample. Oracle: independent
    Python-int replay sidecar."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    synth.generate_resample_expected(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_audio.parquet"))
    return media.audio_resample(ds, num=2, den=3, decoder="wav")


def q_composite_percentile(sf_dir):
    """Per-pixel 25th-percentile composite over the SKEWED corpus
    (stages/trend.py:composite_percentile): an order statistic over
    the planted ~n/2-deep hot stack — NOT associatively reducible, so
    the honest shape is full per-pixel co-location; the static
    SUBT-sub-split divides the hot group 16× without a pre-pass.
    Oracle: full-stack replay sidecar
    (synth.generate_percentile_expected)."""
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import trend
    corpus = synth.ensure_skewed_corpus(sf_dir)
    synth.generate_percentile_expected(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)
    return trend.composite_percentile(tiles, q_num=1, q_den=4)


def q_salted_cell_counts(sf_dir):
    """Skew-handling parity: per-cell tile counts over the SKEWED corpus
    (half the images stacked on one location → planted hot cells),
    computed with the salted groupby plan (hot cells split across
    reducers, per-(cell, salt) partials merged). The oracle is the
    closed-form lattice sidecar — proving the salted plan's output equals
    the unsalted truth."""
    import pyarrow as pa
    from unmixing_ray import cellindex
    from unmixing_ray.sources import images, synth
    from unmixing_ray.stages import decode as dstage
    from unmixing_ray.stages import shuffle
    corpus = synth.ensure_skewed_corpus(sf_dir)
    ds = images.read_images(corpus)
    fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                     cell_level=synth.CELL_LEVEL)
    tiles = ds.map_batches(fn, batch_format="pyarrow", batch_size=32)\
        .select_columns(["cell", "tile_id"])

    def cnt(g: pa.Table) -> pa.Table:
        return pa.table({
            "cell": pa.array([g["cell"][0].as_py()], pa.uint64()),
            "n": pa.array([g.num_rows], pa.int64())})

    parts = shuffle.salted_groupby(tiles, "cell", cnt, hot_threshold=64)\
        .to_pandas()
    merged = parts.groupby("cell", as_index=False)["n"].sum()
    ix, iy, _lv = cellindex.cell_to_ixiy(
        merged["cell"].to_numpy().astype(np.uint64))
    return pd.DataFrame({
        "cell_ix": pd.Series(ix, dtype="int64"),
        "cell_iy": pd.Series(iy, dtype="int64"),
        "n_tiles": merged["n"].astype("int64")})


def q_audio_features(sf_dir):
    """Actor-pool audio feature extraction over REAL RIFF/PCM16 WAV
    payloads (stdlib decode, stages/media.py decode_wav_pcm16). Hard
    oracle: the corpus sidecar replicates the PCM quantization and the
    window/RMS/ZCR arithmetic inline at generation time."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_audio.parquet"))
    out = media.audio_features(ds, decoder="wav").to_pandas()
    out["n_windows"] = out["n_windows"].astype("int64")
    out["rms_head_u6"] = out["rms_u6"].map(
        lambda v: int(v[0]) if len(v) else -1).astype("int64")
    out["zcr_head_u6"] = out["zcr_u6"].map(
        lambda v: int(v[0]) if len(v) else -1).astype("int64")
    out["rms_sum_u6"] = out["rms_u6"].map(
        lambda v: int(np.sum(np.asarray(v, dtype=np.int64)))
        if len(v) else 0).astype("int64")
    return out[["media_id", "n_windows", "rms_head_u6", "zcr_head_u6",
                "rms_sum_u6", "caption"]]\
        .sort_values("media_id").reset_index(drop=True)


def q_audio_downmix(sf_dir):
    """Multi-channel / multi-depth audio ingest: stereo-16, stereo-8
    and mono-8 PCM payloads decoded by the generic RIFF codec
    (stages/media.py decode_wav), downmixed to mono by the channel
    mean, then the standard window features — decoder='wav_any' on the
    same actor stage. Oracle: sidecar replicating per-depth
    quantization + downmix + feature arithmetic inline."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_audio_mc.parquet"))
    out = media.audio_features(ds, decoder="wav_any").to_pandas()
    out["n_windows"] = out["n_windows"].astype("int64")
    out["rms_head_u6"] = out["rms_u6"].map(
        lambda v: int(v[0]) if len(v) else -1).astype("int64")
    out["zcr_head_u6"] = out["zcr_u6"].map(
        lambda v: int(v[0]) if len(v) else -1).astype("int64")
    out["rms_sum_u6"] = out["rms_u6"].map(
        lambda v: int(np.sum(np.asarray(v, dtype=np.int64)))
        if len(v) else 0).astype("int64")
    return out[["media_id", "n_windows", "rms_head_u6", "zcr_head_u6",
                "rms_sum_u6", "caption"]]\
        .sort_values("media_id").reset_index(drop=True)


def q_audio_goertzel(sf_dir):
    """Single-bin DFT band energy (Goertzel tone detector) per clip at
    1 kHz over REAL RIFF/PCM16 WAV payloads (stages/media.py:
    GoertzelActor — basis built once per sample rate in actor state;
    pairwise-summed products, never BLAS, so the generation-time
    sidecar's identical expression is bit-reproducible)."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_audio.parquet"))
    out = media.audio_goertzel(
        ds, freq_hz=synth.GOERTZEL_HZ, decoder="wav").to_pandas()
    out["n_windows"] = out["n_windows"].astype("int64")
    return out[["media_id", "n_windows", "g_head_u6", "g_sum_u6",
                "caption"]].sort_values("media_id")\
        .reset_index(drop=True)


def q_video_frame_sample(sf_dir):
    """Actor-pool video frame sampling + resize over an opaque-binary
    media table (deterministic synthetic decode per the documented spec).
    Hard oracle: the corpus sidecar replicates the decode + resize + sum
    inline at generation time."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_video.parquet"))
    out = media.sample_video_frames(ds, every=synth.VIDEO_EVERY)\
        .to_pandas()
    out["px_sum"] = out["pixels"].map(
        lambda b: int(np.frombuffer(b, dtype=np.uint8)
                      .astype(np.int64).sum()))
    for c in ("frame_idx", "h", "w"):
        out[c] = out[c].astype("int64")
    return out[["media_id", "frame_idx", "h", "w", "px_sum", "caption"]]\
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_video_scene_cuts(sf_dir):
    """Scene-cut detection over scene-structured synthetic videos
    (stages/media.py:SceneCutActor): integer-exact abs-diff-sum
    threshold between consecutive downsampled frames; the sidecar runs
    the detector arithmetic inline and generation ASSERTS it equals the
    planted scene boundaries, so a match proves real detection."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import media
    corpus = synth.ensure_media(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(corpus, "media_video_scenes.parquet"))
    out = media.video_scene_cuts(ds).to_pandas()
    for c in ("n_frames", "n_cuts"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# text / dedup / ANN queries

def q_token_count(sf_dir):
    from unmixing_ray.stages import text
    return text.token_count(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]))


def q_lang_stats(sf_dir):
    from unmixing_ray.stages import text
    return text.lang_stats(_read(sf_dir, "documents",
                                 columns=["lang", "n_chars"]))


def q_quality_score(sf_dir):
    from unmixing_ray.stages import text
    return text.quality_score(_read(sf_dir, "documents",
                                    columns=["doc_id", "text"]))


def q_lang_id(sf_dir):
    from unmixing_ray.stages import text
    return text.lang_id(_read(sf_dir, "documents",
                              columns=["doc_id", "text"]))


def q_fingerprint(sf_dir):
    from unmixing_ray.stages import text
    return text.fingerprint(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]))


URL_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 4 = 0 THEN ' see https://site'"
    " || CAST(doc_id % 20 AS VARCHAR)"
    " || '.example.org/page now' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN ' via http://cdn'"
    " || CAST(doc_id % 10 AS VARCHAR) || '.example.net/x'"
    " ELSE '' END")


def q_url_domains(sf_dir):
    """Compiled-regex URL-domain extraction + per-domain counts
    (stages/text.py:UrlDomainCounter — pattern compiled ONCE per actor;
    per-batch count partials before the tiny groupby). The corpus
    carries no URLs, so both sides plant them inline as the SAME pure
    function of doc_id (URL_AUG_SQL); oracle extracts with DuckDB's
    regexp_extract_all over the identical augmented text."""
    from unmixing_ray.stages import text as tstage
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype(np.int64)
        s = df["text"].astype(str).to_numpy()
        ds_ = did.astype(str)
        a = np.where(did % 4 == 0,
                     " see https://site" + (did % 20).astype(str)
                     + ".example.org/page now", "")
        b = np.where(did % 6 == 0,
                     " via http://cdn" + (did % 10).astype(str)
                     + ".example.net/x", "")
        del ds_
        return pd.DataFrame({"doc_id": did, "text": s + a + b})

    return tstage.url_domains(
        ds.map_batches(aug, batch_format="pandas"))


PII_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user'"
    " || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' from 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END")


def q_pii_scrub(sf_dir):
    """PII redaction pass (stages/text.py:pii_scrub). The provided
    corpus carries no PII, so both the engine and the SQL oracle plant
    it inline as the SAME pure function of doc_id (PII_AUG_SQL) — the
    scrubbed-text md5 fingerprint then proves the rewritten text
    matches byte for byte."""
    from unmixing_ray.stages import text as tstage
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype(np.int64)
        s = df["text"].astype(str).to_numpy()
        ds_ = did.astype(str)
        e = np.where(did % 3 == 0,
                     " contact user" + ds_ + "@example.com now", "")
        ph = np.where(did % 5 == 0,
                      " call 555-" + (did % 1000).astype(str).str.zfill(3)
                      + "-" + (did % 10000).astype(str).str.zfill(4), "")
        ip = np.where(did % 7 == 0,
                      " from 10." + (did % 256).astype(str) + ".0.1", "")
        return pd.DataFrame({"doc_id": did, "text": s + e + ph + ip})

    return tstage.pii_scrub(ds.map_batches(aug, batch_format="pandas"))


MISSP_WORDS = ("table", "value", "batch", "merge",
               "window", "spark", "scan", "hash")
MISSP_AUG_SQL = (
    "text || CASE WHEN doc_id % 4 = 0 THEN ' ' || "
    "substr(w, 1, CAST((doc_id // 32) % 4 AS INTEGER)) || "
    "substr(w, CAST((doc_id // 32) % 4 AS INTEGER) + 2) ELSE '' END"
    .replace("w", "(CASE CAST((doc_id // 4) % 8 AS INTEGER) "
             + " ".join("WHEN %d THEN '%s'" % (i, w)
                        for i, w in enumerate(MISSP_WORDS))
             + " END)"))


def q_token_edit_join(sf_dir):
    """Edit-distance-1 token similarity join
    (stages/text.py:edit_distance_join — deletion-neighborhood
    blocking over the distinct-token table, exhaustive for lev-1 by
    construction, exact verify). The corpus vocabulary is clean, so
    both sides plant misspellings inline as the SAME pure function of
    doc_id (every 4th doc drops char (doc_id//32)%4 of word
    (doc_id//4)%8 — selectors decoupled from the %4 gate so all 32
    word×position variants occur); the oracle is DuckDB's exhaustive
    levenshtein()=1 self-join."""
    from unmixing_ray.stages import text as tstage
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    words = np.array(MISSP_WORDS)

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype(np.int64)
        w = words[((did // 4) % 8).to_numpy()]
        p = ((did // 32) % 4).to_numpy()
        missp = np.array([wi[:pi] + wi[pi + 1:]
                          for wi, pi in zip(w, p)], dtype=object)
        s = df["text"].astype(str).to_numpy()
        extra = np.where((did % 4 == 0).to_numpy(), " " + missp, "")
        return pd.DataFrame({"doc_id": did, "text": s + extra})

    return tstage.edit_distance_join(
        ds.map_batches(aug, batch_format="pandas"))


def q_repetition_filter(sf_dir):
    """Gopher-style duplicate-3-gram fraction per document
    (stages/text.py:gopher_repetition) — integer-exact dup_u6."""
    from unmixing_ray.stages import text as tstage
    return tstage.gopher_repetition(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n=3)


def q_substring_dup(sf_dir):
    """Exact duplicate-substring detection at 8-token-window
    granularity (stages/text.py:substring_dup — the Lee et al. 2021
    dedup signal re-expressed as hash-partitioned window keys; text
    never enters the exchange)."""
    from unmixing_ray.stages import text as tstage
    return tstage.substring_dup(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), window=8)


def q_orders_rank(sf_dir):
    """Exact distributed row_number() over all orders by
    (o_custkey, o_orderkey) (stages/relational.py:global_rank —
    bottom-m sketch boundaries, one narrow materialized pass,
    per-bucket prefix-sum bases; ~10 ties per custkey exercise the
    ties-never-straddle-a-boundary contract)."""
    from unmixing_ray.stages import relational
    return relational.global_rank(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        order_col="o_custkey", id_col="o_orderkey", n_buckets=32)


def q_csv_window(sf_dir):
    """Source-format coverage: the events log ingested from a sharded
    CSV mirror via ``ray.data.read_csv``
    (sources/images.py:read_events_csv) and windowed into tumbling
    1-hour per-type aggregates. Oracle: DuckDB read_csv_auto over the
    SAME CSV files (both engines parse the CSV independently;
    timestamps travel as int64 microseconds so inference cannot
    diverge)."""
    import pandas as pd
    from unmixing_ray.sources import images

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (df["ts_us"].astype("int64") // 3_600_000_000) \
            .astype("int64")
        g = pd.DataFrame({
            "event_type": df["event_type"], "hour_bucket": bucket,
            "value": df["value"]})
        out = g.groupby(["event_type", "hour_bucket"]).agg(
            n=("value", "size"), min_value=("value", "min"),
            max_value=("value", "max")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    partials = images.read_events_csv(sf_dir) \
        .map_batches(agg, batch_format="pandas").to_pandas()
    return partials.groupby(["event_type", "hour_bucket"],
                            as_index=False).agg(
        n=("n", "sum"), min_value=("min_value", "min"),
        max_value=("max_value", "max"))


def q_user_anomalies(sf_dir):
    """Per-user daily-count anomaly flags (stages/events.py:
    user_anomalies): exact integer z-score cross-multiplication, count
    partials bound the exchange to one row per (batch, user, day)."""
    from unmixing_ray.stages import events as estage
    return estage.user_anomalies(
        _read(sf_dir, "events", columns=["user_id", "ts"]))


def q_jsonl_quality(sf_dir):
    """Source-format coverage: the documents corpus ingested from a
    sharded JSONL mirror via ``ray.data.read_json``
    (sources/images.py:read_documents_jsonl) and run through the
    quality-score stage unchanged — operators are source-agnostic.
    Oracle: DuckDB read_json_auto over the SAME JSONL files (both
    engines parse the JSON independently; the parquet never enters)."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages import text as tstage
    ds = images.read_documents_jsonl(sf_dir)
    return tstage.quality_score(ds)


def q_compression_filter(sf_dir):
    """Deflate-compressibility curation gate (stages/text.py:
    compression_signal — the Gopher repetitiveness/noise filter):
    per-doc zlib ratio + keep verdict, no exchange. Oracle: the SQL
    recomputes ratio and verdict from a raw-fact sidecar (only the
    deterministic deflate byte count is replayed)."""
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import text as tstage
    synth.generate_compression_expected(sf_dir)
    return tstage.compression_signal(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_line_dedup(sf_dir):
    """CCNet-style cross-corpus duplicate-line removal with ordered
    document reconstruction (stages/text.py:line_dedup): 8-token chunks
    whose string occurs in >= 2 distinct documents are dropped from
    every document; runs over documents ∪ planted perturbed copies
    (the shared perturb_docs construction — the base corpus has no
    cross-doc duplicate chunks), so ~43% of each planted doc's chunks
    survive in both members. Oracle: pure SQL over the same union
    (planted_docs.parquet sidecar), grouping by the chunk string."""
    from unmixing_ray.stages import text as tstage
    return tstage.line_dedup(_planted_neardup_docs(sf_dir), chunk=8)


def q_pack_chunks(sf_dir):
    """LLM sequence packing: concat-and-chunk placement of every
    document in the doc_id-ordered token stream via a distributed
    prefix sum (stages/text.py:pack_chunks — narrow materialized
    (doc_id, n_tokens) pass, ordered range buckets, P-row driver
    offset table)."""
    from unmixing_ray.stages import text as tstage
    return tstage.pack_chunks(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        seq_len=512)


def q_chunk_spans(sf_dir):
    """Overlapping sliding-window chunk spans per document (the RAG /
    long-context chunker complementing pack_chunks' disjoint stream
    packing): windows of 32 tokens advancing by 24 (sized so the
    testdata's 10-99-token docs produce real multi-chunk overlap),
    pure per-row
    Arrow explode, no shuffle (stages/text.py:chunk_spans). Oracle:
    generate_series lateral over identical integer window
    arithmetic."""
    from unmixing_ray.stages import text as tstage
    return tstage.chunk_spans(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        seq_len=32, stride=24)


_CURATION_MEMO = {}


def _run_curation(sf_dir):
    """Run (or resume) the end-to-end curation composition pipeline
    (pipelines/curation.py:run_curation — VERDICT r03 item 9) into a
    checkpointed /tmp dir; memoized per sf_dir so the ledger and
    placement queries share one run."""
    key = str(sf_dir)
    if key not in _CURATION_MEMO:
        from unmixing_ray.pipelines import curation
        _CURATION_MEMO[key] = curation.run_curation(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            _out_dir("curation", sf_dir), seq_len=512, threshold=0.35)
    return _CURATION_MEMO[key]


def _run_curation_antijoin(sf_dir):
    """The same curation composition forced onto the DISTRIBUTED
    drop-set route (drop_broadcast_cap=0 — every non-empty drop set
    stays a Dataset, survivors route through the tag-union anti_join,
    the ledger is the narrow tag-code groupby(doc_id) Max union, and
    keep-best runs the Bloom-pruned hash-join path). Same oracles as
    the broadcast route: the strategy switch must be semantically
    invisible (VERDICT r04 item 1)."""
    key = "aj:" + str(sf_dir)
    if key not in _CURATION_MEMO:
        from unmixing_ray.pipelines import curation
        _CURATION_MEMO[key] = curation.run_curation(
            _read(sf_dir, "documents", columns=["doc_id", "text"]),
            _out_dir("curation_aj", sf_dir), seq_len=512,
            threshold=0.35, drop_broadcast_cap=0)
    return _CURATION_MEMO[key]


def q_curation_ledger_antijoin(sf_dir):
    """Per-doc verdict ledger from the anti-join drop-set route
    (drop_broadcast_cap=0): gate | exact_dup | near_dup | kept with
    zero driver-resident drop ids. Oracle: identical SQL decision
    chain as curation_ledger — route-invariance is the contract."""
    from unmixing_ray.state import manifest as ckpt
    res = _run_curation_antijoin(sf_dir)
    t = ckpt.read_output(res["ledger_dir"])
    return t.select(["doc_id", "verdict"])


def q_curation_pipeline_antijoin(sf_dir):
    """Packed-chunk placement from the anti-join drop-set route.
    Oracle: identical pack_chunks_sql chain as curation_pipeline."""
    from unmixing_ray.state import manifest as ckpt
    res = _run_curation_antijoin(sf_dir)
    t = ckpt.read_output(res["placement_dir"])
    return t.select(["doc_id", "n_tokens", "tok_start", "chunk_first",
                     "chunk_last", "n_chunks"])


def q_curation_ledger(sf_dir):
    """End-to-end curation composition, verdict ledger: one row per
    input doc with its stage of elimination (gate | exact_dup |
    near_dup | kept) after C4 gates -> exact dedup -> MinHash-LSH
    near-dup -> keep-best-per-cluster. Oracle: the full decision chain
    replayed in SQL (gates + keep-first window + recursive-CTE
    components over the exact Jaccard sidecar + keep-best window)."""
    from unmixing_ray.state import manifest as ckpt
    res = _run_curation(sf_dir)
    t = ckpt.read_output(res["ledger_dir"])
    return t.select(["doc_id", "verdict"])


def q_curation_pipeline(sf_dir):
    """End-to-end curation composition, packed output: the
    chunk-placement table of exactly the docs the curation chain kept,
    read back from the checkpointed manifest-tracked write. Oracle:
    pack_chunks_sql over the kept set from the same SQL decision
    chain."""
    from unmixing_ray.state import manifest as ckpt
    res = _run_curation(sf_dir)
    t = ckpt.read_output(res["placement_dir"])
    return t.select(["doc_id", "n_tokens", "tok_start", "chunk_first",
                     "chunk_last", "n_chunks"])


def q_decontaminate(sf_dir):
    """Benchmark decontamination: per-doc 8-token-window overlap counts
    against a benchmark table (docs with doc_id % 17 = 3 — a pure
    function of the shared corpus, so overlap is non-vacuous by
    construction), via broadcast set-membership probe
    (stages/text.py:decontaminate)."""
    from unmixing_ray.stages import text as tstage
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 17 == 3], batch_format="pandas")
    return tstage.decontaminate(docs, bench, window=8)


TEXTPREP_BASE_SQL = ("SELECT doc_id, text FROM documents "
                     "UNION ALL SELECT 2000000 + doc_id, text "
                     "FROM documents WHERE doc_id % 11 = 0")


def q_dataset_split(sf_dir):
    """Deterministic train/val/test split assignment over documents
    (stages/relational.py:split_assign): split = pure function of
    md5(doc_id), so rows never migrate between splits as the corpus
    grows; DuckDB replays the identical hash predicate."""
    from unmixing_ray.stages import relational
    return relational.split_assign(
        _read(sf_dir, "documents", columns=["doc_id"]), "doc_id")


def q_corpus_mix(sf_dir):
    """Deterministic source-weighted corpus mixing
    (stages/relational.py:corpus_mix): per-source quota sampling in id
    order via an exact distributed GROUPED row_number — range-bucket
    count partials, a (buckets x sources) driver prefix table, one
    groupby(bucket) exchange. Quota arithmetic is pure int64 so the
    SQL window replay is hash-identical."""
    from unmixing_ray.stages import relational
    return relational.corpus_mix(
        _read(sf_dir, "documents", columns=["doc_id"]), "doc_id")


def q_doc_freq_score(sf_dir):
    """Unigram corpus-frequency quality score — the broadcast-model
    shape (stages/text.py:doc_freq_score): pass 1 builds the global
    top-V unigram table (combiner-before-shuffle, V-row driver
    collect), pass 2 scores every document against the ray.put
    broadcast model; integer-exact so the DuckDB replay hash-matches."""
    from unmixing_ray.stages import text as tstage
    return tstage.doc_freq_score(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_imageprep_decisions(sf_dir):
    """End-to-end multimodal corpus curation: per-IMAGE keep/drop
    verdict with reason code (stages/curate.py:imageprep_decisions —
    decode once, every gate off the same ndarray: NoData gap, cfmask
    QA cloud, radiometric saturation, caption topic; then keep-first
    phash dedup among passers; one feature pass, one narrow shuffle of
    (image_id, verdict, key) — pixels/captions never shuffled). Oracle:
    the generator's inline-numpy planted-feature sidecar for the
    decode-derived gates + plain SQL for the caption and dedup gates;
    every branch is non-vacuous at sf0.01 (NoData seq%7, QA seq%4,
    saturation seq%5, topic-less captions ~26%, planted exact
    duplicates seq%97==1)."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages import curate
    return curate.imageprep_decisions(images.read_images(_corpus(sf_dir)))


def q_textprep_decisions(sf_dir):
    """End-to-end training-data prep: per-document keep/drop verdict
    with reason code (stages/text.py:textprep_decisions — one feature
    pass, one narrow shuffle; gates then keep-first dedup). Exact
    duplicates are planted as a pure function of doc_id on BOTH sides
    (the corpus has none) so the 'duplicate' branch is non-vacuous."""
    import ray.data
    from unmixing_ray.stages import text as tstage
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["doc_id"] % 11 == 0].copy()
        c["doc_id"] = c["doc_id"].astype(np.int64) + 2_000_000
        return c

    return tstage.textprep_decisions(
        base.union(base.map_batches(plant, batch_format="pandas")))


def q_streaming_dedup(sf_dir):
    """Streaming admission dedup against a sharded SHARED MUTABLE INDEX
    (stages/state_dedup.py — the engine's one raw-actor operator, the
    documented Dataset-API escape hatch): exact duplicates planted as a
    pure fn of doc_id on both sides; WHICH copy survives is
    arrival-order-dependent, so the query returns the admitted-key SET
    (one row per distinct content hash), which IS deterministic."""
    from unmixing_ray.stages import state_dedup

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["doc_id"] % 7 == 0].copy()
        c["doc_id"] = c["doc_id"].astype(np.int64) + 3_000_000
        return c

    full = base.union(base.map_batches(plant, batch_format="pandas"))
    kept = state_dedup.streaming_exact_dedup(full)
    return kept.select_columns(["content_hash"])


def q_dedup_exact_docs(sf_dir):
    from unmixing_ray.stages import dedup
    return dedup.exact_dedup_docs(_read(sf_dir, "documents",
                                        columns=["doc_id", "text"]))


def q_minhash_pairs(sf_dir):
    from unmixing_ray.stages import dedup
    return dedup.minhash_lsh_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.35)


def q_simhash_pairs(sf_dir):
    from unmixing_ray.stages import dedup
    return dedup.simhash_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_dedup_clusters(sf_dir):
    """Near-dup pair list → connected components → canonical doc per
    cluster. Oracle: recursive-CTE transitive closure over the exact
    Jaccard sidecar (the engine's pair list is proven equal to that
    sidecar by q_minhash_pairs)."""
    from unmixing_ray.stages import dedup
    pairs = dedup.minhash_lsh_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.35)
    return dedup.resolve_duplicate_clusters(pairs)


def q_dedup_keep_best(sf_dir):
    """Quality-aware duplicate resolution (stages/dedup.py:
    keep_best_per_cluster): near-dup clusters keep their most-token-rich
    member instead of the arbitrary min-id — the action real pipelines
    take after MinHash. Cluster map broadcast (pair-bounded), one
    filtered token-count pass, per-cluster argmax groupby. Oracle:
    recursive-CTE components over the exact Jaccard sidecar + a SQL
    window function."""
    from unmixing_ray.stages import dedup
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(base, threshold=0.35)
    return dedup.keep_best_per_cluster(base, pairs)


def q_fuzzy_decontaminate(sf_dir):
    """Cross-corpus MinHash-LSH near-dup JOIN (stages/dedup.py:
    cross_corpus_minhash_join) — fuzzy benchmark decontamination:
    training docs near-duplicate to a (perturbed) benchmark doc, found
    without broadcasting either side. Benchmark side = the shared
    perturb_docs construction; oracle = the exact all-pairs Jaccard
    sidecar restricted to cross pairs."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import dedup
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])
    head = base.to_pandas().sort_values("doc_id").head(20)
    planted = synth.perturb_docs(
        dict(zip((int(i) for i in head["doc_id"]), head["text"])),
        n_dups=20, seed=99)
    bench = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in planted])
    return dedup.cross_corpus_minhash_join(base, bench, threshold=0.5)


def q_augment_images(sf_dir):
    """Deterministic flip+crop image augmentation (stages/augment.py):
    md5(image_id)-derived parameters, position-weighted checksum pins
    the exact augmented array, caption carried through (the north-star
    caption-equality invariant). Oracle = single-machine explicit
    coordinate-mapping replay written at corpus generation."""
    import ray.data
    from unmixing_ray.stages import augment
    corpus = _corpus(sf_dir)
    images = ray.data.read_parquet(
        os.path.join(corpus, "images"), file_extensions=["parquet"],
        columns=["image_id", "bytes", "w", "h", "fmt", "caption"])
    return augment.augment_images(images)


def q_coregister(sf_dir):
    """Integer image co-registration (stages/register.py): per image
    the band-0 plane is circularly shifted by a planted (dy, dx) that
    is a pure function of its sequence number; the operator recovers
    the shift as the argmax of the EXACT int64 circular
    cross-correlation surface over a ±3 window (one stateless
    map_batches pass, planes as raw int16 payloads, no shuffle).
    Oracle: closed-form SQL of the plant spec — a hash match proves
    the correlation found every planted translation."""
    import ray.data
    from unmixing_ray.stages import register
    corpus = _corpus(sf_dir)
    images = ray.data.read_parquet(
        os.path.join(corpus, "images"), file_extensions=["parquet"],
        columns=["image_id", "bytes", "w", "h", "fmt"])
    pairs = images.map_batches(register.make_planted_pairs(max_shift=3),
                               batch_format="pyarrow", batch_size=64)
    return register.coregister(pairs, max_shift=3)


def q_events_range_window(sf_dir):
    """ANSI RANGE-frame trailing-time window aggregate
    (stages/events.py:range_window_sum): per event the count and exact
    cent-sum of the same user's events in the trailing 300 s,
    peers-at-equal-ts included — one groupby(user) exchange, per-user
    prefix sums + two searchsorted probes. Oracle: DuckDB RANGE
    BETWEEN INTERVAL window replay."""
    from unmixing_ray.stages import events as estage
    return estage.range_window_sum(_read(sf_dir, "events"),
                                   window_s=300)


def q_events_interpolate(sf_dir):
    """As-of linear interpolation (stages/events.py:asof_interpolate):
    per purchase event the same user's bracketing click values
    interpolated at the probe time as an EXACT rational
    (num_cents_us, den_us), one-sided fallbacks tagged by status.
    Oracle: LATERAL bracket replay in SQL."""
    from unmixing_ray.stages import events as estage
    return estage.asof_interpolate(_read(sf_dir, "events"),
                                   probe_type="purchase",
                                   sample_type="click")


def q_blur_scores(sf_dir):
    """Laplacian blur-detection curation gate
    (stages/curate.py:blur_scores): exact int64 Laplacian moment
    ingredients per image, one stateless decode pass, no shuffle.
    Oracle: independent full-image replay sidecar."""
    import ray.data
    from unmixing_ray.stages import curate
    corpus = _corpus(sf_dir)
    images = ray.data.read_parquet(
        os.path.join(corpus, "images"), file_extensions=["parquet"],
        columns=["image_id", "bytes", "w", "h", "fmt"])
    return curate.blur_scores(images)


def q_otsu_binarize(sf_dir):
    """Corpus-global Otsu auto-threshold + per-image binarization
    (stages/enhance.py:otsu_binarize): tiny combiner histogram pass →
    EXACT fixed-point threshold pick on the driver → broadcast scalar
    → per-image count combiner + one groupby(image_id). Oracle: the
    full chain replayed in SQL (HUGEINT score) from the independent
    per-image-histogram sidecar."""
    from unmixing_ray.stages import enhance
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return enhance.otsu_binarize(tiles)


def q_hough_lines(sf_dir):
    """Rational-direction Hough line voting (stages/hough.py): masked
    pixels vote integer (dir, rho) lines through a per-batch bincount
    combiner + ONE groupby(image_id, dir, rho) + a packed-argmax
    reduce; recovers the planted NODATA strips. Oracle: CLOSED-FORM
    expectation from the plant spec (the detector never runs on the
    oracle side)."""
    from unmixing_ray.stages import hough
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return hough.hough_lines(tiles)


def q_morph_open(sf_dir):
    """Binary morphological opening of the band-0 classification
    (stages/morphology.py:morph_open_tiles): the first CHAINED
    halo-exchange pipeline — erode (focal min) feeds a second exchange
    for dilate (focal max) through the _focal_to_pixels adapter.
    Oracle: full-image shrink-window replay sidecar, per-tile counts +
    position-weighted checksum."""
    from unmixing_ray.stages import morphology
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return morphology.morph_open_tiles(tiles, threshold=2500)


def q_image_hulls(sf_dir):
    """Distributed convex hull per image (stages/hull.py:image_hulls):
    each tile reduces to its own strict integer hull (hull-of-hulls
    combiner — O(hull) rows leave a tile, never pixels), ONE
    groupby(image_id) re-runs the exact monotone chain. Oracle:
    INDEPENDENT gift-wrapping replay sidecar over the full-image
    decode."""
    from unmixing_ray.stages import hull
    _corpus_dir, tiles = _tiles_ds(sf_dir)
    return hull.image_hulls(tiles, threshold=2000)


def q_bigram_lm(sf_dir):
    """Bigram LM quality score (stages/text.py:bigram_lm_score): the
    perplexity-filter shape with exact fixed-point conditional ratios
    — top-V bigram model via combiner groupby + distributed sort/limit,
    w1-restricted unigram counts, broadcast scoring. Oracle replays
    tokenizer, tiebreak and floor ratio in SQL."""
    from unmixing_ray.stages import text
    return text.bigram_lm_score(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        vocab_size=1024)


def q_corpus_filter(sf_dir):
    from unmixing_ray.stages import text
    return text.corpus_filter(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def q_embedding_quantize(sf_dir):
    """Symmetric per-vector int8 embedding quantization
    (stages/ann.py:quantize_int8) — 4x vector compression for every
    downstream ANN exchange; float64 promotion order chosen so the
    DuckDB replay is bit-identical, outputs integer summaries."""
    from unmixing_ray.stages import ann
    return ann.quantize_int8(_read(sf_dir, "embeddings"))


def q_label_centroids(sf_dir):
    """Per-label embedding centroid sums (stages/ann.py:
    label_centroids) — the nearest-centroid-classifier build step as an
    associative fixed-point reduce (floor(x·2^20) int64 coordinates,
    so no float is ever summed and batching order cannot matter)."""
    from unmixing_ray.stages import ann
    return ann.label_centroids(_read(sf_dir, "embeddings"))


def q_knn_graph(sf_dir):
    """Exact cosine kNN-graph build (stages/ann.py:knn_graph): every
    vector's top-5 neighbors, guarded brute force (IVF/LSH are the
    scale paths), quantized ranking with vec_id tiebreak. Oracle:
    self cross-join + window replay."""
    from unmixing_ray.stages import ann
    return ann.knn_graph(_read(sf_dir, "embeddings"), k=5)


def q_ann_topk(sf_dir):
    from unmixing_ray.stages import ann
    return ann.brute_force_topk(_read(sf_dir, "embeddings"), k=10)


def q_ann_lsh(sf_dir):
    from unmixing_ray.stages import ann
    return ann.lsh_topk(_read(sf_dir, "embeddings"), k=10)


def q_cosine_near_dup(sf_dir):
    # threshold chosen so the synthetic embeddings yield real pairs (their
    # max pairwise cosine is ~0.51); the operator is threshold-generic
    from unmixing_ray.stages import ann
    return ann.cosine_near_dup_exact(_read(sf_dir, "embeddings"),
                                     threshold=0.45)


def q_cosine_near_dup_lsh(sf_dir):
    """Embedding-cosine near-dup via multi-table LSH buckets over the
    embeddings table ∪ planted perturbed copies (the provided table has
    no pairs above 0.95, so round 2's run was vacuous). Hard oracle: the
    generation-time exact all-pairs cosine sidecar."""
    import ray.data
    from unmixing_ray.sources import synth
    from unmixing_ray.stages import ann
    corpus = synth.generate_embeddings_planted(sf_dir)
    base = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if corpus is not None:
        planted = ray.data.read_parquet(
            os.path.join(corpus, "embeddings_planted.parquet"))
        base = base.union(planted)
    out = ann.cosine_near_dup_pairs(base, threshold=0.95).to_pandas()
    out = out[["vec_a", "vec_b"]].astype("int64")
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# phash near-dup planting: a constant 3-bit XOR mask (bits 3, 17, 42) —
# a PURE function of the corpus, so the DuckDB oracle replays the
# planting inline and the exact all-pairs Hamming check needs no sidecar
PHASH_PLANT_MASK = (1 << 3) | (1 << 17) | (1 << 42)
PHASH_PLANT_MOD = 50


def q_phash_near_dup(sf_dir):
    """Image near-duplicate pairs by perceptual-hash Hamming distance
    (the LAION/DataComp image-dedup shape). The corpus phash is a
    content hash, so near-dup pairs are planted: every image with
    seq % 50 == 0 gets a twin whose phash differs in exactly 3 fixed
    bits — a pure function the SQL oracle replays, making the oracle an
    exact all-pairs popcount(xor) <= 4 with no sidecar. Exact-duplicate
    images (planted at seq % 97 == 1) surface at hamming 0."""
    from unmixing_ray.sources import images
    from unmixing_ray.stages.dedup import signature_hamming_pairs
    corpus = _corpus(sf_dir)
    ds = images.read_images(corpus, columns=["image_id", "phash"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        seq = df["image_id"].str.slice(3).astype("int64")
        sel = df[(seq % PHASH_PLANT_MOD == 0).to_numpy()]
        extra = pd.DataFrame({
            "image_id": sel["image_id"] + "_nd",
            "phash": sel["phash"].to_numpy(dtype=np.int64)
            ^ np.int64(PHASH_PLANT_MASK)})
        return pd.concat([df[["image_id", "phash"]], extra],
                         ignore_index=True)

    planted = ds.map_batches(plant, batch_format="pandas")
    return signature_hamming_pairs(planted, id_col="image_id",
                                   sig_col="phash", max_hamming=4)


# ---------------------------------------------------------------------------
# registries

def queries() -> dict[str, Callable[[str], Any]]:
    # generate the corpora the driver will exercise (cached, idempotent)
    from unmixing_ray.sources import synth as _synth
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if os.path.isdir(sf):
            try:
                _corpus(sf)
                _synth.ensure_skewed_corpus(sf)
                _synth.generate_trend_expected(sf)
                _synth.generate_change_expected(sf)
                _synth.generate_cube_expected(sf)
                _synth.generate_compression_expected(sf)
                _im = __import__('unmixing_ray.sources.images', fromlist=['x'])
                _im.ensure_documents_jsonl(sf)
                _im.ensure_events_csv(sf)
                _synth.generate_latest_expected(sf)
                _synth.ensure_media(sf)
                _synth.generate_neardup_expected(sf)
                _synth.generate_embeddings_planted(sf)
                _synth.generate_focal_expected(sf)
                _synth.generate_focal_median_expected(sf)
                _synth.generate_conv_expected(sf)
                _synth.generate_glcm_expected(sf)
                _synth.generate_pyramid_expected(sf)
                _synth.generate_terrain_expected(sf)
                _synth.generate_contour_expected(sf)
                _synth.generate_pca_expected(sf)
                _synth.generate_zonalmedian_expected(sf)
                _synth.generate_blur_expected(sf)
                _synth.generate_percentile_expected(sf)
                _synth.generate_resample_expected(sf)
                _synth.generate_silence_expected(sf)
                _synth.generate_motion_clips(sf)
                _synth.generate_hillshade_expected(sf)
                _synth.generate_intersect_expected(sf)
                _synth.generate_distance_expected(sf)
                _synth.generate_equalize_expected(sf)
                _synth.generate_match_expected(sf)
                _synth.generate_augment_expected(sf)
                _synth.generate_warp_expected(sf)
                _synth.generate_components_expected(sf)
                _synth.generate_majority_expected(sf)
                _synth.generate_flow_expected(sf)
                _synth.generate_regionprops_expected(sf)
                _synth.generate_tilesums_expected(sf)
                _synth.generate_tileclass_expected(sf)
                _synth.generate_bpe_expected(sf)
                _synth.generate_bpe_encode_expected(sf)
                _synth.generate_otsu_expected(sf)
                _synth.generate_hough_expected(sf)
                _synth.generate_morph_expected(sf)
                _synth.generate_hull_expected(sf)
                _synth.generate_simplify_expected(sf)
                _synth.generate_dhash_expected(sf)
                _synth.generate_letterbox_expected(sf)
                _synth.generate_caption_lcs_expected(sf)
            except Exception:
                pass
    return {
        "tile_assignment": q_tile_assignment,
        "focal_mean": q_focal_mean,
        "focal_median": q_focal_median,
        "convolve_gaussian": q_convolve_gaussian,
        "glcm_texture": q_glcm_texture,
        "pyramid_overview": q_pyramid_overview,
        "terrain_slope": q_terrain_slope,
        "contour_segments": q_contour_segments,
        "focal_majority": q_focal_majority,
        "flow_direction": q_flow_direction,
        "hillshade": q_hillshade,
        "retile": q_retile,
        "warp_bilinear": q_warp_bilinear,
        "distance_transform": q_distance_transform,
        "histogram_equalize": q_histogram_equalize,
        "histogram_match": q_histogram_match,
        "augment_images": q_augment_images,
        "coregister": q_coregister,
        "pca_project": q_pca_project,
        "zonal_median": q_zonal_median,
        "bigram_lm": q_bigram_lm,
        "blur_scores": q_blur_scores,
        "events_range_window": q_events_range_window,
        "events_interpolate": q_events_interpolate,
        "composite_percentile": q_composite_percentile,
        "audio_resample": q_audio_resample,
        "audio_silence": q_audio_silence,
        "video_motion": q_video_motion,
        "daily_locf": q_daily_locf,
        "events_window_join": q_events_window_join,
        "image_dup_clusters": q_image_dup_clusters,
        "user_trend": q_user_trend,
        "polygon_clusters": q_polygon_clusters,
        "table_checksum": q_table_checksum,
        "zonemap_prune": q_zonemap_prune,
        "zorder_prune": q_zorder_prune,
        "trending_types": q_trending_types,
        "session_overlap": q_session_overlap,
        "decay_score": q_decay_score,
        "scd2_intervals": q_scd2_intervals,
        "seasonality": q_seasonality,
        "pq_codes": q_pq_codes,
        "otsu_binarize": q_otsu_binarize,
        "hough_lines": q_hough_lines,
        "morph_open": q_morph_open,
        "image_hulls": q_image_hulls,
        "caption_consistency": q_caption_consistency,
        "spatial_split": q_spatial_split,
        "json_props": q_json_props,
        "attribution": q_attribution,
        "hull_simplify": q_hull_simplify,
        "interarrival": q_interarrival,
        "orders_winsorized": q_orders_winsorized,
        "profile_orders": q_profile_orders,
        "dhash_pairs": q_dhash_pairs,
        "embedding_clip": q_embedding_clip,
        "key_skew": q_key_skew,
        "rank_sum_drift": q_rank_sum_drift,
        "letterbox": q_letterbox,
        "caption_lcs": q_caption_lcs,
        "intersect_resample": q_intersect_resample,
        "raster_components": q_raster_components,
        "region_props": q_region_props,
        "areal_interp": q_areal_interp,
        "pixel_to_xy": q_pixel_to_xy,
        "spatial_join_pip": q_spatial_join_pip,
        "spatial_join_knn": q_spatial_join_knn,
        "zonal_stats": q_zonal_stats,
        "zonal_majority": q_zonal_majority,
        "lineitem_cube": q_lineitem_cube,
        "rasterize_count": q_rasterize_count,
        "mask_counts": q_mask_counts,
        "band_stats": q_band_stats,
        "spectral_indices": q_spectral_indices,
        "image_dedup_phash": q_image_dedup_phash,
        "phash_near_dup": q_phash_near_dup,
        "decode_invariants": q_decode_invariants,
        "unmix_abundance": q_unmix_abundance,
        "flagship_abundance": q_flagship_abundance,
        "composite_cells": q_composite_cells,
        "tpch_q1": q_tpch_q1,
        "revenue_by_nation": q_revenue_by_nation,
        "events_window": q_events_window,
        "events_sessions": q_events_sessions,
        "retention_cohorts": q_retention_cohorts,
        "funnel_conversions": q_funnel_conversions,
        "transition_counts": q_transition_counts,
        "rolling_active_users": q_rolling_active_users,
        "user_top_event": q_user_top_event,
        "value_histogram": q_value_histogram,
        "events_asof": q_events_asof,
        "events_asof_forward": q_events_asof_forward,
        "events_sliding": q_events_sliding,
        "events_lag": q_events_lag,
        "events_session_join": q_events_session_join,
        "lineitem_rollup": q_lineitem_rollup,
        "cell_rollup": q_cell_rollup,
        "orders_topk": q_orders_topk,
        "customer_orders": q_customer_orders,
        "part_filter_topk": q_part_filter_topk,
        "top_orders_per_segment": q_top_orders_per_segment,
        "supplier_distinct_parts": q_supplier_distinct_parts,
        "customers_without_orders": q_customers_without_orders,
        "events_quantiles": q_events_quantiles,
        "events_quantiles_cont": q_events_quantiles_cont,
        "events_quantiles_by_user": q_events_quantiles_by_user,
        "events_pivot": q_events_pivot,
        "orders_join_lineitem": q_orders_join_lineitem,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q10": q_tpch_q10,
        "tpch_q17": q_tpch_q17,
        "tpch_q4": q_tpch_q4,
        "tpch_q12": q_tpch_q12,
        "tpch_q14": q_tpch_q14,
        "tpch_q19": q_tpch_q19,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q22": q_tpch_q22,
        "tpch_q6": q_tpch_q6,
        "tpch_q21": q_tpch_q21,
        "orders_ntile": q_orders_ntile,
        "lineitem_setops": q_lineitem_setops,
        "basket_pairs": q_basket_pairs,
        "user_streaks": q_user_streaks,
        "events_twap": q_events_twap,
        "sequence_match": q_sequence_match,
        "parts_skyline": q_parts_skyline,
        "merge_aggregate": q_merge_aggregate,
        "orders_price_band": q_orders_price_band,
        "mixture_sample": q_mixture_sample,
        "pagerank": q_pagerank,
        "cell_bfs": q_cell_bfs,
        "cell_sssp": q_cell_sssp,
        "flow_accumulation": q_flow_accumulation,
        "strahler_order": q_strahler_order,
        "viewshed": q_viewshed,
        "basin_label": q_basin_label,
        "morans_i": q_morans_i,
        "orders_snapshot_diff": q_orders_snapshot_diff,
        "triangle_count": q_triangle_count,
        "big_orders": q_big_orders,
        "lineitem_rank": q_lineitem_rank,
        "orders_running_total": q_orders_running_total,
        "orders_moving_window": q_orders_moving_window,
        "nations_agg": q_nations_agg,
        "lineitem_moments": q_lineitem_moments,
        "customer_orders_outer": q_customer_orders_outer,
        "suppliers_with_returns": q_suppliers_with_returns,
        "heavy_hitters_tokens": q_heavy_hitters_tokens,
        "bigram_topk": q_bigram_topk,
        "inverted_index": q_inverted_index,
        "embedding_covariance": q_embedding_covariance,
        "tfidf_topk": q_tfidf_topk,
        "kmeans_assign": q_kmeans_assign,
        "semdedup": q_semdedup,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "lineitem_sample": q_lineitem_sample,
        "orders_sample_per_priority": q_orders_sample_per_priority,
        "spectra_at_points": q_spectra_at_points,
        "salted_cell_counts": q_salted_cell_counts,
        "temporal_trend": q_temporal_trend,
        "epoch_change": q_epoch_change,
        "composite_cube": q_composite_cube,
        "composite_latest": q_composite_latest,
        "polygon_metrics": q_polygon_metrics,
        "polygon_centroids": q_polygon_centroids,
        "chunk_docs": q_chunk_docs,
        "dsir_weights": q_dsir_weights,
        "kcore": q_kcore,
        "graph_components": q_graph_components,
        "clustering_coeff": q_clustering_coeff,
        "link_predict": q_link_predict,
        "events_mad": q_events_mad,
        "fk_audit": q_fk_audit,
        "polygon_cover": q_polygon_cover,
        "box_join": q_box_join,
        "tile_poly_overlap": q_tile_poly_overlap,
        "polygon_union_area": q_polygon_union_area,
        "polygon_dissolve_area": q_polygon_dissolve_area,
        "cell_density": q_cell_density,
        "hall_rectification": q_hall_rectification,
        "sasma_abundance": q_sasma_abundance,
        "forward_model_rmse": q_forward_model_rmse,
        "minhash_pairs_planted": q_minhash_pairs_planted,
        "simhash_pairs_planted": q_simhash_pairs_planted,
        "token_count": q_token_count,
        "lang_stats": q_lang_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "textprep_decisions": q_textprep_decisions,
        "imageprep_decisions": q_imageprep_decisions,
        "doc_freq_score": q_doc_freq_score,
        "dataset_split": q_dataset_split,
        "corpus_mix": q_corpus_mix,
        "embedding_quantize": q_embedding_quantize,
        "label_centroids": q_label_centroids,
        "pii_scrub": q_pii_scrub,
        "token_edit_join": q_token_edit_join,
        "url_domains": q_url_domains,
        "repetition_filter": q_repetition_filter,
        "substring_dup": q_substring_dup,
        "line_dedup": q_line_dedup,
        "orders_rank": q_orders_rank,
        "compression_filter": q_compression_filter,
        "jsonl_quality": q_jsonl_quality,
        "user_anomalies": q_user_anomalies,
        "csv_window": q_csv_window,
        "pack_chunks": q_pack_chunks,
        "chunk_spans": q_chunk_spans,
        "curation_ledger": q_curation_ledger,
        "curation_pipeline": q_curation_pipeline,
        "curation_ledger_antijoin": q_curation_ledger_antijoin,
        "curation_pipeline_antijoin": q_curation_pipeline_antijoin,
        "decontaminate": q_decontaminate,
        "dedup_exact_docs": q_dedup_exact_docs,
        "streaming_dedup": q_streaming_dedup,
        "minhash_pairs": q_minhash_pairs,
        "ssjoin_pairs": q_ssjoin_pairs,
        "simhash_pairs": q_simhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "corpus_filter": q_corpus_filter,
        "ann_topk": q_ann_topk,
        "knn_graph": q_knn_graph,
        "ann_lsh": q_ann_lsh,
        "audio_features": q_audio_features,
        "audio_goertzel": q_audio_goertzel,
        "audio_downmix": q_audio_downmix,
        "video_scene_cuts": q_video_scene_cuts,
        "video_frame_sample": q_video_frame_sample,
        "cosine_near_dup": q_cosine_near_dup,
        "cosine_near_dup_lsh": q_cosine_near_dup_lsh,
    }


def _cluster_sql():
    from unmixing_ray.stages.cluster import assign_first_k_sql
    return assign_first_k_sql(k=8)


def _semdedup_sql():
    from unmixing_ray.stages.ann import semdedup_first_k_sql
    return semdedup_first_k_sql(k=8, threshold=0.45)


def _strahler_sql(corpus, rounds=4):
    """Stacked-CTE replay of strahler_order_lattice: the shared
    lattice/edge prefix of the flow_accumulation oracle, then per
    round a join + (cell, uord) count + max-order pick, with source
    cells re-unioned at order 1."""
    parts = [f"""
            WITH nn AS (
              SELECT DISTINCT CAST(cell_ix AS BIGINT) AS ix,
                              CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{corpus}/tiles_expected.parquet')),
            el AS (SELECT ix, iy,
                          (ix * 1000003 + iy * 7919) % 104729 AS e
                   FROM nn),
            cand AS (
              SELECT a.ix AS six, a.iy AS siy,
                     b.ix AS tix, b.iy AS tiy, b.e AS te, d.prec
              FROM el a
              CROSS JOIN (VALUES (0, 1, 0), (1, 0, 1),
                                 (2, -1, 0), (3, 0, -1))
                AS d(prec, dx, dy)
              JOIN el b ON b.ix = a.ix + d.dx AND b.iy = a.iy + d.dy
              WHERE b.e < a.e),
            e AS (SELECT six, siy, tix, tiy FROM (
                    SELECT cand.*,
                           row_number() OVER (PARTITION BY six, siy
                                              ORDER BY te, prec) AS rn
                    FROM cand) WHERE rn = 1),
            src AS (SELECT ix, iy FROM nn
                    WHERE NOT EXISTS (SELECT 1 FROM e
                                      WHERE e.tix = nn.ix
                                        AND e.tiy = nn.iy)),
            o0 AS (SELECT ix, iy, CAST(1 AS BIGINT) AS ord FROM nn)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
            up{k} AS (
              SELECT e.tix AS ix, e.tiy AS iy, o.ord AS uord
              FROM o{k - 1} o JOIN e
                ON e.six = o.ix AND e.siy = o.iy),
            g{k} AS (
              SELECT ix, iy, uord, CAST(count(*) AS BIGINT) AS c
              FROM up{k} GROUP BY ix, iy, uord),
            p{k} AS (
              SELECT ix, iy,
                     uord + CASE WHEN c >= 2 THEN 1 ELSE 0 END AS ord,
                     row_number() OVER (PARTITION BY ix, iy
                                        ORDER BY uord DESC) AS rn
              FROM g{k}),
            o{k} AS (
              SELECT ix, iy, CAST(ord AS BIGINT) AS ord
              FROM p{k} WHERE rn = 1
              UNION ALL
              SELECT ix, iy, CAST(1 AS BIGINT) AS ord FROM src)""")
    parts.append(f"""
            SELECT ix, iy, ord AS strahler FROM o{rounds}""")
    return "".join(parts)


def _events_sessions_sql():
    from unmixing_ray.stages.events import sessionize_sql
    return sessionize_sql()


def _events_asof_sql():
    from unmixing_ray.stages.events import asof_join_sql
    return asof_join_sql()


def _events_asof_forward_sql():
    from unmixing_ray.stages.events import asof_join_forward_sql
    return asof_join_forward_sql(tolerance_us=3_600_000_000)


def _events_sliding_sql():
    from unmixing_ray.stages.events import sliding_window_sql
    return sliding_window_sql()


def _events_lag_sql():
    from unmixing_ray.stages.events import lag_delta_sql
    return lag_delta_sql()


def _events_session_join_sql():
    from unmixing_ray.stages.events import session_lookup_sql
    return session_lookup_sql()


def _lineitem_rollup_sql():
    from unmixing_ray.stages.relational import rollup_sums_sql
    return rollup_sums_sql("lineitem", ["l_returnflag", "l_linestatus"],
                           "l_extendedprice")


def _cell_rollup_sql():
    from unmixing_ray.sources import synth
    from unmixing_ray.stages.rollup import cell_rollup_sql
    return cell_rollup_sql(SF01_CORPUS + "/tiles_expected.parquet",
                           base_level=synth.CELL_LEVEL, steps=(0, 1, 2, 3))




def _zorder_sql_lazy():
    from unmixing_ray.state import zonemap
    xlo, xhi, ylo, yhi = _ZORDER_BOX
    return zonemap.zorder_sql(
        "o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT)",
        "epoch_us(o_orderdate) // 86400000000", "orders",
        xlo, xhi, ylo, yhi, n_files=16)


def _zonemap_sql_lazy():
    from unmixing_ray.state import zonemap
    return zonemap.zonemap_sql("orders", "o_totalprice", "o_orderkey",
                               50000, 100000, n_files=16)


def oracle_sql() -> dict[str, str]:
    # the corpus-reading oracles need the synthetic tables on disk; make
    # sure they exist even if the driver evaluates SQL before running the
    # corresponding Ray query (generation is cached/idempotent)
    from unmixing_ray.sources import synth as _synth
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if os.path.isdir(sf):
            try:
                _corpus(sf)
                _synth.ensure_skewed_corpus(sf)
                _synth.generate_trend_expected(sf)
                _synth.generate_change_expected(sf)
                _synth.generate_cube_expected(sf)
                _synth.generate_compression_expected(sf)
                _im = __import__('unmixing_ray.sources.images', fromlist=['x'])
                _im.ensure_documents_jsonl(sf)
                _im.ensure_events_csv(sf)
                _synth.generate_latest_expected(sf)
                _synth.ensure_media(sf)
                _synth.generate_neardup_expected(sf)
                _synth.generate_embeddings_planted(sf)
                _synth.generate_focal_expected(sf)
                _synth.generate_focal_median_expected(sf)
                _synth.generate_conv_expected(sf)
                _synth.generate_glcm_expected(sf)
                _synth.generate_pyramid_expected(sf)
                _synth.generate_terrain_expected(sf)
                _synth.generate_contour_expected(sf)
                _synth.generate_pca_expected(sf)
                _synth.generate_zonalmedian_expected(sf)
                _synth.generate_blur_expected(sf)
                _synth.generate_percentile_expected(sf)
                _synth.generate_resample_expected(sf)
                _synth.generate_silence_expected(sf)
                _synth.generate_motion_clips(sf)
                _synth.generate_hillshade_expected(sf)
                _synth.generate_intersect_expected(sf)
                _synth.generate_distance_expected(sf)
                _synth.generate_equalize_expected(sf)
                _synth.generate_match_expected(sf)
                _synth.generate_augment_expected(sf)
                _synth.generate_warp_expected(sf)
                _synth.generate_components_expected(sf)
                _synth.generate_majority_expected(sf)
                _synth.generate_flow_expected(sf)
                _synth.generate_regionprops_expected(sf)
                _synth.generate_tilesums_expected(sf)
                _synth.generate_tileclass_expected(sf)
                _synth.generate_bpe_expected(sf)
                _synth.generate_bpe_encode_expected(sf)
                _synth.generate_otsu_expected(sf)
                _synth.generate_hough_expected(sf)
                _synth.generate_morph_expected(sf)
                _synth.generate_hull_expected(sf)
                _synth.generate_simplify_expected(sf)
                _synth.generate_dhash_expected(sf)
                _synth.generate_letterbox_expected(sf)
                _synth.generate_caption_lcs_expected(sf)
            except Exception:
                pass
    from unmixing_ray.stages import (ann, enhance, events, register,
                                     relational, text)
    from unmixing_ray.pipelines import curation as _curation
    C = SF01_CORPUS
    return {
        "tile_assignment": f"""
            SELECT tile_id, image_id,
                   CAST(row_off AS BIGINT) AS row_off,
                   CAST(col_off AS BIGINT) AS col_off,
                   CAST(cell_ix AS BIGINT) AS cell_ix,
                   CAST(cell_iy AS BIGINT) AS cell_iy, cx, cy
            FROM read_parquet('{C}/tiles_expected.parquet')""",
        "pixel_to_xy": f"""
            SELECT tile_id,
                   0*gt1 + gt0 AS x0, 0*gt5 + gt3 AS y0,
                   32*gt1 + gt0 AS x1, 32*gt5 + gt3 AS y1
            FROM read_parquet('{C}/tiles_expected.parquet')""",
        "focal_mean": f"""
            SELECT tile_id, band, focal_sum_u
            FROM read_parquet('{C}/focal_expected.parquet')""",
        "focal_median": f"""
            SELECT tile_id, band, focal_sum_u
            FROM read_parquet('{C}/focal_median_expected.parquet')""",
        "convolve_gaussian": f"""
            SELECT tile_id, band, conv_sum, n_valid
            FROM read_parquet('{C}/conv_expected.parquet')""",
        "glcm_texture": f"""
            SELECT image_id, la, lb, n
            FROM read_parquet('{C}/glcm_expected.parquet')""",
        "pyramid_overview": f"""
            SELECT ov_id, band, ov_sum_u
            FROM read_parquet('{C}/pyramid_expected.parquet')""",
        "terrain_slope": f"""
            SELECT tile_id, sum_abs_dzdx, sum_abs_dzdy, sum_rugged,
                   n_valid
            FROM read_parquet('{C}/terrain_expected.parquet')""",
        "contour_segments": f"""
            SELECT tile_id, n_cells, n_segments, case_checksum
            FROM read_parquet('{C}/contour_expected.parquet')""",
        "pca_project": f"""
            SELECT vec_id, pj0, pj1, pj2, pj3
            FROM read_parquet('{C}/pca_expected.parquet')""",
        "zonal_median": f"""
            SELECT poly_id, n_px, med_lo, med_hi
            FROM read_parquet('{C}/zonalmedian_expected.parquet')""",
        "blur_scores": f"""
            SELECT image_id, lap_sum, lap_sq, n_lap
            FROM read_parquet('{C}/blur_expected.parquet')""",
        "otsu_binarize": enhance.otsu_binarize_sql(
            f"{C}/otsu_hist_expected.parquet"),
        "hough_lines": f"""
            SELECT image_id, dir, best_rho, votes
            FROM read_parquet('{C}/hough_expected.parquet')""",
        "morph_open": f"""
            SELECT image_id, row_off, col_off, n_open, open_wsum
            FROM read_parquet('{C}/morph_expected.parquet')""",
        "image_hulls": f"""
            SELECT image_id, n_hull, area2, hull_wsum
            FROM read_parquet('{C}/hull_expected.parquet')""",
        "hull_simplify": f"""
            SELECT image_id, n_hull, n_simplified, simp_wsum
            FROM read_parquet('{C}/simplify_expected.parquet')""",
        "dhash_pairs": f"""
            SELECT img_a, img_b, hamming
            FROM read_parquet('{C}/dhash_pairs_expected.parquet')""",
        "letterbox": f"""
            SELECT image_id, n_top, n_bottom, n_left, n_right, boxed
            FROM read_parquet('{C}/letterbox_expected.parquet')""",
        "caption_lcs": f"""
            SELECT img_a, img_b, lcs_len, len_a, len_b
            FROM read_parquet('{C}/caption_lcs_expected.parquet')""",
        "spatial_split": __import__(
            "unmixing_ray.stages.rollup",
            fromlist=["x"]).spatial_block_split_sql(
            f"{C}/tiles_expected.parquet"),
        "caption_consistency": f"""
            SELECT phash,
                   CAST(count(*) AS BIGINT) AS n_imgs,
                   CAST(count(DISTINCT caption) AS BIGINT)
                     AS n_captions,
                   min(image_id) AS keep_image_id,
                   CAST(CASE WHEN count(DISTINCT caption) = 1
                        THEN 1 ELSE 0 END AS BIGINT) AS consistent
            FROM read_parquet('{C}/images/*.parquet')
            GROUP BY phash HAVING count(*) >= 2""",
        "composite_percentile": f"""
            SELECT cell_ix, cell_iy, row_off, col_off, n_dates,
                   q_sum, n_hole
            FROM read_parquet('{C}-skew/percentile_expected.parquet')""",
        "audio_resample": f"""
            SELECT media_id, n_in, n_out, y_sum, y_wsum
            FROM read_parquet('{C}/media_resample_expected.parquet')""",
        "audio_silence": f"""
            SELECT media_id, n_samples, n_silent, n_runs, max_run,
                   run_wsum
            FROM read_parquet('{C}/media_silence_expected.parquet')""",
        "video_motion": f"""
            SELECT media_id, n_pairs, mode_dy, mode_dx, n_agree,
                   pair_wsum
            FROM read_parquet('{C}/media_motion_expected.parquet')""",
        "areal_interp": f"""
            WITH t AS (
              SELECT tile_id,
                     0*gt1 + gt0 AS xmin, 32*gt1 + gt0 AS xmax,
                     32*gt5 + gt3 AS ymin, 0*gt5 + gt3 AS ymax
              FROM read_parquet('{C}/tiles_expected.parquet')),
            ov AS (
              SELECT t.tile_id, p.poly_id,
                     CAST(round((least(t.xmax, p.xmax)
                                 - greatest(t.xmin, p.xmin)) * 2)
                          * round((least(t.ymax, p.ymax)
                                   - greatest(t.ymin, p.ymin)) * 2)
                          AS BIGINT) AS area_x4
              FROM t JOIN read_parquet('{C}/polygons.parquet') p
                ON t.xmin < p.xmax AND p.xmin < t.xmax
               AND t.ymin < p.ymax AND p.ymin < t.ymax)
            SELECT ov.poly_id,
                   CAST(count(*) AS BIGINT) AS n_tiles,
                   CAST(sum(ov.area_x4) AS BIGINT) AS area_x4_sum,
                   CAST(sum(ov.area_x4 * s.b0_sum) AS BIGINT) AS wsum
            FROM ov
            JOIN read_parquet('{C}/tilesums_expected.parquet') s
              ON s.tile_id = ov.tile_id
            GROUP BY ov.poly_id""",
        "region_props": f"""
            SELECT image_id, px, sr, sc, r0, c0, r1, c1
            FROM read_parquet('{C}/regionprops_expected.parquet')""",
        "focal_majority": f"""
            SELECT tile_id, cls, n
            FROM read_parquet('{C}/majority_expected.parquet')""",
        "flow_direction": f"""
            SELECT tile_id, code, n
            FROM read_parquet('{C}/flow_expected.parquet')""",
        "intersect_resample": f"""
            SELECT tile_id, b0_sum, n_valid
            FROM read_parquet('{C}/intersect_expected.parquet')""",
        "distance_transform": f"""
            SELECT tile_id, sum_dist, n_cap, n_px
            FROM read_parquet('{C}/distance_expected.parquet')""",
        "histogram_equalize": f"""
            SELECT tile_id, band, eq_sum, n_valid
            FROM read_parquet('{C}/equalize_expected.parquet')""",
        "histogram_match": f"""
            SELECT tile_id, band, match_sum, n_valid
            FROM read_parquet('{C}/match_expected.parquet')""",
        "augment_images": f"""
            SELECT image_id, flip_h, flip_v, oy, ox, n_px,
                   aug_checksum, caption
            FROM read_parquet('{C}/augment_expected.parquet')""",
        "coregister": register.coregister_sql(
            f"{C}/images/*.parquet", max_shift=3),
        "temporal_trend": f"""
            SELECT cell_ix, cell_iy, row_off, col_off, n_dates,
                   trend_num, trend_den
            FROM read_parquet('{C}-skew/trend_expected.parquet')""",
        "epoch_change": f"""
            SELECT cell_ix, cell_iy, row_off, col_off, n_early, n_late,
                   delta_num, delta_den
            FROM read_parquet('{C}-skew/change_expected.parquet')""",
        "composite_cube": f"""
            SELECT cell_ix, cell_iy, row_off, col_off, bin, n_obs,
                   sum_b0, fill_bin, fill_n, fill_sum
            FROM read_parquet('{C}-skew/cube_expected.parquet')""",
        "composite_latest": f"""
            SELECT cell_ix, cell_iy, row_off, col_off, latest_sum,
                   latest_t_sum, n_hole
            FROM read_parquet('{C}-skew/latest_expected.parquet')""",
        "polygon_metrics": f"""
            WITH p AS (
              SELECT poly_id, ring, len(cells) AS n_cells,
                     len(ring) - 1 AS n_vertices
              FROM read_parquet('{C}/polygons.parquet')),
            seg AS (
              SELECT poly_id,
                     CAST(round(ring[i][1] * 2) AS BIGINT) AS x0,
                     CAST(round(ring[i][2] * 2) AS BIGINT) AS y0,
                     CAST(round(ring[i + 1][1] * 2) AS BIGINT) AS x1,
                     CAST(round(ring[i + 1][2] * 2) AS BIGINT) AS y1
              FROM (SELECT poly_id, ring,
                           unnest(generate_series(1, len(ring) - 1))
                             AS i
                    FROM p)),
            m AS (
              SELECT poly_id,
                     abs(sum(x0 * y1 - x1 * y0)) AS area_x8,
                     sum(abs(x1 - x0) + abs(y1 - y0)) AS perim_x2
              FROM seg GROUP BY poly_id)
            SELECT p.poly_id,
                   CAST(m.area_x8 AS BIGINT) AS area_x8,
                   CAST(m.perim_x2 AS BIGINT) AS perim_x2,
                   CAST(p.n_vertices AS BIGINT) AS n_vertices,
                   CAST(p.n_cells AS BIGINT) AS n_cells
            FROM p JOIN m USING (poly_id)""",
        "polygon_centroids": f"""
            WITH p AS (
              SELECT poly_id, ring
              FROM read_parquet('{C}/polygons.parquet')),
            seg AS (
              SELECT poly_id,
                     CAST(round(ring[i][1] * 2) AS BIGINT) AS x0,
                     CAST(round(ring[i][2] * 2) AS BIGINT) AS y0,
                     CAST(round(ring[i + 1][1] * 2) AS BIGINT) AS x1,
                     CAST(round(ring[i + 1][2] * 2) AS BIGINT) AS y1
              FROM (SELECT poly_id, ring,
                           unnest(generate_series(1, len(ring) - 1))
                             AS i
                    FROM p))
            SELECT poly_id,
                   CAST(sum(x0 * y1 - x1 * y0) AS BIGINT) AS area2_s,
                   CAST(sum((x0 + x1) * (x0 * y1 - x1 * y0))
                     AS BIGINT) AS cx_num,
                   CAST(sum((y0 + y1) * (x0 * y1 - x1 * y0))
                     AS BIGINT) AS cy_num
            FROM seg GROUP BY poly_id""",
        "chunk_docs": text.chunk_docs_sql(window=32, stride=24),
        "dsir_weights": text.dsir_weights_sql(),
        "bigram_lm": text.bigram_lm_score_sql(vocab_size=1024),
        "events_range_window": events.range_window_sum_sql(window_s=300),
        "table_checksum": relational.table_checksum_sql(
            "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                       "o_orderpriority"]),
        "trending_types": events.trending_types_sql(window_s=3600, k=3),
        "session_overlap": events.session_overlap_sql(
            type_a="view", type_b="click", gap_s=86400),
        "decay_score": events.decay_score_sql(max_age_days=20),
        "scd2_intervals": events.scd2_intervals_sql(),
        "seasonality": events.seasonality_score_sql(),
        "json_props": events.json_prop_stats_sql(),
        "attribution": events.attribution_sql(),
        "interarrival": events.interarrival_hist_sql(),
        "profile_orders": """
            SELECT * FROM (
              SELECT 'o_orderkey' AS "column",
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1
                              ELSE 0 END) AS BIGINT) AS n_null,
                     CAST(count(DISTINCT o_orderkey) AS BIGINT)
                       AS n_distinct,
                     min(CAST(o_orderkey AS VARCHAR)) AS min_v,
                     max(CAST(o_orderkey AS VARCHAR)) AS max_v
              FROM orders
              UNION ALL
              SELECT 'o_custkey', count(*),
                     sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0
                         END),
                     count(DISTINCT o_custkey),
                     min(CAST(o_custkey AS VARCHAR)),
                     max(CAST(o_custkey AS VARCHAR)) FROM orders
              UNION ALL
              SELECT 'o_orderstatus', count(*),
                     sum(CASE WHEN o_orderstatus IS NULL THEN 1
                         ELSE 0 END),
                     count(DISTINCT o_orderstatus),
                     min(o_orderstatus), max(o_orderstatus)
              FROM orders
              UNION ALL
              SELECT 'o_orderpriority', count(*),
                     sum(CASE WHEN o_orderpriority IS NULL THEN 1
                         ELSE 0 END),
                     count(DISTINCT o_orderpriority),
                     min(o_orderpriority), max(o_orderpriority)
              FROM orders)""",
        "rank_sum_drift": """
            WITH f AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                       AS cents,
                     CASE WHEN o_orderdate < DATE '1996-01-01'
                          THEN 1995 ELSE 1996 END AS year
              FROM orders
              WHERE o_orderdate >= DATE '1995-01-01'
                AND o_orderdate < DATE '1997-01-01'),
            r AS (
              SELECT year,
                     row_number() OVER (ORDER BY cents, o_orderkey)
                       AS rnk
              FROM f)
            SELECT CAST(year AS BIGINT) AS year,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(rnk) AS BIGINT) AS rank_sum
            FROM r GROUP BY 1""",
        "key_skew": """
            WITH c AS (
              SELECT l_orderkey AS k, count(*) AS c
              FROM lineitem GROUP BY 1),
            s AS (
              SELECT 'total' AS stat, '' AS k,
                     CAST(sum(c) AS BIGINT) AS v FROM c
              UNION ALL
              SELECT 'keys', '', CAST(count(*) AS BIGINT) FROM c
              UNION ALL
              SELECT 'sum_c2', '', CAST(sum(c * c) AS BIGINT) FROM c
              UNION ALL
              SELECT 'max_c', '', CAST(max(c) AS BIGINT) FROM c
              UNION ALL
              (SELECT 'hot', CAST(k AS VARCHAR), CAST(c AS BIGINT)
               FROM c ORDER BY c DESC, CAST(k AS VARCHAR) LIMIT 5))
            SELECT stat, k, v FROM s""",
        "embedding_clip": """
            WITH c AS (
              SELECT CAST(unnest(range(len(embedding))) AS BIGINT)
                       AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                * 1000000) AS BIGINT) AS v
              FROM embeddings),
            b AS (
              SELECT dim, quantile_disc(v, 0.05) AS lo,
                     quantile_disc(v, 0.95) AS hi
              FROM c GROUP BY 1)
            SELECT c.dim, CAST(count(*) AS BIGINT) AS n,
                   CAST(any_value(b.lo) AS BIGINT) AS lo,
                   CAST(any_value(b.hi) AS BIGINT) AS hi,
                   CAST(sum(LEAST(GREATEST(c.v, b.lo), b.hi))
                        AS BIGINT) AS wins_sum
            FROM c JOIN b USING (dim) GROUP BY 1""",
        "orders_winsorized": """
            WITH c AS (
              SELECT o_orderpriority,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS v
              FROM orders),
            b AS (
              SELECT o_orderpriority,
                     quantile_disc(v, 0.1) AS lo,
                     quantile_disc(v, 0.9) AS hi
              FROM c GROUP BY 1)
            SELECT c.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(any_value(b.lo) AS BIGINT) AS lo,
                   CAST(any_value(b.hi) AS BIGINT) AS hi,
                   CAST(sum(LEAST(GREATEST(c.v, b.lo), b.hi))
                        AS BIGINT) AS wins_sum
            FROM c JOIN b USING (o_orderpriority)
            GROUP BY 1""",
        "pq_codes": ann.pq_assign_sql(),
        "daily_locf": events.daily_locf_sql(scale=100),
        "events_window_join": events.window_join_sql(
            left_type="purchase", right_type="click", window_s=86400),
        "image_dup_clusters": relational.graph_components_sql(f"""e AS (
            WITH base AS (
              SELECT image_id, phash
              FROM read_parquet('{C}/images/*.parquet')
            ), planted AS (
              SELECT image_id || '_nd' AS image_id,
                     xor(phash, {PHASH_PLANT_MASK}) AS phash
              FROM base
              WHERE CAST(substr(image_id, 4) AS BIGINT)
                    % {PHASH_PLANT_MOD} = 0
            ), allrows AS (
              SELECT CAST(substr(image_id, 4, 8) AS BIGINT)
                     + CASE WHEN ends_with(image_id, '_nd')
                            THEN 1000000 ELSE 0 END AS nid,
                     phash
              FROM (SELECT * FROM base UNION ALL
                    SELECT * FROM planted)
            )
            SELECT least(a.nid, b.nid) AS a, greatest(a.nid, b.nid) AS b
            FROM allrows a JOIN allrows b ON a.nid < b.nid
            WHERE bit_count(xor(a.phash, b.phash)) <= 4)""", rounds=4),
        "user_trend": """
            WITH d AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(day) AS BIGINT) AS sum_x,
                   CAST(sum(n) AS BIGINT) AS sum_y,
                   CAST(sum(day * day) AS BIGINT) AS sum_xx,
                   CAST(sum(n * n) AS BIGINT) AS sum_yy,
                   CAST(sum(day * n) AS BIGINT) AS sum_xy
            FROM d GROUP BY user_id""",
        "polygon_clusters": relational.graph_components_sql(f"""e AS (
            SELECT CAST(substr(a.poly_id, 5) AS BIGINT) AS a,
                   CAST(substr(b.poly_id, 5) AS BIGINT) AS b
            FROM read_parquet('{C}/polygons.parquet') a
            JOIN read_parquet('{C}/polygons.parquet') b
              ON a.poly_id < b.poly_id
             AND a.xmin < b.xmax AND b.xmin < a.xmax
             AND a.ymin < b.ymax AND b.ymin < a.ymax)""", rounds=6),
        "zonemap_prune": _zonemap_sql_lazy(),
        "zorder_prune": _zorder_sql_lazy(),
        "events_interpolate": events.asof_interpolate_sql(
            probe_type="purchase", sample_type="click"),
        "kcore": relational.kcore_sql(
            """e AS (
              SELECT least(x.l_partkey, y.l_partkey) AS a,
                     greatest(x.l_partkey, y.l_partkey) AS b
              FROM (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) x
              JOIN (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem) y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2)""",
            k=4, rounds=3),
        "graph_components": relational.graph_components_sql(
            _COPURCHASE_E2_CTE, rounds=4),
        "clustering_coeff": relational.clustering_coeff_sql(
            _COPURCHASE_E2_CTE),
        "link_predict": relational.common_neighbors_sql(
            _COPURCHASE_E2_CTE, k=20, deg_cap=64, min_common=2),
        "events_mad": relational.grouped_mad_sql(
            "events", "user_id", "value", scale=100),
        "fk_audit": """
            SELECT 'lineitem->orders' AS relation,
                   CAST((SELECT count(*) FROM lineitem) AS BIGINT)
                     AS n_rows,
                   CAST((SELECT count(*) FROM lineitem
                         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_orderkey = l_orderkey)) AS BIGINT)
                     AS n_orphans
            UNION ALL
            SELECT 'lineitem->part',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem
                    WHERE NOT EXISTS (SELECT 1 FROM part
                      WHERE p_partkey = l_partkey))
            UNION ALL
            SELECT 'orders->customer_stale',
                   (SELECT count(*) FROM orders),
                   (SELECT count(*) FROM orders
                    WHERE NOT EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey % 7 != 0
                        AND c_custkey = o_custkey))""",
        "polygon_cover": f"""
            SELECT poly_id,
                   CAST(tx.ix AS BIGINT) AS cell_ix,
                   CAST(ty.iy AS BIGINT) AS cell_iy
            FROM read_parquet('{C}/polygons.parquet'),
                 unnest(generate_series(
                     greatest(0, CAST(floor(xmin / 1024.0) AS BIGINT)),
                     least(4095, CAST(floor(xmax / 1024.0) AS BIGINT))))
                   AS tx(ix),
                 unnest(generate_series(
                     greatest(0, CAST(floor(ymin / 1024.0) AS BIGINT)),
                     least(4095, CAST(floor(ymax / 1024.0) AS BIGINT))))
                   AS ty(iy)""",
        "box_join": f"""
            SELECT a.poly_id AS poly_a, b.poly_id AS poly_b,
                   CAST(round((least(a.xmax, b.xmax)
                               - greatest(a.xmin, b.xmin)) * 2)
                        AS BIGINT) AS w_x2,
                   CAST(round((least(a.ymax, b.ymax)
                               - greatest(a.ymin, b.ymin)) * 2)
                        AS BIGINT) AS h_x2,
                   CAST(round((least(a.xmax, b.xmax)
                               - greatest(a.xmin, b.xmin)) * 2)
                        * round((least(a.ymax, b.ymax)
                                 - greatest(a.ymin, b.ymin)) * 2)
                        AS BIGINT) AS area_x4
            FROM read_parquet('{C}/polygons.parquet') a
            JOIN read_parquet('{C}/polygons.parquet') b
              ON a.poly_id < b.poly_id
             AND a.xmin < b.xmax AND b.xmin < a.xmax
             AND a.ymin < b.ymax AND b.ymin < a.ymax""",
        "polygon_union_area": f"""
            WITH p AS (
              SELECT CAST(round(xmin * 2) AS BIGINT) AS x0,
                     CAST(round(ymin * 2) AS BIGINT) AS y0,
                     CAST(round(xmax * 2) AS BIGINT) AS x1,
                     CAST(round(ymax * 2) AS BIGINT) AS y1
              FROM read_parquet('{C}/polygons.parquet')),
            ys AS (SELECT DISTINCT y FROM
                   (SELECT y0 AS y FROM p
                    UNION SELECT y1 AS y FROM p)),
            slab AS (SELECT y AS s0,
                            lead(y) OVER (ORDER BY y) AS s1
                     FROM ys),
            act AS (SELECT s.s0, s.s1, p.x0, p.x1
                    FROM slab s JOIN p
                      ON p.y0 <= s.s0 AND p.y1 >= s.s1
                    WHERE s.s1 IS NOT NULL),
            seg AS (SELECT s0, s1, x0, x1,
                           max(x1) OVER (PARTITION BY s0, s1
                                         ORDER BY x0, x1
                                         ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND 1 PRECEDING)
                             AS rm
                    FROM act)
            SELECT CAST(sum((s1 - s0)
                            * greatest(0, x1 - greatest(
                                x0, coalesce(rm, x0)))) AS BIGINT)
                     AS union_area_x4
            FROM seg""",
        "polygon_dissolve_area": f"""
            WITH p AS (
              SELECT CAST(SUBSTR(poly_id, 5) AS BIGINT) % 4 AS grp,
                     CAST(round(xmin * 2) AS BIGINT) AS x0,
                     CAST(round(ymin * 2) AS BIGINT) AS y0,
                     CAST(round(xmax * 2) AS BIGINT) AS x1,
                     CAST(round(ymax * 2) AS BIGINT) AS y1
              FROM read_parquet('{C}/polygons.parquet')),
            ys AS (SELECT DISTINCT grp, y FROM
                   (SELECT grp, y0 AS y FROM p
                    UNION SELECT grp, y1 AS y FROM p)),
            slab AS (SELECT grp, y AS s0,
                            lead(y) OVER (PARTITION BY grp
                                          ORDER BY y) AS s1
                     FROM ys),
            act AS (SELECT s.grp, s.s0, s.s1, p.x0, p.x1
                    FROM slab s JOIN p
                      ON p.grp = s.grp
                     AND p.y0 <= s.s0 AND p.y1 >= s.s1
                    WHERE s.s1 IS NOT NULL),
            seg AS (SELECT grp, s0, s1, x0, x1,
                           max(x1) OVER (PARTITION BY grp, s0, s1
                                         ORDER BY x0, x1
                                         ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND 1 PRECEDING)
                             AS rm
                    FROM act)
            SELECT grp,
                   CAST(sum((s1 - s0)
                            * greatest(0, x1 - greatest(
                                x0, coalesce(rm, x0)))) AS BIGINT)
                     AS union_area_x4
            FROM seg GROUP BY grp ORDER BY grp""",
        "tile_poly_overlap": f"""
            WITH t AS (
              SELECT tile_id,
                     0*gt1 + gt0 AS xmin, 32*gt1 + gt0 AS xmax,
                     32*gt5 + gt3 AS ymin, 0*gt5 + gt3 AS ymax
              FROM read_parquet('{C}/tiles_expected.parquet'))
            SELECT t.tile_id, p.poly_id,
                   CAST(round((least(t.xmax, p.xmax)
                               - greatest(t.xmin, p.xmin)) * 2)
                        AS BIGINT) AS w_x2,
                   CAST(round((least(t.ymax, p.ymax)
                               - greatest(t.ymin, p.ymin)) * 2)
                        AS BIGINT) AS h_x2,
                   CAST(round((least(t.xmax, p.xmax)
                               - greatest(t.xmin, p.xmin)) * 2)
                        * round((least(t.ymax, p.ymax)
                                 - greatest(t.ymin, p.ymin)) * 2)
                        AS BIGINT) AS area_x4
            FROM t JOIN read_parquet('{C}/polygons.parquet') p
              ON t.xmin < p.xmax AND p.xmin < t.xmax
             AND t.ymin < p.ymax AND p.ymin < t.ymax""",
        "cell_density": f"""
            WITH c AS (
              SELECT cell_ix, cell_iy, count(*) AS n
              FROM read_parquet('{C}/tiles_expected.parquet')
              GROUP BY cell_ix, cell_iy),
            o AS (SELECT dx.dx, dy.dy
                  FROM (VALUES (-1), (0), (1)) dx(dx),
                       (VALUES (-1), (0), (1)) dy(dy))
            SELECT c.cell_ix + dx AS cell_ix,
                   c.cell_iy + dy AS cell_iy,
                   CAST(sum(n) AS BIGINT) AS n_tiles
            FROM c, o
            WHERE c.cell_ix + dx BETWEEN 0 AND 4095
              AND c.cell_iy + dy BETWEEN 0 AND 4095
            GROUP BY 1, 2""",
        "warp_bilinear": f"""
            SELECT tile_id, band, warp_sum
            FROM read_parquet('{C}/warp_expected.parquet')""",
        "hillshade": f"""
            SELECT tile_id, sum_hs_u, n_valid
            FROM read_parquet('{C}/hillshade_expected.parquet')""",
        "retile": f"""
            SELECT split_part(tile_id, '_t', 1) AS image_id,
                   CAST(split_part(split_part(tile_id, '_t', 2),
                                   '_', 1) AS BIGINT) // 2 AS parent_ty,
                   CAST(split_part(split_part(tile_id, '_t', 2),
                                   '_', 2) AS BIGINT) // 2 AS parent_tx,
                   CAST(sum(b0_sum) AS BIGINT) AS b0_sum,
                   CAST(sum(b0_n) AS BIGINT) AS b0_n
            FROM read_parquet('{C}/tiles_spectral_expected.parquet')
            GROUP BY 1, 2, 3""",
        "raster_components": f"""
            SELECT image_id, n_components, n_masked, max_size
            FROM read_parquet('{C}/components_expected.parquet')""",
        "spatial_join_pip": f"""
            SELECT t.tile_id, p.poly_id
            FROM read_parquet('{C}/tiles_expected.parquet') t
            JOIN read_parquet('{C}/polygons.parquet') p
              ON t.cx BETWEEN p.xmin AND p.xmax
             AND t.cy BETWEEN p.ymin AND p.ymax""",
        "rasterize_count": f"""
            SELECT t.tile_id, p.poly_id,
                   CAST((SELECT count(*)
                         FROM generate_series(0, {_synth.TILE - 1}) g(c)
                         WHERE t.gt0 + (c + 0.5) * t.gt1
                               BETWEEN p.xmin AND p.xmax)
                      * (SELECT count(*)
                         FROM generate_series(0, {_synth.TILE - 1}) g(r)
                         WHERE t.gt3 + (r + 0.5) * t.gt5
                               BETWEEN p.ymin AND p.ymax)
                        AS BIGINT) AS n_px
            FROM read_parquet('{C}/tiles_expected.parquet') t
            JOIN read_parquet('{C}/polygons.parquet') p
              ON t.cx BETWEEN p.xmin AND p.xmax
             AND t.cy BETWEEN p.ymin AND p.ymax""",
        "zonal_majority": f"""
            WITH pc AS (
              SELECT p.poly_id, c.cls, CAST(sum(c.n) AS BIGINT) AS n
              FROM read_parquet('{C}/tiles_expected.parquet') t
              JOIN read_parquet('{C}/tileclass_expected.parquet') c
                USING (tile_id)
              JOIN read_parquet('{C}/polygons.parquet') p
                ON t.cx BETWEEN p.xmin AND p.xmax
               AND t.cy BETWEEN p.ymin AND p.ymax
              GROUP BY p.poly_id, c.cls),
            r AS (
              SELECT poly_id, cls, n,
                     sum(n) OVER (PARTITION BY poly_id) AS n_px,
                     row_number() OVER (PARTITION BY poly_id
                                        ORDER BY n DESC, cls) AS rn
              FROM pc)
            SELECT poly_id, CAST(cls AS BIGINT) AS maj_cls,
                   CAST(n AS BIGINT) AS maj_n,
                   CAST(n_px AS BIGINT) AS n_px
            FROM r WHERE rn = 1""",
        "lineitem_cube": relational.cube_sums_sql(
            "lineitem", ["l_returnflag", "l_linestatus"],
            "l_extendedprice"),
        "zonal_stats": f"""
            SELECT p.poly_id,
                   CAST(count(*) AS BIGINT) AS n_tiles,
                   CAST(sum(s.b0_sum) AS BIGINT) AS b_sum,
                   CAST(sum(s.b0_n) AS BIGINT) AS b_n
            FROM read_parquet('{C}/tiles_expected.parquet') t
            JOIN read_parquet('{C}/tiles_spectral_expected.parquet') s
              USING (tile_id)
            JOIN read_parquet('{C}/polygons.parquet') p
              ON t.cx BETWEEN p.xmin AND p.xmax
             AND t.cy BETWEEN p.ymin AND p.ymax
            GROUP BY p.poly_id""",
        "spatial_join_knn": f"""
            WITH d AS (
              SELECT t.tile_id, p.poly_id,
                     sqrt((t.cx-p.cx)*(t.cx-p.cx)
                          +(t.cy-p.cy)*(t.cy-p.cy)) AS dist,
                     row_number() OVER (
                       PARTITION BY t.tile_id
                       ORDER BY sqrt((t.cx-p.cx)*(t.cx-p.cx)
                                     +(t.cy-p.cy)*(t.cy-p.cy)),
                                p.poly_id) AS rn
              FROM read_parquet('{C}/tiles_expected.parquet') t
              CROSS JOIN read_parquet('{C}/polygons.parquet') p)
            SELECT tile_id, CAST(rn-1 AS BIGINT) AS knn_rank, poly_id,
                   CAST(floor(dist*1000000) AS BIGINT) AS dist_u6
            FROM d WHERE rn <= 2""",
        "mask_counts": f"""
            SELECT image_id, CAST(n_water AS BIGINT) AS n_water,
                   CAST(n_saturated AS BIGINT) AS n_saturated,
                   CAST(n_nodata AS BIGINT) AS n_nodata,
                   CAST(n_qa_masked AS BIGINT) AS n_qa_masked
            FROM read_parquet('{C}/images_expected.parquet')""",
        "band_stats": f"""
            SELECT image_id, {", ".join(
                "CAST(b%d_%s AS BIGINT) AS b%d_%s" % (b, s, b, s)
                for b in range(6)
                for s in ("min", "max", "sum", "count"))}
            FROM read_parquet('{C}/images_expected.parquet')""",
        "spectral_indices": f"""
            SELECT image_id, CAST(n_ndvi_pos AS BIGINT) AS n_ndvi_pos,
                   CAST(tc1_sum_floor AS BIGINT) AS tc1_sum_floor
            FROM read_parquet('{C}/images_expected.parquet')""",
        "decode_invariants": f"""
            SELECT image_id, fmt, CAST(TRUE AS BOOLEAN) AS psnr_ok,
                   caption
            FROM read_parquet('{C}/images/*.parquet')""",
        "unmix_abundance": f"""
            SELECT tile_id, caption, CAST(q AS BIGINT) AS q,
                   CAST(mean_ab0_u4 AS BIGINT) AS mean_ab0_u4,
                   CAST(mean_ab1_u4 AS BIGINT) AS mean_ab1_u4,
                   CAST(mean_ab2_u4 AS BIGINT) AS mean_ab2_u4
            FROM read_parquet('{C}/tiles_spectral_expected.parquet')""",
        "composite_cells": f"""
            SELECT tile_id,
                   CAST(comp_checksum_x6 AS BIGINT) AS comp_checksum_x6
            FROM read_parquet('{C}/tiles_spectral_expected.parquet')""",
        "hall_rectification": f"""
            SELECT image_id, CAST(b0_sum_rect AS BIGINT) AS b0_sum_rect
            FROM read_parquet('{C}/images_expected.parquet')""",
        "spectra_at_points": f"""
            SELECT CAST(point_id AS BIGINT) AS point_id, tile_id,
                   CAST(b0 AS BIGINT) AS b0, CAST(b5 AS BIGINT) AS b5
            FROM read_parquet('{C}/points_expected.parquet')""",
        "salted_cell_counts": f"""
            SELECT CAST(cell_ix AS BIGINT) AS cell_ix,
                   CAST(cell_iy AS BIGINT) AS cell_iy,
                   CAST(count(*) AS BIGINT) AS n_tiles
            FROM read_parquet('{C}-skew/skew_tiles_expected.parquet')
            GROUP BY cell_ix, cell_iy""",
        "image_dedup_phash": f"""
            SELECT phash, min(image_id) AS keep_image_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM read_parquet('{C}/images/*.parquet') GROUP BY phash""",
        "phash_near_dup": f"""
            WITH base AS (
              SELECT image_id, phash
              FROM read_parquet('{C}/images/*.parquet')
            ), planted AS (
              SELECT image_id || '_nd' AS image_id,
                     xor(phash, {PHASH_PLANT_MASK}) AS phash
              FROM base
              WHERE CAST(substr(image_id, 4) AS BIGINT)
                    % {PHASH_PLANT_MOD} = 0
            ), allrows AS (
              SELECT * FROM base UNION ALL SELECT * FROM planted
            )
            SELECT a.image_id AS img_a, b.image_id AS img_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                     AS hamming
            FROM allrows a JOIN allrows b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 4""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                     AS BIGINT) AS sum_base_price_c,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT)))
                     AS BIGINT) AS sum_disc_price_c2,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * (100 + CAST(round(l_tax*100) AS BIGINT)))
                     AS BIGINT) AS sum_charge_c4,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "revenue_by_nation": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                     AS BIGINT) AS revenue_c2,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "events_window": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY event_type, hour_bucket""",
        "orders_topk": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice*100) AS BIGINT) AS total_c
            FROM orders
            ORDER BY total_c DESC, o_orderkey LIMIT 10""",
        "events_sessions": _events_sessions_sql(),
        "events_asof": _events_asof_sql(),
        "events_asof_forward": _events_asof_forward_sql(),
        "events_sliding": _events_sliding_sql(),
        "events_lag": _events_lag_sql(),
        "events_session_join": _events_session_join_sql(),
        "lineitem_rollup": _lineitem_rollup_sql(),
        "cell_rollup": _cell_rollup_sql(),
        "customer_orders": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT))
                     AS BIGINT) AS total_c,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "part_filter_topk": """
            SELECT p_partkey,
                   CAST(round(p_retailprice*100) AS BIGINT) AS price_c
            FROM part WHERE p_size > 25
            ORDER BY price_c DESC, p_partkey LIMIT 15""",
        "top_orders_per_segment": """
            WITH j AS (
              SELECT c.c_mktsegment, o.o_orderkey,
                     CAST(round(o.o_totalprice*100) AS BIGINT) AS total_c
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY total_c DESC, o_orderkey) AS rank
              FROM j)
            SELECT c_mktsegment, o_orderkey, total_c,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3""",
        "supplier_distinct_parts": """
            SELECT l_suppkey,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem GROUP BY l_suppkey""",
        "customers_without_orders": """
            SELECT c_custkey, c_name,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000)""",
        "events_quantiles": """
            SELECT event_type,
                   CAST(floor(quantile_disc(value, 0.5)*1e6) AS BIGINT)
                     AS p50_u6,
                   CAST(floor(quantile_disc(value, 0.9)*1e6) AS BIGINT)
                     AS p90_u6,
                   CAST(floor(quantile_disc(value, 0.99)*1e6) AS BIGINT)
                     AS p99_u6
            FROM events GROUP BY event_type""",
        "events_quantiles_by_user": """
            SELECT user_id,
                   CAST(floor(quantile_disc(value, 0.5)*1e6) AS BIGINT)
                     AS p50_u6,
                   CAST(floor(quantile_disc(value, 0.9)*1e6) AS BIGINT)
                     AS p90_u6
            FROM events GROUP BY user_id""",
        "events_quantiles_cont": """
            WITH s AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value) - 1 AS r,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events),
            q(qn, qd) AS (VALUES (1, 2), (9, 10))
            SELECT s.event_type,
                   CAST(q.qn AS BIGINT) AS qn,
                   CAST(q.qd AS BIGINT) AS qd,
                   CAST(s.n AS BIGINT) AS n,
                   CAST(max(CASE WHEN s.r = ((s.n - 1) * q.qn) // q.qd
                            THEN floor(s.value * 1e6) END)
                        AS BIGINT) AS lo_u6,
                   CAST(max(CASE WHEN s.r =
                              ((s.n - 1) * q.qn + q.qd - 1) // q.qd
                            THEN floor(s.value * 1e6) END)
                        AS BIGINT) AS hi_u6,
                   CAST(((s.n - 1) * q.qn) % q.qd AS BIGINT)
                     AS frac_num,
                   CAST(q.qd AS BIGINT) AS frac_den
            FROM s, q
            GROUP BY s.event_type, q.qn, q.qd, s.n""",
        "events_pivot": relational.pivot_count_sql(
            "events", "user_id", "event_type", EVENT_TYPES),
        "customer_orders_outer": """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
                   COALESCE(c.c_name, '') AS c_name,
                   COALESCE(o.o_orderkey, -1) AS o_orderkey
            FROM (SELECT c_custkey, c_name FROM customer
                  WHERE c_acctbal > 0) c
            FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                             WHERE o_totalprice > 400000.0) o
              ON c.c_custkey = o.o_custkey""",
        "orders_join_lineitem": """
            SELECT o.o_orderpriority,
                   CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS sum_qty_c,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority""",
        "tpch_q3": """
            SELECT l.l_orderkey AS okey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_c2
            FROM customer c, orders o, lineitem l
            WHERE c.c_mktsegment = 'BUILDING'
              AND c.c_custkey = o.o_custkey
              AND l.l_orderkey = o.o_orderkey
              AND o.o_orderdate < TIMESTAMP '1995-03-15'
              AND l.l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY l.l_orderkey
            ORDER BY revenue_c2 DESC, okey
            LIMIT 10""",
        "tpch_q5": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_c2
            FROM customer c, orders o, lineitem l, supplier s,
                 nation n, region r
            WHERE c.c_custkey = o.o_custkey
              AND l.l_orderkey = o.o_orderkey
              AND l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
              AND s.s_nationkey = n.n_nationkey
              AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name""",
        "tpch_q10": """
            WITH rev AS (
              SELECT o.o_custkey AS ckey,
                     CAST(sum(CAST(round(l.l_extendedprice * 100)
                                   AS BIGINT)
                              * (100 - CAST(round(l.l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue_c2
              FROM orders o, lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1995-10-01'
                AND o.o_orderdate < TIMESTAMP '1996-01-01'
              GROUP BY o.o_custkey
              ORDER BY revenue_c2 DESC, ckey
              LIMIT 20)
            SELECT rev.ckey, c.c_name, n.n_name,
                   CAST(round(c.c_acctbal * 100) AS BIGINT)
                     AS acctbal_c,
                   rev.revenue_c2
            FROM rev
            JOIN customer c ON c.c_custkey = rev.ckey
            JOIN nation n ON n.n_nationkey = c.c_nationkey""",
        "tpch_q4": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority""",
        "tpch_q12": """
            SELECT l.l_linestatus,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l.l_linestatus""",
        "tpch_q14": """
            SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(round(l.l_extendedprice
                                                 * 100) AS BIGINT)
                                   * (100 - CAST(round(l.l_discount
                                                       * 100)
                                                 AS BIGINT))
                                 ELSE 0 END) AS BIGINT)
                     AS promo_rev_c2,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS total_rev_c2
            FROM lineitem l JOIN part p
              ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate < TIMESTAMP '1996-04-01'""",
        "tpch_q19": """
            WITH j AS (
              SELECT CAST(round(l.l_quantity) AS BIGINT) AS qty,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100)
                                     AS BIGINT)) AS rev_c2,
                     p.p_brand, p.p_size
              FROM lineitem l JOIN part p
                ON l.l_partkey = p.p_partkey),
            hits AS (
              SELECT * FROM j
              WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                     AND qty BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                     AND qty BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                     AND qty BETWEEN 20 AND 30))
            SELECT CAST(coalesce(sum(rev_c2), 0) AS BIGINT)
                     AS rev_c2,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM hits""",
        "tpch_q17": """
            WITH pk AS (
              SELECT p_partkey FROM part
              WHERE p_brand = 'Brand#23' AND p_size < 15),
            li AS (
              SELECT l_partkey,
                     CAST(round(l_quantity) AS BIGINT) AS qty,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS ep_c
              FROM lineitem JOIN pk ON l_partkey = p_partkey),
            th AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(qty) AS BIGINT) AS s
              FROM li GROUP BY l_partkey)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM pk)
                     AS n_parts,
                   CAST(count(*) AS BIGINT) AS n_small_lines,
                   CAST(COALESCE(sum(li.ep_c), 0) AS BIGINT)
                     AS total_c
            FROM li JOIN th ON li.l_partkey = th.l_partkey
            WHERE 5 * li.qty * th.n < th.s""",
        "tpch_q7": """
            SELECT ns.n_name AS supp_nation,
                   nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_c2
            FROM supplier s, lineitem l, orders o, customer c,
                 nation ns, nation nc
            WHERE s.s_suppkey = l.l_suppkey
              AND o.o_orderkey = l.l_orderkey
              AND c.c_custkey = o.o_custkey
              AND s.s_nationkey = ns.n_nationkey
              AND c.c_nationkey = nc.n_nationkey
              AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
              AND l.l_shipdate >= TIMESTAMP '1995-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)""",
        "tpch_q8": """
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                                 THEN CAST(round(l.l_extendedprice
                                                 * 100) AS BIGINT)
                                   * (100 - CAST(round(l.l_discount
                                                       * 100)
                                                 AS BIGINT))
                                 ELSE 0 END) AS BIGINT)
                     AS nation_rev_c2,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS total_rev_c2
            FROM part p, supplier s, lineitem l, orders o,
                 customer c, nation nc, nation ns, region r
            WHERE p.p_partkey = l.l_partkey
              AND s.s_suppkey = l.l_suppkey
              AND l.l_orderkey = o.o_orderkey
              AND o.o_custkey = c.c_custkey
              AND c.c_nationkey = nc.n_nationkey
              AND nc.n_regionkey = r.r_regionkey
              AND r.r_name = 'AMERICA'
              AND s.s_nationkey = ns.n_nationkey
              AND o.o_orderdate >= TIMESTAMP '1995-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND p.p_type = 'PROMO'
            GROUP BY year(o.o_orderdate)""",
        "tpch_q13": """
            WITH c_orders AS (
              SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c LEFT OUTER JOIN orders o
                ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM c_orders GROUP BY c_count""",
        "tpch_q15": """
            WITH rev AS (
              SELECT l_suppkey AS skey,
                     CAST(sum(CAST(round(l_extendedprice * 100)
                                   AS BIGINT)
                              * (100 - CAST(round(l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS total_rev_c2
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT rev.skey, s.s_name, rev.total_rev_c2
            FROM rev JOIN supplier s ON s.s_suppkey = rev.skey
            WHERE rev.total_rev_c2 = (SELECT max(total_rev_c2)
                                      FROM rev)
            ORDER BY rev.skey""",
        "tpch_q22": """
            WITH cand AS (
              SELECT c_custkey AS ckey,
                     CAST(c_nationkey AS BIGINT) AS cntrycode,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
              FROM customer
              WHERE c_nationkey IN (1, 2, 3, 4, 5)
                AND CAST(round(c_acctbal * 100) AS BIGINT) > 0),
            g AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s,
                         CAST(count(*) AS BIGINT) AS n FROM cand)
            SELECT cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
            FROM cand, g
            WHERE cand.bal_c * g.n > g.s
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = cand.ckey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY cntrycode""",
        "tpch_q6": """
            SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round(l_discount*100) AS BIGINT))
                     AS BIGINT) AS revenue_c2,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24""",
        "tpch_q21": """
            WITH ol AS (
              SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
                     max(CASE WHEN l.l_shipdate
                              > o.o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS late
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'
              GROUP BY 1, 2),
            po AS (SELECT ok, count(*) AS ns, sum(late) AS nl,
                          max(sk * late) AS lsk
                   FROM ol GROUP BY ok)
            SELECT s.s_name,
                   CAST(count(*) AS BIGINT) AS numwait
            FROM po JOIN supplier s ON s.s_suppkey = po.lsk
            WHERE po.ns >= 2 AND po.nl = 1
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name
            LIMIT 10""",
        "orders_ntile": """
            WITH base AS (
              SELECT o_orderpriority,
                     CAST(o_orderkey AS BIGINT) AS okey,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                       // 100000 AS val_i
              FROM orders)
            SELECT o_orderpriority, okey, val_i,
                   CAST(ntile(7) OVER (PARTITION BY o_orderpriority
                                       ORDER BY val_i DESC, okey)
                        AS BIGINT) AS bucket,
                   percent_rank() OVER (PARTITION BY o_orderpriority
                                        ORDER BY val_i DESC)
                     AS pct_rank,
                   cume_dist() OVER (PARTITION BY o_orderpriority
                                     ORDER BY val_i DESC)
                     AS cume_dist
            FROM base""",
        "lineitem_setops": """
            WITH l AS (
              SELECT l_returnflag AS flag,
                     CAST(round(l_quantity) AS BIGINT) AS qty
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'),
            r AS (
              SELECT l_returnflag AS flag,
                     CAST(round(l_quantity) AS BIGINT) AS qty
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'),
            ex AS (
              SELECT flag, qty, CAST(count(*) AS BIGINT) AS n_except
              FROM (SELECT * FROM l EXCEPT ALL SELECT * FROM r)
              GROUP BY flag, qty),
            ix AS (
              SELECT flag, qty,
                     CAST(count(*) AS BIGINT) AS n_intersect
              FROM (SELECT * FROM l INTERSECT ALL SELECT * FROM r)
              GROUP BY flag, qty),
            lc AS (
              SELECT flag, qty, CAST(count(*) AS BIGINT) AS n_left
              FROM l GROUP BY flag, qty),
            rc AS (
              SELECT flag, qty, CAST(count(*) AS BIGINT) AS n_right
              FROM r GROUP BY flag, qty)
            SELECT lc.flag, lc.qty, lc.n_left,
                   CAST(COALESCE(rc.n_right, 0) AS BIGINT) AS n_right,
                   CAST(COALESCE(ex.n_except, 0) AS BIGINT)
                     AS n_except,
                   CAST(COALESCE(ix.n_intersect, 0) AS BIGINT)
                     AS n_intersect
            FROM lc
            LEFT JOIN rc ON lc.flag = rc.flag AND lc.qty = rc.qty
            LEFT JOIN ex ON lc.flag = ex.flag AND lc.qty = ex.qty
            LEFT JOIN ix ON lc.flag = ix.flag AND lc.qty = ix.qty""",
        "user_streaks": events.user_streaks_sql(),
        "events_twap": events.time_weighted_avg_sql(),
        "sequence_match": events.sequence_match_sql(gap_s=86400),
        "merge_aggregate": """
            SELECT CAST(o_custkey AS BIGINT) AS ckey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS spend_c
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_custkey""",
        "orders_price_band": """
            WITH bands(lo, hi, label) AS (VALUES (0, 5000000, 0), (5000000, 10000000, 1), (10000000, 15000000, 2), (15000000, 20000000, 3), (20000000, 25000000, 4), (25000000, 30000000, 5), (30000000, 35000000, 6), (35000000, 40000000, 7)),
            o AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
                         CAST(round(o_totalprice * 100) AS BIGINT)
                           AS price_c
                  FROM orders)
            SELECT o.price_c, o.okey,
                   CAST(COALESCE(b.label, -1) AS BIGINT) AS band
            FROM o LEFT JOIN bands b
              ON o.price_c >= b.lo AND o.price_c < b.hi""",
        "parts_skyline": """
            SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey,
                   CAST(round(p.p_retailprice * 100) AS BIGINT)
                     AS price_c,
                   CAST(p.p_size AS BIGINT) AS p_size
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_retailprice <= p.p_retailprice
                AND q.p_size >= p.p_size
                AND (q.p_retailprice < p.p_retailprice
                     OR q.p_size > p.p_size))""",
        "mixture_sample": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source
            FROM documents
            WHERE """ + relational.mixture_sample_sql_pred(
            "source", "doc_id", MIXTURE_RATES, default_rate=0.1),
        "pagerank": """
            WITH p AS (SELECT DISTINCT l_orderkey AS o,
                              CAST(l_partkey AS BIGINT) AS i
                       FROM lineitem),
            e AS (SELECT DISTINCT x.i AS a, y.i AS b
                  FROM p x JOIN p y ON x.o = y.o AND x.i < y.i),
            d AS (SELECT a AS s, b AS t FROM e
                  UNION ALL SELECT b, a FROM e),
            deg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg
                    FROM d GROUP BY s),
            it0 AS (SELECT s AS v, CAST(1048576 AS BIGINT) AS r
                    FROM deg),
            it1 AS (
              SELECT d.t AS v,
                     CAST(157286 + (85 * sum(it0.r // dg.dg)) // 100
                          AS BIGINT) AS r
              FROM d
              JOIN it0 ON it0.v = d.s
              JOIN deg dg ON dg.s = d.s
              GROUP BY d.t),
            it2 AS (
              SELECT d.t AS v,
                     CAST(157286 + (85 * sum(it1.r // dg.dg)) // 100
                          AS BIGINT) AS r
              FROM d
              JOIN it1 ON it1.v = d.s
              JOIN deg dg ON dg.s = d.s
              GROUP BY d.t),
            it3 AS (
              SELECT d.t AS v,
                     CAST(157286 + (85 * sum(it2.r // dg.dg)) // 100
                          AS BIGINT) AS r
              FROM d
              JOIN it2 ON it2.v = d.s
              JOIN deg dg ON dg.s = d.s
              GROUP BY d.t),
            fin AS (SELECT v, r FROM it3)
            SELECT v, r FROM fin""",
        "cell_bfs": f"""
            WITH RECURSIVE nn AS (
              SELECT DISTINCT
                     CAST(cell_ix AS BIGINT) * 2097152
                       + CAST(cell_iy AS BIGINT) AS v,
                     CAST(cell_ix AS BIGINT) AS ix,
                     CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{C}/tiles_expected.parquet')),
            e AS (
              SELECT x.v AS s, y.v AS t
              FROM nn x JOIN nn y
                ON (x.ix = y.ix AND abs(x.iy - y.iy) = 1)
                OR (x.iy = y.iy AND abs(x.ix - y.ix) = 1)),
            bfs AS (
              SELECT v, CAST(0 AS BIGINT) AS lvl
              FROM (SELECT min(v) AS v FROM nn)
              UNION
              SELECT e.t AS v, bfs.lvl + 1 AS lvl
              FROM bfs JOIN e ON e.s = bfs.v
              WHERE bfs.lvl < 8)
            SELECT v, CAST(min(lvl) AS BIGINT) AS level
            FROM bfs GROUP BY v""",
        "cell_sssp": f"""
            WITH RECURSIVE nn AS (
              SELECT DISTINCT
                     CAST(cell_ix AS BIGINT) * 2097152
                       + CAST(cell_iy AS BIGINT) AS v,
                     CAST(cell_ix AS BIGINT) AS ix,
                     CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{C}/tiles_expected.parquet')),
            e AS (
              SELECT x.v AS s, y.v AS t,
                     1 + (y.ix + y.iy) % 5 AS w
              FROM nn x JOIN nn y
                ON (x.ix = y.ix AND abs(x.iy - y.iy) = 1)
                OR (x.iy = y.iy AND abs(x.ix - y.ix) = 1)),
            walk AS (
              SELECT v, CAST(0 AS BIGINT) AS d, 0 AS k
              FROM (SELECT min(v) AS v FROM nn)
              UNION
              SELECT e.t AS v, walk.d + e.w AS d, walk.k + 1 AS k
              FROM walk JOIN e ON e.s = walk.v
              WHERE walk.k < 6)
            SELECT v, CAST(min(d) AS BIGINT) AS dist
            FROM walk GROUP BY v""",
        "strahler_order": _strahler_sql(C, rounds=4),
        "viewshed": f"""
            WITH nn AS (
              SELECT DISTINCT CAST(cell_ix AS BIGINT) AS ix,
                              CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{C}/tiles_expected.parquet')),
            el AS (SELECT ix, iy,
                          (ix * 1000003 + iy * 7919) % 104729 AS e
                   FROM nn),
            dirs(dx, dy) AS (VALUES (1, 0), (1, 1), (0, 1), (-1, 1),
                                    (-1, 0), (-1, -1), (0, -1),
                                    (1, -1)),
            dd(d) AS (VALUES (1), (2), (3), (4)),
            ray AS (
              SELECT a.ix, a.iy, a.e AS ev,
                     dirs.dx, dirs.dy, dd.d, b.e AS et
              FROM el a CROSS JOIN dirs CROSS JOIN dd
              JOIN el b ON b.ix = a.ix + dirs.dx * dd.d
                       AND b.iy = a.iy + dirs.dy * dd.d),
            tds(td) AS (VALUES (1), (2), (3)),
            vis AS (
              SELECT r.ix, r.iy FROM ray r
              WHERE NOT EXISTS (
                  SELECT 1 FROM tds g
                  WHERE g.td < r.d AND NOT EXISTS (
                      SELECT 1 FROM el m
                      WHERE m.ix = r.ix + r.dx * g.td
                        AND m.iy = r.iy + r.dy * g.td))
                AND NOT EXISTS (
                  SELECT 1 FROM tds g
                  JOIN el m ON m.ix = r.ix + r.dx * g.td
                           AND m.iy = r.iy + r.dy * g.td
                  WHERE g.td < r.d
                    AND (m.e - r.ev) * r.d >= (r.et - r.ev) * g.td))
            SELECT n.ix, n.iy,
                   CAST(coalesce(c.c, 0) AS BIGINT) AS n_visible
            FROM nn n LEFT JOIN (
              SELECT ix, iy, count(*) AS c FROM vis
              GROUP BY ix, iy) c
              ON c.ix = n.ix AND c.iy = n.iy""",
        "flow_accumulation": f"""
            WITH nn AS (
              SELECT DISTINCT CAST(cell_ix AS BIGINT) AS ix,
                              CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{C}/tiles_expected.parquet')),
            el AS (SELECT ix, iy,
                          (ix * 1000003 + iy * 7919) % 104729 AS e
                   FROM nn),
            cand AS (
              SELECT a.ix AS six, a.iy AS siy,
                     b.ix AS tix, b.iy AS tiy, b.e AS te, d.prec
              FROM el a
              CROSS JOIN (VALUES (0, 1, 0), (1, 0, 1),
                                 (2, -1, 0), (3, 0, -1))
                AS d(prec, dx, dy)
              JOIN el b ON b.ix = a.ix + d.dx AND b.iy = a.iy + d.dy
              WHERE b.e < a.e),
            e AS (SELECT six, siy, tix, tiy FROM (
                    SELECT cand.*,
                           row_number() OVER (PARTITION BY six, siy
                                              ORDER BY te, prec) AS rn
                    FROM cand) WHERE rn = 1),
            f1 AS (SELECT tix AS ix, tiy AS iy,
                          CAST(count(*) AS BIGINT) AS m
                   FROM e GROUP BY 1, 2),
            f2 AS (SELECT e.tix AS ix, e.tiy AS iy,
                          CAST(sum(f.m) AS BIGINT) AS m
                   FROM f1 f JOIN e
                     ON e.six = f.ix AND e.siy = f.iy GROUP BY 1, 2),
            f3 AS (SELECT e.tix AS ix, e.tiy AS iy,
                          CAST(sum(f.m) AS BIGINT) AS m
                   FROM f2 f JOIN e
                     ON e.six = f.ix AND e.siy = f.iy GROUP BY 1, 2),
            f4 AS (SELECT e.tix AS ix, e.tiy AS iy,
                          CAST(sum(f.m) AS BIGINT) AS m
                   FROM f3 f JOIN e
                     ON e.six = f.ix AND e.siy = f.iy GROUP BY 1, 2),
            u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
                  UNION ALL SELECT * FROM f3
                  UNION ALL SELECT * FROM f4)
            SELECT ix, iy, CAST(sum(m) AS BIGINT) AS acc
            FROM u GROUP BY ix, iy""",
        "basin_label": f"""
            WITH nn AS (
              SELECT DISTINCT CAST(cell_ix AS BIGINT) AS ix,
                              CAST(cell_iy AS BIGINT) AS iy
              FROM read_parquet('{C}/tiles_expected.parquet')),
            el AS (SELECT ix, iy,
                          (ix * 1000003 + iy * 7919) % 104729 AS e
                   FROM nn),
            cand AS (
              SELECT a.ix AS six, a.iy AS siy,
                     b.ix AS tix, b.iy AS tiy, b.e AS te, d.prec
              FROM el a
              CROSS JOIN (VALUES (0, 1, 0), (1, 0, 1),
                                 (2, -1, 0), (3, 0, -1))
                AS d(prec, dx, dy)
              JOIN el b ON b.ix = a.ix + d.dx AND b.iy = a.iy + d.dy
              WHERE b.e < a.e),
            e AS (SELECT six, siy, tix, tiy FROM (
                    SELECT cand.*,
                           row_number() OVER (PARTITION BY six, siy
                                              ORDER BY te, prec) AS rn
                    FROM cand) WHERE rn = 1),
            p0 AS (SELECT n.ix AS vix, n.iy AS viy,
                          coalesce(e.tix, n.ix) AS pix,
                          coalesce(e.tiy, n.iy) AS piy
                   FROM nn n LEFT JOIN e
                     ON e.six = n.ix AND e.siy = n.iy),
            p1 AS (SELECT a.vix, a.viy, b.pix, b.piy FROM p0 a
                   JOIN p0 b ON b.vix = a.pix AND b.viy = a.piy),
            p2 AS (SELECT a.vix, a.viy, b.pix, b.piy FROM p1 a
                   JOIN p1 b ON b.vix = a.pix AND b.viy = a.piy),
            p3 AS (SELECT a.vix, a.viy, b.pix, b.piy FROM p2 a
                   JOIN p2 b ON b.vix = a.pix AND b.viy = a.piy),
            p4 AS (SELECT a.vix, a.viy, b.pix, b.piy FROM p3 a
                   JOIN p3 b ON b.vix = a.pix AND b.viy = a.piy)
            SELECT vix AS ix, viy AS iy,
                   pix AS basin_ix, piy AS basin_iy FROM p4""",
        "morans_i": f"""
            WITH nn AS (
              SELECT CAST(cell_ix AS BIGINT) AS ix,
                     CAST(cell_iy AS BIGINT) AS iy,
                     CAST(count(*) AS BIGINT) AS val
              FROM read_parquet('{C}/tiles_expected.parquet')
              GROUP BY 1, 2),
            pr AS (
              SELECT a.val AS va, b.val AS vb
              FROM nn a
              CROSS JOIN (VALUES (1, 0), (0, 1), (-1, 0), (0, -1))
                AS d(dx, dy)
              JOIN nn b ON b.ix = a.ix + d.dx AND b.iy = a.iy + d.dy)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM nn) AS n,
                   (SELECT CAST(sum(val) AS BIGINT) FROM nn) AS sum_v,
                   (SELECT CAST(sum(val * val) AS BIGINT) FROM nn)
                     AS sum_v2,
                   CAST(count(*) AS BIGINT) AS w_pairs,
                   CAST(sum(va) AS BIGINT) AS sum_deg_v,
                   CAST(sum(va * vb) AS BIGINT) AS sum_cross
            FROM pr""",
        "orders_snapshot_diff": """
            WITH o AS (
              SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS v
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1996-01-01'
              GROUP BY o_custkey),
            n AS (
              SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS v
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY o_custkey)
            SELECT COALESCE(o.ck, n.ck) AS ckey,
                   CASE WHEN n.ck IS NULL THEN 'removed'
                        WHEN o.ck IS NULL THEN 'added'
                        WHEN o.v = n.v THEN 'same'
                        ELSE 'changed' END AS status,
                   CAST(COALESCE(o.v, 0) AS BIGINT) AS old_v,
                   CAST(COALESCE(n.v, 0) AS BIGINT) AS new_v
            FROM o FULL JOIN n ON o.ck = n.ck""",
        "basket_pairs": """
            WITH p AS (SELECT DISTINCT l_orderkey AS o,
                              CAST(l_partkey AS BIGINT) AS i
                       FROM lineitem),
            e AS (SELECT x.i AS a, y.i AS b,
                         CAST(count(*) AS BIGINT) AS n_ab
                  FROM p x JOIN p y ON x.o = y.o AND x.i < y.i
                  GROUP BY x.i, y.i
                  HAVING count(*) >= 2),
            s AS (SELECT i, CAST(count(DISTINCT o) AS BIGINT) AS n
                  FROM p GROUP BY i)
            SELECT e.a, e.b, e.n_ab, sa.n AS n_a, sb.n AS n_b
            FROM e JOIN s sa ON sa.i = e.a JOIN s sb ON sb.i = e.b""",
        "triangle_count": """
            WITH p AS (SELECT DISTINCT l_orderkey AS o,
                              CAST(l_partkey AS BIGINT) AS i
                       FROM lineitem),
            e AS (SELECT DISTINCT x.i AS a, y.i AS b
                  FROM p x JOIN p y ON x.o = y.o AND x.i < y.i)
            SELECT (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
                      (SELECT a AS v FROM e
                       UNION ALL SELECT b FROM e)) AS n_nodes,
                   (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
                     AS n_triangles""",
        "lineitem_rank": """
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS qty,
                   l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(rank() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_quantity DESC)
                        AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER (PARTITION BY l_returnflag
                                           ORDER BY l_quantity DESC)
                        AS BIGINT) AS drnk
            FROM lineitem""",
        "big_orders": """
            WITH q AS (
              SELECT l_orderkey AS okey,
                     CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                          AS BIGINT) AS qty_c
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity * 100) AS BIGINT))
                     > 25000)
            SELECT q.okey, o.o_custkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                     AS total_c,
                   q.qty_c
            FROM q JOIN orders o ON o.o_orderkey = q.okey""",
        "orders_running_total": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
                        AS BIGINT) AS running_c
            FROM orders""",
        "orders_moving_window": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 4 PRECEDING
                              AND CURRENT ROW)
                        AS BIGINT) AS win_sum_c,
                   CAST(count(*)
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 4 PRECEDING
                              AND CURRENT ROW)
                        AS BIGINT) AS win_n
            FROM orders""",
        "nations_agg": """
            SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   string_agg(n_name, ',' ORDER BY n_name) AS agg_str,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM nation GROUP BY n_regionkey""",
        "lineitem_moments": """
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_x,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            // 100) AS BIGINT) AS sum_y,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)
                            * CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_xx,
                   CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT)
                             // 100)
                            * (CAST(round(l_extendedprice * 100)
                                    AS BIGINT) // 100))
                        AS BIGINT) AS sum_yy,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)
                            * (CAST(round(l_extendedprice * 100)
                                    AS BIGINT) // 100))
                        AS BIGINT) AS sum_xy
            FROM lineitem GROUP BY l_returnflag""",
        "suppliers_with_returns": """
            SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT)
                     AS s_nationkey
            FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey
                            AND l.l_returnflag = 'R'
                            AND l.l_quantity >= 45)""",
        "heavy_hitters_tokens": relational.heavy_hitters_tokens_sql(20),
        "bigram_topk": text.bigram_topk_sql(),
        "inverted_index": text.inverted_index_sql(vocab_prefix=""),
        "embedding_covariance": """
            WITH q AS (
              SELECT vec_id,
                     CAST(unnest(generate_series(1, len(embedding))) - 1
                          AS BIGINT) AS dim,
                     CAST(floor(unnest(embedding) * 65536) AS BIGINT)
                       AS qv
              FROM embeddings)
            SELECT a.dim AS i, b.dim AS j,
                   CAST(sum(a.qv * b.qv) AS BIGINT) AS gram,
                   CAST(CASE WHEN a.dim = 0 THEN sum(b.qv) ELSE 0 END
                        AS BIGINT) AS s_sum,
                   CAST(CASE WHEN a.dim = 0 AND b.dim = 0
                        THEN count(*) ELSE 0 END AS BIGINT) AS n_rows
            FROM q a JOIN q b USING (vec_id)
            GROUP BY a.dim, b.dim""",
        "tfidf_topk": text.tfidf_topk_sql(k=3),
        "kmeans_assign": _cluster_sql(),
        "semdedup": _semdedup_sql(),
        "bpe_merges": f"""
            SELECT step, lhs, rhs, pair_count
            FROM read_parquet('{C}/bpe_expected.parquet')""",
        "bpe_encode": f"""
            SELECT doc_id, n_words, n_tokens
            FROM read_parquet('{C}/bpe_encode_expected.parquet')""",
        "lineitem_sample": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
                     AS l_linenumber,
                   CAST(round(l_quantity) AS BIGINT) AS qty
            FROM lineitem
            WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':7'), 1, 8)
                  < '%08x'""" % int(0.05 * (1 << 32)),
        "orders_sample_per_priority": """
            WITH r AS (
              SELECT o_orderpriority, o_orderkey,
                     row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)
                                    || ':0'), o_orderkey) AS rank
              FROM orders)
            SELECT o_orderpriority, o_orderkey, CAST(rank AS BIGINT)
                     AS rank
            FROM r WHERE rank <= 4""",
        "textprep_decisions": text.textprep_decisions_sql(
            TEXTPREP_BASE_SQL),
        "imageprep_decisions": f"""
            WITH f AS (
              SELECT i.image_id, i.caption, i.phash,
                     CAST(e.n_nodata AS BIGINT) AS n_nodata,
                     CAST(e.n_qa_masked AS BIGINT) AS n_qa,
                     CAST(e.n_saturated AS BIGINT) AS n_sat
              FROM read_parquet('{C}/images/*.parquet') i
              JOIN read_parquet('{C}/images_expected.parquet') e
                USING (image_id)),
            v AS (
              SELECT image_id, phash,
                     CASE WHEN n_nodata > 0 THEN 'gap'
                          WHEN n_qa > 0 THEN 'cloudy'
                          WHEN n_sat > 0 THEN 'saturated'
                          WHEN NOT regexp_matches(caption,
                               'water|vegetation|urban|forest')
                            THEN 'topic'
                          ELSE '' END AS pre
              FROM f)
            SELECT image_id,
                   CASE WHEN pre <> '' THEN pre
                        WHEN image_id = min(CASE WHEN pre = ''
                             THEN image_id END)
                             OVER (PARTITION BY phash) THEN 'keep'
                        ELSE 'duplicate' END AS verdict
            FROM v""",
        "pii_scrub": text.pii_scrub_sql(PII_AUG_SQL),
        "token_edit_join": text.edit_distance_join_sql(MISSP_AUG_SQL),
        "url_domains": f"""
            WITH aug AS (
              SELECT doc_id, {URL_AUG_SQL} AS text FROM documents),
            hits AS (
              SELECT unnest(regexp_extract_all(
                         text, 'https?://([A-Za-z0-9.-]+)', 1))
                       AS domain
              FROM aug)
            SELECT domain, CAST(count(*) AS BIGINT) AS n_urls
            FROM hits GROUP BY domain""",
        "repetition_filter": text.gopher_repetition_sql(3),
        "substring_dup": text.substring_dup_sql(8),
        "orders_rank": relational.global_rank_sql(
            "orders", "o_custkey", "o_orderkey"),
        "user_anomalies": events.user_anomalies_sql(),
        "csv_window": f"""
            SELECT event_type,
                   ts_us // 3600000000 AS hour_bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   min(value) AS min_value, max(value) AS max_value
            FROM read_csv_auto('{C}/events_csv/*.csv')
            GROUP BY event_type, hour_bucket""",
        "jsonl_quality": text.quality_score_sql().replace(
            "FROM documents",
            f"FROM read_json_auto('{C}/documents_jsonl/*.jsonl')"),
        "compression_filter": f"""
            SELECT doc_id, n_raw, n_comp,
                   CAST(CASE WHEN n_raw > 0
                        THEN n_comp * 1000000 // n_raw
                        ELSE 1000000 END AS BIGINT) AS ratio_u6,
                   (CASE WHEN n_raw > 0
                         THEN n_comp * 1000000 // n_raw
                         ELSE 1000000 END) BETWEEN 430000 AND 650000
                     AS keep
            FROM read_parquet('{C}/compression_expected.parquet')""",
        "line_dedup": text.line_dedup_sql(
            8, 2, base_sql=(
                "SELECT doc_id, text FROM documents UNION ALL "
                f"SELECT doc_id, text FROM "
                f"read_parquet('{C}/planted_docs.parquet')")),
        "pack_chunks": text.pack_chunks_sql(512),
        "chunk_spans": text.chunk_spans_sql(32, 24),
        "curation_ledger": _curation.curation_ledger_sql(C),
        "curation_pipeline": _curation.curation_placement_sql(C, 512),
        "curation_ledger_antijoin": _curation.curation_ledger_sql(C),
        "curation_pipeline_antijoin":
            _curation.curation_placement_sql(C, 512),
        "decontaminate": text.decontaminate_sql(8),
        "token_count": text.token_count_sql(),
        "doc_freq_score": text.doc_freq_score_sql(),
        "retention_cohorts": events.retention_cohorts_sql(),
        "funnel_conversions": events.funnel_conversions_sql(),
        "transition_counts": events.transition_counts_sql(),
        "rolling_active_users": events.rolling_active_users_sql(
            window_days=2),
        "user_top_event": relational.grouped_mode_sql(
            "events", "user_id", "event_type", alias="top_event"),
        "value_histogram": relational.value_histogram_sql(
            "lineitem", "l_quantity", lo=1, hi=50, bins=10),
        "embedding_quantize": ann.quantize_int8_sql(),
        "label_centroids": ann.label_centroids_sql(),
        "streaming_dedup": """
            SELECT DISTINCT md5(text) AS content_hash
            FROM documents""",
        "dataset_split": "SELECT doc_id, %s AS split FROM documents"
            % relational.split_assign_sql("doc_id"),
        "corpus_mix": relational.corpus_mix_sql(),
        "lang_stats": text.lang_stats_sql(),
        "quality_score": text.quality_score_sql(),
        "lang_id": text.lang_id_sql(),
        "fingerprint": text.fingerprint_sql(),
        "dedup_exact_docs": (
            "SELECT md5(text) AS text_hash, "
            "CAST(min(doc_id) AS BIGINT) AS keep_doc_id, "
            "CAST(count(*) AS BIGINT) AS n_dups "
            "FROM documents GROUP BY md5(text)"),
        "ann_topk": ann.brute_force_topk_sql(),
        "knn_graph": ann.knn_graph_sql(k=5),
        # ann_lsh's oracle IS the exact brute-force ranking: recall 1.0
        # at oracle scales (pinned in tests/test_ann_recall.py); the IVF
        # variant (ann.ivf_topk) is pytest-pinned at recall >= 0.9 (IVF
        # recall depends on cluster structure the synthetic corpus lacks)
        "ann_lsh": ann.brute_force_topk_sql(),
        "cosine_near_dup": """
            SELECT CAST(a.vec_id AS BIGINT) AS vec_a,
                   CAST(b.vec_id AS BIGINT) AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding)
                  >= 0.45""",
        "cosine_near_dup_lsh": f"""
            SELECT vec_a, vec_b
            FROM read_parquet('{C}/cosine_neardup_expected.parquet')""",
        "minhash_pairs_planted": f"""
            SELECT doc_a, doc_b, jaccard_u6
            FROM read_parquet('{C}/minhash_expected.parquet')
            WHERE jaccard_u6 >= 500000""",
        "minhash_pairs": f"""
            SELECT doc_a, doc_b, jaccard_u6
            FROM read_parquet('{C}/minhash_expected.parquet')
            WHERE NOT planted AND jaccard_u6 >= 350000""",
        "ssjoin_pairs": f"""
            SELECT doc_a, doc_b, jaccard_u6
            FROM read_parquet('{C}/minhash_expected.parquet')
            WHERE jaccard_u6 >= 400000""",
        "dedup_clusters": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b
                  FROM read_parquet('{C}/minhash_expected.parquet')
                  WHERE NOT planted AND jaccard_u6 >= 350000),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION SELECT doc_b, doc_a FROM p),
            n AS (SELECT DISTINCT u AS id FROM e),
            r(id, lab) AS (
                SELECT id, id FROM n
                UNION
                SELECT e.u, r.lab FROM e JOIN r ON r.id = e.v)
            SELECT CAST(id AS BIGINT) AS doc_id,
                   CAST(min(lab) AS BIGINT) AS canon_id
            FROM r GROUP BY id""",
        "dedup_keep_best": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b
                  FROM read_parquet('{C}/minhash_expected.parquet')
                  WHERE NOT planted AND jaccard_u6 >= 350000),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION SELECT doc_b, doc_a FROM p),
            n AS (SELECT DISTINCT u AS id FROM e),
            r(id, lab) AS (
                SELECT id, id FROM n
                UNION
                SELECT e.u, r.lab FROM e JOIN r ON r.id = e.v),
            cl AS (SELECT id AS doc_id, min(lab) AS canon_id
                   FROM r GROUP BY id),
            q AS (SELECT doc_id,
                         len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS n_tokens
                  FROM documents)
            SELECT CAST(cl.doc_id AS BIGINT) AS doc_id,
                   CAST(cl.canon_id AS BIGINT) AS canon_id,
                   CAST(q.n_tokens AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN row_number() OVER (
                        PARTITION BY cl.canon_id
                        ORDER BY q.n_tokens DESC, cl.doc_id ASC) = 1
                        THEN 1 ELSE 0 END AS BIGINT) AS kept
            FROM cl JOIN q ON q.doc_id = cl.doc_id""",
        "fuzzy_decontaminate": f"""
            SELECT doc_a AS doc_id, doc_b AS bench_id, jaccard_u6
            FROM read_parquet('{C}/minhash_expected.parquet')
            WHERE doc_a < 1000000 AND doc_b >= 1000000
              AND jaccard_u6 >= 500000""",
        "corpus_filter": text.corpus_filter_sql(),
        "simhash_pairs": f"""
            SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
            FROM read_parquet('{C}/simhash_expected.parquet')
            WHERE NOT planted AND hamming <= 3""",
        "simhash_pairs_planted": f"""
            SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
            FROM read_parquet('{C}/simhash_expected.parquet')
            WHERE hamming <= 8""",
        "audio_features": f"""
            SELECT media_id, CAST(n_windows AS BIGINT) AS n_windows,
                   rms_head_u6, zcr_head_u6, rms_sum_u6, caption
            FROM read_parquet('{C}/media_audio_expected.parquet')""",
        "audio_goertzel": f"""
            SELECT media_id, CAST(n_windows AS BIGINT) AS n_windows,
                   g_head_u6, g_sum_u6, caption
            FROM read_parquet('{C}/media_audio_expected.parquet')""",
        "audio_downmix": f"""
            SELECT media_id, CAST(n_windows AS BIGINT) AS n_windows,
                   rms_head_u6, zcr_head_u6, rms_sum_u6, caption
            FROM read_parquet('{C}/media_audio_mc_expected.parquet')""",
        "video_scene_cuts": f"""
            SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_cuts AS BIGINT) AS n_cuts, cut_head, cut_sum,
                   caption
            FROM read_parquet('{C}/media_video_cuts_expected.parquet')""",
        "video_frame_sample": f"""
            SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                   CAST(h AS BIGINT) AS h, CAST(w AS BIGINT) AS w,
                   px_sum, caption
            FROM read_parquet('{C}/media_video_expected.parquet')""",
        "flagship_abundance": f"""
            SELECT tile_id, caption, CAST(3 AS BIGINT) AS q,
                   CAST(1024 AS BIGINT) AS n_px,
                   CAST(0 AS BIGINT) AS n_sum_viol,
                   CAST(0 AS BIGINT) AS n_range_viol
            FROM read_parquet('{C}/tiles_spectral_expected.parquet')""",
        "sasma_abundance": f"""
            SELECT tile_id, image_id, CAST(3 AS BIGINT) AS q,
                   CAST(0 AS BIGINT) AS n_invalid,
                   CAST(0 AS BIGINT) AS n_unstable_leak
            FROM read_parquet('{C}/tiles_expected.parquet')
            WHERE image_id < 'img00000050'""",
        "forward_model_rmse": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_tiles,
                   TRUE AS rmse_lt_2
            FROM read_parquet('{C}/tiles_expected.parquet')""",
        # remaining rows-only: none — every query above either has a
        # DuckDB-checkable oracle or an invariant summary oracle.
    }
