#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "tiles_per_sec": ...}

--scaling: run the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and print both throughputs plus
scaling efficiency (the sandbox protocol for the N→4N-nodes rule, see
BASELINE.md).
"""

import json
import os
import shutil
import subprocess
import sys
import time


def host_probe(n_iter=3):
    """Throttle sentinel: a fixed single-threaded numpy FCLS workload
    (~0.2 s on a quiet host) run immediately around each timed leg, so
    every measurement is annotated with the CONTEMPORANEOUS host speed
    (Mpx/s). The sandbox host throttles unpredictably (identical runs
    vary ~2x within an hour — NOTES.md); the probe separates 'the engine
    slowed down' from 'the host did' and feeds the normalized
    efficiency in --scaling output."""
    import numpy as np
    from unmixing_ray.kernels import nnls
    rng = np.random.default_rng(12345)
    U = rng.normal(size=(3, 5)) * 1000
    X = rng.normal(size=(65536, 5)) * 1000
    nnls.fcls_pixels(X[:4096], U)          # warm
    t0 = time.monotonic()
    for _ in range(n_iter):
        nnls.fcls_pixels(X, U)
    return round(n_iter * 65536 / (time.monotonic() - t0) / 1e6, 2)


def run_scaling():
    # leg sizes: the N -> 4N protocol defaults to 8 -> 32; overridable
    # (e.g. "4,16") because the single-box DRAM bus saturates below 8
    # streams — a 4->16 pair measures the engine's scaling in the
    # regime where the shared bus itself still scales (BASELINE.md)
    lo_n, hi_n = (int(x) for x in os.environ.get(
        "RAY_GRAFT_SCALING_LEVELS", "8,32").split(","))

    def run(ncpu):
        # 2 in-process repeats per leg: the in-process min catches quiet
        # host windows that a single cold run misses
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAY_GRAFT_REPEAT=os.environ.get(
                       "RAY_GRAFT_LEG_REPEAT", "2"),
                   RAY_GRAFT_SKEW="0")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm the page cache + corpus cache (untimed)
    warm_env = dict(os.environ, RAY_GRAFT_CPUS=str(lo_n),
                    RAY_GRAFT_WARMUP_ONLY="1")
    subprocess.run([sys.executable, os.path.abspath(__file__)],
                   env=warm_env, capture_output=True, text=True)
    # interleave legs (lo,hi,lo,hi) and take per-level minima: the
    # sandbox host throttles under sustained load, so alternating spreads
    # the slowdown across both levels instead of biasing the second leg
    runs = {lo_n: [], hi_n: []}
    for _ in range(int(os.environ.get("RAY_GRAFT_SCALING_ROUNDS", "2"))):
        for ncpu in (lo_n, hi_n):
            runs[ncpu].append(run(ncpu))
    lo = min(runs[lo_n], key=lambda r: r["value"])
    hi = min(runs[hi_n], key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    out = {
        "levels": [lo_n, hi_n],
        "pinned": os.environ.get("RAY_GRAFT_PIN") == "1",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "sec_8_runs": [r["value"] for r in runs[lo_n]],
        "sec_32_runs": [r["value"] for r in runs[hi_n]],
        "tiles_per_sec_8": lo.get("tiles_per_sec"),
        "tiles_per_sec_32": hi.get("tiles_per_sec"),
        "scaling_efficiency": round(eff, 3),
        "probe_mpx_s_8": lo.get("probe_mpx_s"),
        "probe_mpx_s_32": hi.get("probe_mpx_s"),
        "probe_runs_8": [r.get("probe_mpx_s") for r in runs[lo_n]],
        "probe_runs_32": [r.get("probe_mpx_s") for r in runs[hi_n]],
        # per-leg DRAM window quality (GB/s; see dram_probe) — the
        # second control: a leg timed against a saturated bus carries
        # its own evidence
        "dram_gb_s_8": lo.get("dram_gb_s"),
        "dram_gb_s_32": hi.get("dram_gb_s"),
        "dram_runs_8": [r.get("dram_gb_s") for r in runs[lo_n]],
        "dram_runs_32": [r.get("dram_gb_s") for r in runs[hi_n]],
        "sf": lo["sf"],
    }
    # throttle-normalized efficiency: time x contemporaneous host speed
    # = work; eff_norm = (t8*c8)/(t32*c32)/4 cancels host throttling
    # that hit one leg but not the other
    c8, c32 = lo.get("probe_mpx_s"), hi.get("probe_mpx_s")
    if c8 and c32:
        out["scaling_efficiency_normalized"] = round(
            (lo["value"] * c8) / (hi["value"] * c32) / (hi_n / lo_n), 3)
    print(json.dumps(out))


def run_kernel_scaling():
    """Host-capability control (no Ray): aggregate FCLS kernel
    throughput with 8 vs 32 independent processes. Distinguishes 'the
    host cannot scale 8→32 cores' from 'the engine cannot' — recorded
    alongside the pipeline scaling numbers in BASELINE.md."""
    import multiprocessing as mp

    def worker(n_iter, out_q):
        import numpy as np
        from unmixing_ray.kernels import nnls
        rng = np.random.default_rng(os.getpid())
        U = rng.normal(size=(3, 5)) * 1000
        X = rng.normal(size=(65536, 5)) * 1000
        t0 = time.monotonic()
        for _ in range(n_iter):
            nnls.fcls_pixels(X, U)
        out_q.put((n_iter * 65536, time.monotonic() - t0))

    out = {}
    for k in (8, 32, 8, 32):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(6, q)) for _ in range(k)]
        t0 = time.monotonic()
        for p in procs:
            p.start()
        tot = sum(q.get()[0] for _ in procs)
        for p in procs:
            p.join()
        out.setdefault(k, []).append(tot / (time.monotonic() - t0) / 1e6)
    m8, m32 = max(out[8]), max(out[32])
    print(json.dumps({
        "kernel_mpx_s_8procs": round(m8, 2),
        "kernel_mpx_s_32procs": round(m32, 2),
        "kernel_scaling_efficiency": round(m32 / m8 / 4.0, 3)}))


def dram_probe(k, n_iter=3):
    """One k-stream round of the bandwidth control (~1-2 s): annotates
    a timed leg with the CONTEMPORANEOUS aggregate DRAM throughput, the
    second quietness signal next to the CPU probe (a quiet CPU probe
    with a saturated bus still means 3-4x pipeline times — see
    BENCH.md round-3 session-5 datapoint). Runs in a CLEAN subprocess:
    forking stream workers from a Ray-initialized parent measured
    0.2 GB/s where the clean control reads 16+ (fork cost + inherited
    state dominate the wall clock)."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--dram-probe-once", str(k), str(n_iter)],
        capture_output=True, text=True)
    try:
        return float(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return -1.0


def _dram_probe_inproc(k, n_iter=3):
    import multiprocessing as mp

    # window-quality readings must be comparable across (possibly
    # pinned) legs: always measure with full-host affinity
    try:
        os.sched_setaffinity(0, set(range(os.cpu_count())))
    except (AttributeError, OSError):
        pass

    def worker(n, q):
        import numpy as np
        a = np.random.default_rng(os.getpid()).integers(
            0, 1000, 25_000_000, dtype=np.int16)
        t0 = time.monotonic()
        s = 0.0
        for _ in range(n):
            b = a.astype(np.float64)
            s += float(b[::4096].sum())
        q.put((n * a.nbytes * 9, time.monotonic() - t0))

    def one_round(n):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(n, q))
                 for _ in range(k)]
        t0 = time.monotonic()
        for p in procs:
            p.start()
        tot = sum(q.get()[0] for _ in procs)
        for p in procs:
            p.join()
        return tot / (time.monotonic() - t0) / 1e9

    # a cold first round underreads ~7x (numpy import + first-touch
    # page faults dominate); match the control's max-of-rounds reading
    one_round(1)
    return round(one_round(n_iter), 1)


def run_bandwidth_control():
    """DRAM-bandwidth control (no Ray): aggregate streaming throughput
    with 8 vs 32 independent processes, each expanding a 50 MB int16
    buffer to float64 (pure read+write streams, no compute). On this
    sandbox the measurement is ~19 GB/s at 8 procs vs ~10 GB/s at 32 —
    NEGATIVE scaling (efficiency ~0.14): the single node's memory bus
    saturates below 8 streams. Any bandwidth-bound stage (decode,
    checkpoint write) therefore cannot scale 8→32 cores here, while the
    CPU-bound kernel control scales at ~0.9 — together they attribute
    the large-corpus efficiency gap to the shared-DRAM sandbox, which a
    real 4N-node cluster (per-node memory buses) does not have."""
    import multiprocessing as mp

    def worker(n_iter, q):
        import numpy as np
        a = np.random.default_rng(os.getpid()).integers(
            0, 1000, 25_000_000, dtype=np.int16)      # 50 MB
        t0 = time.monotonic()
        s = 0.0
        for _ in range(n_iter):
            b = a.astype(np.float64)                  # 9x bytes streamed
            s += float(b[::4096].sum())
        q.put((n_iter * a.nbytes * 9, time.monotonic() - t0))

    out = {}
    for k in (8, 32, 8, 32):
        q = mp.Queue()
        procs = [mp.Process(target=worker, args=(6, q))
                 for _ in range(k)]
        t0 = time.monotonic()
        for p in procs:
            p.start()
        tot = sum(q.get()[0] for _ in procs)
        for p in procs:
            p.join()
        out.setdefault(k, []).append(tot / (time.monotonic() - t0) / 1e9)
    m8, m32 = max(out[8]), max(out[32])
    print(json.dumps({
        "gb_s_8procs": round(m8, 1), "gb_s_32procs": round(m32, 1),
        "bandwidth_scaling_efficiency": round(m32 / m8 / 4.0, 3)}))


def run_parity():
    """Full in-repo oracle parity sweep (VERDICT r03 item 3): run EVERY
    queries() entry against its oracle_sql() at sf0.01 and report
    rows/schema/values per query on stderr plus ONE summary JSON line
    on stdout. The driver's CORRECTNESS harness samples ~50 queries per
    round; this is the self-verifying 100% sweep. ~`pytest
    tests/test_oracle_parity.py` covers the same contract per-query;
    this mode needs no pytest and always covers the full registry."""
    sf_dir = os.environ.get("GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[sys.argv.index("--parity") + 1:])
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import duckdb
    import numpy as np
    import pandas as pd
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as em
    queries, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute("CREATE VIEW %s AS SELECT * FROM "
                    "read_parquet('%s/%s.parquet')" % (t, sf_dir, t))

    def norm(obj):
        if not isinstance(obj, pd.DataFrame):
            obj = obj.to_pandas()
        df = obj[sorted(obj.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    names = sorted(n for n in queries if not only or n in only)
    passed, failed, rows_only, errors = [], [], [], {}
    t_all = time.monotonic()
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            got = norm(queries[name](sf_dir))
            if name not in oracles:
                rows_only.append(name)
                status = "rows_only(%d)" % len(got)
            else:
                want = norm(con.sql(oracles[name]).df())
                probs = []
                if list(got.columns) != list(want.columns):
                    probs.append("schema %s vs %s" % (
                        list(got.columns), list(want.columns)))
                elif len(got) != len(want):
                    probs.append("rows %d vs %d" % (len(got), len(want)))
                else:
                    for c in got.columns:
                        a, b = got[c].to_numpy(), want[c].to_numpy()
                        if a.dtype.kind == "f" or b.dtype.kind == "f":
                            ok = np.allclose(a.astype(float),
                                             b.astype(float), rtol=0,
                                             atol=0, equal_nan=True)
                        else:
                            ok = bool((a == b).all())
                        if not ok:
                            probs.append("values:" + c)
                if probs:
                    failed.append(name)
                    status = "FAIL " + "; ".join(probs)
                else:
                    passed.append(name)
                    status = "ok(%d)" % len(got)
        except Exception as e:                 # noqa: BLE001 — sweep
            errors[name] = "%s: %s" % (type(e).__name__, e)
            failed.append(name)
            status = "ERROR " + errors[name][:120]
        print("[%3d/%d] %-32s %7.2fs %s" % (
            i + 1, len(names), name, time.monotonic() - t0, status),
            file=sys.stderr, flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "n_queries": len(names),
        "n_pass": len(passed), "n_fail": len(failed),
        "n_rows_only": len(rows_only), "failed": failed,
        "rows_only": rows_only, "errors": errors,
        "wall_s": round(time.monotonic() - t_all, 1)}))
    ray.shutdown()


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    # RAY_GRAFT_PIN=1: pin this leg (and every Ray process it spawns —
    # affinity is inherited) to exactly ncpu physical cores. Makes the
    # small leg faithful to a real small node: without pinning an
    # "8-CPU" Ray session still spreads its workers, raylet, object
    # store and GC threads across all 32 physical cores (VERDICT r03
    # item 8 — the measured single-thread turbo asymmetry between legs)
    if os.environ.get("RAY_GRAFT_PIN") == "1":
        try:
            os.sched_setaffinity(0, set(range(ncpu)))
        except (AttributeError, OSError):
            pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from unmixing_ray.sources import synth

    # corpus generation is setup, not measured (cached across runs)
    corpus = synth.ensure_corpus(sf_dir)
    if os.environ.get("RAY_GRAFT_WARMUP_ONLY"):
        print(json.dumps({"warmed": corpus}))
        return

    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from unmixing_ray.pipelines import flagship
    from unmixing_ray.state import manifest as ckpt

    queries = {}

    # repeat and take the min: the sandbox host has ~2x co-tenant noise;
    # each repeat is bracketed by the fixed-work throttle sentinel
    repeats = int(os.environ.get("RAY_GRAFT_REPEAT", "2"))
    times = []
    probes = [host_probe()]
    for rep in range(repeats):
        out_dir = "/tmp/ray_unmix_bench/run_%d_%d_%d" % (os.getpid(),
                                                         ncpu, rep)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        res = flagship.run_flagship(
            corpus, out_dir, tile=synth.TILE, cell_level=synth.CELL_LEVEL,
            q=3, k_knn=2)
        times.append(time.monotonic() - t0)
        probes.append(host_probe())
    total = min(times)
    # annotate the chosen (min) run with the probe bracketing it
    best = times.index(total)
    probe = round((probes[best] + probes[best + 1]) / 2.0, 2)
    queries["flagship"] = round(total, 3)
    queries["flagship_runs"] = [round(t, 3) for t in times]
    queries["probe_mpx_s_runs"] = probes
    n_tiles = sum(r["rows"] for r in ckpt.read_manifest(
        res["abundances_dir"]))

    # secondary pipelines over the provided tables (skipped for synthetic
    # scale factors that have no TPC-H-ish testdata dir)
    import __ray_entry__ as em
    secondary = ("tpch_q1", "dedup_exact_docs", "token_count", "ann_topk",
                 "spatial_join_pip") if os.path.exists(
        os.path.join(str(sf_dir), "lineitem.parquet")) else (
        "spatial_join_pip",)
    for name in secondary:
        t0 = time.monotonic()
        r = em.queries()[name](sf_dir)
        if hasattr(r, "to_pandas"):
            r.to_pandas()
        queries[name] = round(time.monotonic() - t0, 3)

    # end-to-end curation composition pipeline (VERDICT r03 item 9):
    # gates -> exact dedup -> MinHash near-dup -> keep-best -> packed
    # chunks, checkpoint-written to a FRESH dir (a resumed run would
    # measure only the skip path). Skipped inside scaling legs
    # (RAY_GRAFT_SKEW=0) like the skew bench — legs time the flagship.
    if (os.environ.get("RAY_GRAFT_SKEW", "1") != "0"
            and os.path.exists(os.path.join(str(sf_dir),
                                            "documents.parquet"))):
        import ray.data as _rd
        from unmixing_ray.pipelines import curation as _cur
        cur_out = "/tmp/ray_unmix_bench/curation_%d_%d" % (os.getpid(),
                                                           ncpu)
        shutil.rmtree(cur_out, ignore_errors=True)
        t0 = time.monotonic()
        _cur.run_curation(
            _rd.read_parquet(os.path.join(str(sf_dir),
                                          "documents.parquet"),
                             columns=["doc_id", "text"]),
            cur_out, seq_len=512, threshold=0.35)
        queries["curation_pipeline"] = round(time.monotonic() - t0, 3)

    # Halo-exchange family bench row (VERDICT r04 item 7): focal mean +
    # Horn slope over the decoded tile lattice. The cross-tile halo
    # exchange had no bench row, so block-shape regressions in the
    # focal/terrain/texture family were invisible until a consumer
    # (like the curation cluster-resolution cliff) surfaced them.
    # Corpus generation is warmed untimed (disk-cached across runs);
    # each row times decode + halo exchange + per-tile summary.
    if os.environ.get("RAY_GRAFT_SKEW", "1") != "0":
        em._corpus(sf_dir)   # warm the synthetic corpus cache untimed
        for name in ("focal_mean", "terrain_slope"):
            t0 = time.monotonic()
            r = em.queries()[name](sf_dir)
            if hasattr(r, "to_pandas"):
                r.to_pandas()
            queries[name] = round(time.monotonic() - t0, 3)

    # Skew-handling bench over the SKEWED corpus (half the images
    # stacked on one lattice location = one hot composite group holding
    # half the corpus as "dates"): a median composite across dates per
    # tile position, plain groupby vs the documented spatial-sub-block
    # salting (stages/composite.py:split_hot_tiles). The per-group
    # median across ~n/2 dates is the serial hot spot the salting
    # divides; output equality is asserted via an exact x2-integer
    # checksum (medians of ints are multiples of 1/2).
    if os.environ.get("RAY_GRAFT_SKEW", "1") != "0":
        import pyarrow as pa
        import numpy as np
        import ray.data
        from unmixing_ray.sources import images as img_src
        from unmixing_ray.stages import composite as comp_stage
        from unmixing_ray.stages import decode as dstage
        from unmixing_ray.stages import shuffle as sh
        skew_corpus = synth.ensure_skewed_corpus(sf_dir)
        # "2" suffix = the materialized column set; bump when it changes
        skew_tiles_dir = skew_corpus + "_tiles2_v%d" % \
            synth.GENERATOR_VERSION
        if not os.path.isdir(skew_tiles_dir):
            ds = img_src.read_images(skew_corpus)
            fn = dstage.make_decode_and_tile(tile=synth.TILE,
                                             cell_level=synth.CELL_LEVEL)
            ds.map_batches(fn, batch_format="pyarrow", batch_size=32)\
                .select_columns(["cell", "tile_id", "row_off", "col_off",
                                 "bands", "h", "w", "pixels"])\
                .write_parquet(skew_tiles_dir)

        def add_keys(batch: pa.Table) -> pa.Table:
            # composite group key = (cell, tile position) packed into one
            # uint64 (cell*4 + pos: positions are the 2x2 tile lattice);
            # date = the image sequence parsed from tile_id
            cells = batch["cell"].to_numpy(zero_copy_only=False)\
                .astype(np.uint64)
            pos = (batch["row_off"].to_numpy() // synth.TILE) \
                * 2 + (batch["col_off"].to_numpy() // synth.TILE)
            # strip the level bits (all tiles share one level) so the
            # packed key stays < 2^60 — Ray group keys must fit int64
            morton = cells & np.uint64((1 << 58) - 1)
            key = morton * np.uint64(4) + pos.astype(np.uint64)
            dates = np.array([int(t[3:11]) for t in
                              batch["tile_id"].to_pylist()],
                             dtype=np.int64)
            out = batch.select(["bands", "h", "w", "pixels"])
            out = out.append_column("cell", pa.array(key, pa.uint64()))
            return out.append_column("date", pa.array(dates, pa.int64()))

        def comp_group(g: pa.Table) -> pa.Table:
            from unmixing_ray.stages.decode import binary_views
            values, off = binary_views(g["pixels"], np.int16)
            n = g.num_rows
            hw = int(g["h"][0].as_py()) * int(g["w"][0].as_py())
            p = int(g["bands"][0].as_py())
            stack = values[off[0]:off[-1]].reshape(n, p, hw)\
                .astype(np.float64)
            work = np.where(stack == -9999, np.nan, stack)
            import warnings as _w
            with np.errstate(invalid="ignore"), _w.catch_warnings():
                _w.simplefilter("ignore", RuntimeWarning)
                med = np.nanmedian(work, axis=0)
            med = np.where(np.isnan(med), 0.0, med)
            cols = {
                "cell": pa.array([g["cell"][0].as_py()], pa.uint64()),
                "checksum_x2": pa.array(
                    [int(np.rint(med.sum() * 2.0))], pa.int64()),
            }
            if "sub_id" in g.column_names:
                cols["sub_id"] = pa.array([g["sub_id"][0].as_py()],
                                          pa.int64())
            return pa.table(cols)

        keyed_src = ray.data.read_parquet(skew_tiles_dir).map_batches(
            add_keys, batch_format="pyarrow")
        t0 = time.monotonic()
        plain = keyed_src.groupby("cell").map_groups(
            comp_group, batch_format="pyarrow").to_pandas()
        queries["skew_composite_unsalted"] = round(
            time.monotonic() - t0, 3)
        t0 = time.monotonic()
        keyed = ray.data.read_parquet(skew_tiles_dir).map_batches(
            add_keys, batch_format="pyarrow")
        counts = sh.cell_counts(keyed)
        hot = [k for k, n in counts.items() if n > 256]
        split = comp_stage.split_hot_tiles(keyed, hot, sub=4)
        salted = split.groupby(["cell", "sub_id"]).map_groups(
            comp_group, batch_format="pyarrow").to_pandas()
        queries["skew_composite_salted"] = round(
            time.monotonic() - t0, 3)
        # exact equality: sub-block medians tile the full median, so the
        # per-key checksum sums match between plans
        s_tot = salted.groupby("cell")["checksum_x2"].sum()
        p_tot = plain.set_index("cell")["checksum_x2"]
        assert len(s_tot) == len(p_tot) and \
            (s_tot.sort_index() == p_tot.sort_index()).all(), \
            "salted composite mismatch"

        # AUTO leg (VERDICT r04 item 6): the count pre-pass runs over a
        # COLUMN-PRUNED read (key ingredients only, no pixel payload —
        # the full-decode second execution is the overhead that made
        # force-salting lose at quiet windows), the bandwidth probe
        # reads the current bus regime, and the should_salt cost model
        # engages the split only for keys above alpha(regime) balanced
        # worker shares. The goal: match the faster of the two fixed
        # plans in BOTH window regimes.
        t0 = time.monotonic()

        def key_only(batch: pa.Table) -> pa.Table:
            cells = batch["cell"].to_numpy(zero_copy_only=False)\
                .astype(np.uint64)
            pos = (batch["row_off"].to_numpy() // synth.TILE) \
                * 2 + (batch["col_off"].to_numpy() // synth.TILE)
            morton = cells & np.uint64((1 << 58) - 1)
            key = morton * np.uint64(4) + pos.astype(np.uint64)
            return pa.table({"cell": pa.array(key, pa.uint64())})

        # the decision ratio (W_max / worker share) is scale-invariant
        # under uniform sampling, so the audit reads every 4th fragment
        # (column-pruned) and uses the exchange-free hot_key_audit —
        # heavy keys surface in any uniform sample, and nothing pays a
        # per-distinct-key groupby
        import glob as _glob
        frags = sorted(_glob.glob(os.path.join(skew_tiles_dir,
                                               "*.parquet")))
        hot_counts, tot_rows = sh.hot_key_audit(ray.data.read_parquet(
            frags[::4] or frags,
            columns=["cell", "row_off", "col_off"])
            .map_batches(key_only, batch_format="pyarrow"))
        auto_bw = sh.memory_bandwidth_probe()
        hot = sh.should_salt(hot_counts, n_cpus=ncpu, sub=4,
                             bandwidth_gb_s=auto_bw,
                             total_rows=tot_rows)
        queries["skew_auto_bw_gb_s"] = round(auto_bw, 1)
        keyed_auto = ray.data.read_parquet(skew_tiles_dir).map_batches(
            add_keys, batch_format="pyarrow")
        if hot:
            auto = comp_stage.split_hot_tiles(keyed_auto, hot, sub=4) \
                .groupby(["cell", "sub_id"]).map_groups(
                    comp_group, batch_format="pyarrow").to_pandas()
        else:
            auto = keyed_auto.groupby("cell").map_groups(
                comp_group, batch_format="pyarrow").to_pandas()
        queries["skew_composite_auto"] = round(
            time.monotonic() - t0, 3)
        queries["skew_auto_salted_keys"] = len(hot)
        a_tot = auto.groupby("cell")["checksum_x2"].sum()
        assert len(a_tot) == len(p_tot) and \
            (a_tot.sort_index() == p_tot.sort_index()).all(), \
            "auto composite mismatch"

    tiles_per_sec = round(n_tiles / queries["flagship"], 2)
    print(json.dumps({
        "metric": "flagship_pipeline_seconds",
        "value": queries["flagship"],
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(str(sf_dir)),
        "num_cpus": ncpu,
        "n_tiles": n_tiles,
        "tiles_per_sec": tiles_per_sec,
        "probe_mpx_s": probe,
        # window-quality annotation: aggregate DRAM GB/s at this leg's
        # stream count (quiet-host reference ~16-27 GB/s @8; a 32-way
        # reading of ~2 GB/s means every pipeline time is ~3-4x its
        # quiet-window value regardless of engine code — BENCH.md)
        "dram_gb_s": dram_probe(min(ncpu, 32)),
    }))
    shutil.rmtree("/tmp/ray_unmix_bench", ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    if "--dram-probe-once" in sys.argv:
        i = sys.argv.index("--dram-probe-once")
        print(_dram_probe_inproc(int(sys.argv[i + 1]),
                                 int(sys.argv[i + 2])))
    elif "--parity" in sys.argv:
        run_parity()
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--kernel-scaling" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        run_kernel_scaling()
    elif "--bandwidth-control" in sys.argv:
        run_bandwidth_control()
    else:
        main()
