"""Command-line entry point (the ``ray job submit`` surface).

Run on a cluster as:
    ray job submit --working-dir . -- \
        python -m unmixing_ray.cli flagship --corpus <dir> --out <dir>

In this sandbox (single node, local mode) the same command runs directly;
the script owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="unmixing_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    fp = sub.add_parser("flagship", help="run the flagship pipeline")
    fp.add_argument("--corpus", required=True)
    fp.add_argument("--out", required=True)
    fp.add_argument("--tile", type=int, default=32)
    fp.add_argument("--cell-level", type=int, default=12)
    fp.add_argument("--q", type=int, default=3)
    fp.add_argument("--knn", type=int, default=2)
    fp.add_argument("--induce", choices=("nfindr", "ppi"),
                    default="nfindr")
    fp.add_argument("--num-cpus", type=int, default=None)
    fp.add_argument("--induce-guard-mod", type=int, default=None,
                    help="enable the fused-induce volume guard on a "
                         "~1/MOD tile sample (off by default)")
    fp.add_argument("--compact-max-files", type=int, default=None,
                    help="compact checkpoint partitions down to at "
                         "most this many files after the run")

    gen = sub.add_parser("generate", help="generate a synthetic corpus")
    gen.add_argument("--out", required=True)
    gen.add_argument("--n-images", type=int, required=True)
    gen.add_argument("--seed", type=int, default=7)

    args = parser.parse_args(argv)

    if args.cmd == "generate":
        from .sources import synth
        path = synth.generate_corpus(args.out, args.n_images, args.seed)
        print(json.dumps({"corpus": path, "n_images": args.n_images}))
        return 0

    if args.cmd == "flagship":
        import ray
        if not ray.is_initialized():
            kwargs = dict(address="local", include_dashboard=False,
                          logging_level="ERROR")
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
            ray.init(**kwargs)
        try:
            from ray.data import DataContext
            DataContext.get_current().enable_progress_bars = False
            from .pipelines import flagship
            res = flagship.run_flagship(
                args.corpus, args.out, tile=args.tile,
                cell_level=args.cell_level, q=args.q, k_knn=args.knn,
                induce=args.induce,
                induce_guard_mod=args.induce_guard_mod,
                compact_max_files=args.compact_max_files)
            print(json.dumps({
                "abundances_dir": res["abundances_dir"],
                "join_dir": res["join_dir"],
                "timings": res["timings"],
                "induce_guard": res["induce_guard"],
                "n_partitions": len(res["lineage"]),
            }))
        finally:
            ray.shutdown()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
