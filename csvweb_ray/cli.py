"""Command-line entry point (the ``ray job submit`` surface).

    python -m csvweb_ray.cli run   --corpus corpus.parquet --out outdir \
        [--mode minimal|standard] [--shards 64] [--salt 1] [--link] \
        [--no-resume] [--num-cpus N]
    python -m csvweb_ray.cli synth --out corpus.parquet --files 1000 --rows 300

Owns its Ray session (guarded ``ray.init``), per the driver contract that
library code never initialises Ray itself.  On a real cluster, submit as
``ray job submit -- python -m csvweb_ray.cli run ...`` — the same DAG
runs unchanged; only ``address`` differs.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from .raycfg import configure

    configure(num_cpus)


def cmd_run(args) -> int:
    _init_ray(args.num_cpus)
    from .pipeline.runner import run_kg_pipeline

    report = run_kg_pipeline(
        args.corpus, args.out, mode=args.mode, num_shards=args.shards,
        shards_per_wave=args.wave, pairing_salt=args.salt,
        resume=not args.no_resume, with_linking=args.link,
        resume_merge=args.resume_merge)
    print(json.dumps({k: v for k, v in report.items() if k != "shards"},
                     default=str))
    import ray

    ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    from .corpus import synth_corpus_rows, write_corpus

    rows = synth_corpus_rows(n_files=args.files, rows_per_file=args.rows,
                             seed=args.seed)
    write_corpus(rows, args.out)
    print(json.dumps({"out": args.out, "corpus_rows": len(rows)}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="csvweb_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the corpus→triples KG pipeline")
    run.add_argument("--corpus", required=True, help="input parquet path/dir")
    run.add_argument("--out", required=True, help="output directory")
    run.add_argument("--mode", default="minimal", choices=["minimal", "standard"])
    run.add_argument("--shards", type=int, default=64)
    run.add_argument("--wave", type=int, default=None,
                     help="shards per checkpoint wave (default: all pending)")
    run.add_argument("--salt", type=int, default=1,
                     help="pairing salt buckets for hot directories")
    run.add_argument("--link", action="store_true", help="run entity linking")
    run.add_argument("--no-resume", action="store_true")
    run.add_argument("--resume-merge", dest="resume_merge",
                     action="store_true", default=True,
                     help="range-checkpointed final merge — the DEFAULT "
                          "(re-runs only missing ranges after a mid-merge "
                          "failure; at cost-parity with the fused sort)")
    run.add_argument("--no-resume-merge", dest="resume_merge",
                     action="store_false",
                     help="all-or-nothing fused-sort final merge")
    run.add_argument("--num-cpus", type=int, default=None)
    run.set_defaults(fn=cmd_run)

    synth = sub.add_parser("synth", help="generate a synthetic corpus")
    synth.add_argument("--out", required=True)
    synth.add_argument("--files", type=int, default=1000)
    synth.add_argument("--rows", type=int, default=300)
    synth.add_argument("--seed", type=int, default=42)
    synth.set_defaults(fn=cmd_synth)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
