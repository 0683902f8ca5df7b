"""CLI job entry: ``python -m thunder_ray <command>`` — the ``ray job
submit`` surface of the engine (north rule: "runs via ray job submit on
fixed N-node clusters").  On a cluster::

    ray job submit --working-dir . -- python -m thunder_ray rollup \\
        --input /data/tokens --out /data/tiers --resume

Commands:
  rollup     checkpointed tier pipeline (resumable; per-shard manifests)
  stream     fused streaming tier pipeline (throughput path, task-retry FT)
  synth      generate the deterministic synthetic tokens table
  gapfill    gap-fill a rolled tier directory
  compress   Gorilla-compress a rolled tier directory

Owns its Ray session (guarded init) — the library itself never calls
ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS")) and os.environ.get("RAY_ADDRESS") != "local"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="thunder_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("rollup", help="checkpointed raw->1m->1h->1d rollup")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--files-per-shard", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--merge-strategy", default="auto",
                   choices=["auto", "tree", "groupby"],
                   help="partials merge topology (the remedy a "
                        "TreeMergeOverflowError names is --merge-strategy "
                        "groupby)")
    p.add_argument("--expected-groups", type=int, default=None,
                   help="~#sources x #buckets; steers merge-strategy auto")

    p = sub.add_parser("stream", help="fused streaming rollup (no checkpoints)")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--merge-strategy", default="auto",
                   choices=["auto", "tree", "groupby"])
    p.add_argument("--expected-groups", type=int, default=None)

    p = sub.add_parser("synth", help="write the synthetic tokens table")
    p.add_argument("--out", required=True)
    p.add_argument("--rows", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("gapfill", help="gap-fill a rolled tier directory")
    p.add_argument("--tier-dir", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("compress", help="Gorilla-compress a rolled tier directory")
    p.add_argument("--tier-dir", required=True)
    p.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "synth":
        from .synth import write_tokens_parquet

        out = write_tokens_parquet(args.out, args.rows, seed=args.seed)
        print(json.dumps({"written": out, "rows": args.rows}))
        return 0

    _ensure_ray()

    if args.cmd == "rollup":
        from .pipelines.tiers import run_rollup

        metrics = run_rollup(args.input, args.out,
                             files_per_shard=args.files_per_shard,
                             resume=not args.no_resume,
                             merge_strategy=args.merge_strategy,
                             expected_groups=args.expected_groups)
        print(json.dumps(metrics))
    elif args.cmd == "stream":
        from .pipelines.tiers import rollup_streaming

        print(json.dumps(rollup_streaming(
            args.input, args.out, merge_strategy=args.merge_strategy,
            expected_groups=args.expected_groups)))
    elif args.cmd == "gapfill":
        import glob

        import ray.data as rd

        from .stages.gapfill import gap_fill

        ds = rd.read_parquet(sorted(glob.glob(f"{args.tier_dir}/*.parquet")))
        gap_fill(ds).write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    elif args.cmd == "compress":
        import glob

        import ray.data as rd

        from .stages.codec import encode_tier

        ds = rd.read_parquet(sorted(glob.glob(f"{args.tier_dir}/*.parquet")))
        encode_tier(ds).write_parquet(args.out)
        print(json.dumps({"out": args.out}))

    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
