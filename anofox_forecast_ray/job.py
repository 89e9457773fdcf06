"""Cluster job entrypoint for the flagship engine (north rule: "run via
ray job submit on a fixed-size multi-node Ray cluster").

On a real cluster:

    ray job submit --working-dir . -- \
        python -m anofox_forecast_ray.job \
            --input '/data/corpus/*.parquet' --out /data/rollup_store \
            --shards 256 --tiers 60,3600,86400

Inside `ray job submit` the job supervisor sets RAY_ADDRESS, so the
bare ``ray.init()`` here attaches to the hosting cluster; run the same
command standalone and it starts a local session instead. Resume is on
by default: a re-submitted job skips every shard whose lineage record
exists (state/lineage.py), so a killed 100 TB run replays only
unfinished partitions.

This module is a CLI entry point — per the repo invariant it is the
only kind of code allowed to own a Ray session (never library code).
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import sys
import time


def _expand_inputs(specs: list[str]) -> list[str]:
    """Each spec is a parquet file, a glob, or a directory (recursed).
    Remote URIs (s3:// etc.) pass through untouched — the cluster's
    read_parquet resolves them."""
    out: list[str] = []
    for spec in specs:
        if "://" in spec:
            out.append(spec)
        elif os.path.isdir(spec):
            for root, _, names in os.walk(spec):
                out.extend(
                    os.path.join(root, n)
                    for n in names
                    if n.endswith(".parquet")
                )
        elif any(ch in spec for ch in "*?["):
            out.extend(_glob.glob(spec))
        else:
            out.append(spec)
    if not out:
        raise SystemExit(f"no parquet inputs matched {specs}")
    return sorted(out)


def _parse_tiers(spec: str):
    from .config import TierSpec

    widths = [int(w) for w in spec.split(",") if w]
    return tuple(TierSpec(f"w{w}", w) for w in widths)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(
        prog="python -m anofox_forecast_ray.job",
        description="tiered rollup + downsample + retention engine",
    )
    ap.add_argument("--input", nargs="+", required=True,
                    help="parquet file(s) / glob(s) / director(ies)")
    ap.add_argument("--out", required=True, help="output store directory")
    ap.add_argument("--shards", type=int, default=1,
                    help="lineage partitions (resume granularity)")
    ap.add_argument("--tiers", default="8,32,128",
                    help="comma-separated ascending tier widths; each "
                         "coarser width must be a multiple of every finer")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--forecast-concurrency", type=int, default=8)
    ap.add_argument("--no-forecast", action="store_true")
    ap.add_argument("--no-gorilla", action="store_true")
    ap.add_argument("--no-resume", action="store_true",
                    help="replay every shard even if lineage exists")
    ap.add_argument("--input-format", choices=["corpus", "documents"],
                    default="corpus",
                    help="corpus = pre-tokenized (doc_id, tokens, n_tok, "
                         "source); documents = raw text tables, tokenized "
                         "on read")
    ap.add_argument("--metrics-out", default=None,
                    help="also write the metrics JSON line to this file")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone it starts a local session
        ray.init(include_dashboard=False, ignore_reinit_error=True)

    from .config import EngineConfig
    from .pipelines.flagship import run_flagship

    cfg = EngineConfig(
        tiers=_parse_tiers(args.tiers),
        batch_size=args.batch_size,
        forecast_concurrency=args.forecast_concurrency,
    )
    files = _expand_inputs(args.input)
    t0 = time.time()
    summary = run_flagship(
        files,
        args.out,
        cfg,
        n_shards=args.shards,
        resume=not args.no_resume,
        with_forecast=not args.no_forecast,
        with_gorilla=not args.no_gorilla,
        input_format=args.input_format,
    )
    wall = time.time() - t0
    metrics = {
        "metric": "flagship_job",
        "wall_sec": round(wall, 3),
        "input_files": len(files),
        "tokens_per_sec": (
            round(summary["token_count"] / wall, 1) if wall > 0 else None
        ),
        **{k: v for k, v in summary.items() if k != "stage_sec"},
        "stage_sec": summary.get("stage_sec", {}),
    }
    line = json.dumps(metrics)
    print(line)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")
    if owns_session:
        ray.shutdown()
    return metrics


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
