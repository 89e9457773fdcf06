"""Capture Ray Dataset per-stage execution stats (ds.stats()) for the
rollup pipeline — the wall/cpu/memory breakdown used to verify that
stage time is dominated by useful compute (task instruction: read
ds.stats() and iterate).

Usage: PYTHONPATH=/root/repo python tools/stage_stats.py [corpus.parquet]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from anofox_forecast_ray.config import EngineConfig, SMALL_TIERS
    from anofox_forecast_ray.corpus import write_corpus
    from anofox_forecast_ray.stages.rollup import rollup_dataset

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stats_corpus.parquet"
    if not os.path.exists(path):
        write_corpus(path, 5000, seed=4, mean_len=1000.0, sigma=1.0)

    cfg = EngineConfig(tiers=SMALL_TIERS, batch_size=256)
    ds = rollup_dataset(
        rd.read_parquet(path, override_num_blocks=16), cfg
    )
    # materialize() so the executed plan's stats are attached (count()
    # alone leaves stats() empty on this Ray version); fine here — stats
    # capture is a diagnostic on a small corpus, not a production path
    mat = ds.materialize()
    print(f"rollup rows: {mat.count()}\n")
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
