"""Incremental continuous aggregates: feed rollup rows to stateful bucket
actors and query the running snapshot between arrivals.

    PYTHONPATH=.. python examples/streaming_demo.py
"""
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from anofox_forecast_ray.config import SMALL_TIERS
from anofox_forecast_ray.corpus import generate_corpus
from anofox_forecast_ray.stages.rollup import make_tier_rollup_fn
from anofox_forecast_ray.stages.streaming import StreamingSourceRollup

rollup = make_tier_rollup_fn(SMALL_TIERS[:1])(
    generate_corpus(500, seed=2, mean_len=300, sigma=0.8)
)
stream = StreamingSourceRollup(n_buckets=2)
try:
    step = rollup.num_rows // 4
    for i, off in enumerate(range(0, rollup.num_rows, step)):
        stream.ingest(rollup.slice(off, step))
        snap = stream.snapshot()
        print(f"after chunk {i}: {snap.num_rows} live (source, window) keys")
    print(snap.to_pandas().head(8).to_string(index=False))
finally:
    stream.shutdown()
ray.shutdown()
