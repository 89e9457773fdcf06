"""Run the full flagship engine over a synthetic corpus.

    PYTHONPATH=.. python examples/flagship_demo.py
"""
import shutil

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from anofox_forecast_ray.config import EngineConfig, SMALL_TIERS
from anofox_forecast_ray.corpus import write_corpus
from anofox_forecast_ray.pipelines.flagship import run_flagship

corpus = write_corpus("/tmp/demo_corpus.parquet", 2000, seed=1,
                      mean_len=400, sigma=1.0)
out = "/tmp/demo_out"
shutil.rmtree(out, ignore_errors=True)
summary = run_flagship(corpus, out, EngineConfig(tiers=SMALL_TIERS),
                       n_shards=1)
print("summary:", summary)
print(f"outputs under {out}/: rollup/ forecast/ gorilla/ source_rollup/ "
      "_lineage/  (rerun resumes from lineage)")
ray.shutdown()
