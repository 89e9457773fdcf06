"""Near-duplicate detection over the testdata documents table.

    PYTHONPATH=.. python examples/dedup_demo.py
"""
import ray
import ray.data as rd

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from anofox_forecast_ray.extras.dedup import minhash_candidate_pairs

docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                       columns=["doc_id", "text"])
pairs = minhash_candidate_pairs(docs, threshold=0.4).to_pandas()
print(f"{len(pairs)} candidate near-duplicate pairs (threshold 0.4)")
print(pairs.head(10).to_string(index=False))
ray.shutdown()
