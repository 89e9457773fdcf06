"""Shared scaffold for the driver-query waves (VERDICT r4 item 7).

Three patterns repeat across the ~300 wave files (415 read sites, ~360
tree-reduce sites, ~30 private golden-ratio hash helpers); this module
is their single home. Helpers are exact drop-ins: each reproduces the
inlined code it replaces statement-for-statement, so migrating a call
site cannot move a hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: golden-ratio multiplier used by every coarse-bucket hash in the repo
MIX64 = np.uint64(0x9E3779B97F4A7C15)


def hash_bucket(keys: np.ndarray, n_buckets: int = 64) -> np.ndarray:
    """hash(key) % n_buckets via the fibonacci mix — identical to the
    per-file _bucket_of/_hash_bucket copies it replaces."""
    mix = keys.astype(np.uint64) * MIX64
    return ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets


def read_cols(sf_dir: str, table: str, columns: list[str]):
    """Pruned parquet read with the standard block-count override — the
    repeated 6-line ``rd.read_parquet(f"{sf_dir}/<table>.parquet", ...)``
    block."""
    import ray.data as rd

    from .queries import _num_read_blocks

    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def reduce_ds(ds, merge) -> pa.Table:
    """``tree_reduce_tables(list(ds.to_arrow_refs()), merge)`` — the
    partial→tree-reduce→driver-fold tail of most scan queries."""
    from ..stages.source_rollup import tree_reduce_tables

    return tree_reduce_tables(list(ds.to_arrow_refs()), merge)
