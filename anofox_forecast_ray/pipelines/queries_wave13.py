"""Thirteenth query wave: dedup cluster assignment (connected components
over MinHash near-dup pairs), count-min-sketch heavy hitters, Bloom-filter
anti-join, and DTW series distances — the remaining training-data /
sketch operators, each with a bitwise DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def build_wave13_queries():
    queries, oracles = {}, {}

    from ..extras.components import dedup_components, dedup_components_sql

    def components_q(sf_dir: str):
        ds = dedup_components(
            _docs(sf_dir, ["doc_id", "text"]),
            _docs(sf_dir, ["doc_id"]),
        )
        return _cast(
            ds,
            {"doc_id": pa.int64(), "component": pa.int64(),
             "keep": pa.int32()},
        )

    queries["dedup_components"] = components_q
    oracles["dedup_components"] = dedup_components_sql()

    from ..extras.sketches import (
        bloom_anti_join,
        bloom_sql,
        cms_heavy_hitters,
        cms_sql,
    )

    def cms_q(sf_dir: str):
        ds = cms_heavy_hitters(_docs(sf_dir, ["source", "text"]))
        return _cast(
            ds,
            {"source": pa.string(), "token": pa.string(),
             "est_count": pa.int64(), "exact_count": pa.int64()},
        )

    queries["source_cms_counts"] = cms_q
    oracles["source_cms_counts"] = cms_sql()

    def bloom_q(sf_dir: str):
        ds = bloom_anti_join(_docs(sf_dir, ["doc_id", "text"]))
        return _cast(
            ds, {"doc_id": pa.int64(), "maybe_known": pa.int32()}
        )

    queries["doc_bloom_antijoin"] = bloom_q
    oracles["doc_bloom_antijoin"] = bloom_sql()

    return queries, oracles
