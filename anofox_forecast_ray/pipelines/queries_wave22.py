"""Wave-22 queries: online/streaming corpus-maintenance ops.

- streaming_online_dedup: query-before-insert LSH dedup over an ordered
  doc stream (dup iff an EARLIER doc collides in >=1 band and verifies
  at signature-Jaccard >= 0.5; dup_of = the earliest such doc). The
  batch formulation shuffles only band rows; `extras.dedup.
  OnlineLSHIndex` is the literal one-doc-at-a-time index and is
  pytest-asserted bitwise-equal to it.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks


def _online_dedup_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_online_dedup

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            override_num_blocks=_num_read_blocks(),
        )
        return _cast(
            minhash_online_dedup(docs),
            {"doc_id": pa.int64(), "dup_of": pa.int64()},
        )

    from ..extras.dedup import minhash_online_dedup_sql

    return q, minhash_online_dedup_sql()


def build_wave22_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("streaming_online_dedup",) + _online_dedup_query()))
    return queries, oracles
