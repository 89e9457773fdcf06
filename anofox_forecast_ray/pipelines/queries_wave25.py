"""Wave-25 queries: weighted corpus subsampling and inverted-index
statistics.

- source_weighted_sample: Efraimidis-Spirakis (A-ES) weighted sampling
  WITHOUT replacement — per source, the k docs with the largest
  ln(u)/w keys where u is a deterministic sha256-derived uniform and
  w = n_chars (longer docs proportionally likelier). Deterministic
  under resharding/retries like the repo's other hash draws; only
  (source, id, weight) rows move. The emitted columns are integers, so
  the oracle comparison never hashes the float keys themselves — only
  the SELECTION must agree (a sub-ULP ln() divergence flipping an
  order is ~2^-50 per pair; the oracle would catch it as a mismatch,
  not hide it).
- token_postings_stats: inverted-index build statistics — per token
  type, document frequency and the sum/min/max of the sorted postings
  list. Per-block (token, doc) dedup BEFORE the shuffle (the
  hourly-distinct-users discipline): shuffle volume is distinct pairs,
  never token occurrences.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

_U_DEN = float(1 << 60)


def _weighted_sample_query(k: int = 8):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def project(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            w = t.column("n_chars").to_numpy(zero_copy_only=False)
            h = np.fromiter(
                (int(hashlib.sha256(str(d).encode()).hexdigest()[:15], 16)
                 for d in ids),
                dtype=np.int64, count=len(ids),
            )
            u = (h + 1).astype(np.float64) / _U_DEN
            key = np.log(u) / w.astype(np.float64)
            return pa.table(
                {
                    "source": t.column("source"),
                    "doc_id": pa.array(
                        np.asarray([int(d) for d in ids], dtype=np.int64)
                    ),
                    "w": pa.array(w.astype(np.int64)),
                    "key": pa.array(key, type=pa.float64()),
                }
            )

        def pick(g: pa.Table) -> pa.Table:
            g = g.sort_by([("key", "descending"),
                           ("doc_id", "ascending")]).slice(0, k)
            return g.select(["source", "doc_id", "w"])

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "source", "n_chars"])
            .map_batches(project, batch_format="pyarrow")
            .groupby("source")
            .map_groups(pick, batch_format="pyarrow")
        )
        from .queries import _cast

        return _cast(
            ds,
            {"source": pa.string(), "doc_id": pa.int64(),
             "w": pa.int64()},
        )

    sql = f"""
    WITH d AS (
        SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS w,
               ln((CAST(concat('0x',
                        substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) + 1) / {_U_DEN!r})
                 / CAST(n_chars AS DOUBLE) AS key
        FROM documents
    )
    SELECT source, doc_id, w FROM (
        SELECT source, doc_id, w,
               row_number() OVER (PARTITION BY source
                                  ORDER BY key DESC, doc_id) AS rn
        FROM d
    ) WHERE rn <= {k}
    """
    return q, sql


def _postings_stats_query():
    def q(sf_dir: str):
        import pandas as pd

        from ..stages.rollup import _flat_tokens

        def pairs(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return pa.table(
                    {"token": pa.array([], type=pa.int64()),
                     "doc": pa.array([], type=pa.int64())}
                )
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths
            )
            key = (ids[row_idx] << 21) | values.astype(np.int64)
            uk = np.unique(key)  # per-block pair dedup BEFORE the shuffle
            return pa.table(
                {
                    "token": pa.array(uk & ((1 << 21) - 1)),
                    "doc": pa.array(uk >> 21),
                }
            )

        def stats(g: pa.Table) -> pa.Table:
            docs = np.unique(
                g.column("doc").to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    "token": pa.array(
                        [int(g.column("token")[0].as_py())],
                        type=pa.int64(),
                    ),
                    "df": pa.array([docs.size], type=pa.int64()),
                    "sum_docs": pa.array([int(docs.sum())],
                                         type=pa.int64()),
                    "min_doc": pa.array([int(docs[0])],
                                        type=pa.int64()),
                    "max_doc": pa.array([int(docs[-1])],
                                        type=pa.int64()),
                }
            )

        ds = (
            corpus_ds(sf_dir)
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("token")
            .map_groups(stats, batch_format="pyarrow")
        )
        from .queries import _cast

        return _cast(
            ds,
            {"token": pa.int64(), "df": pa.int64(),
             "sum_docs": pa.int64(), "min_doc": pa.int64(),
             "max_doc": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    p AS (SELECT DISTINCT token, CAST(doc_id AS BIGINT) AS doc FROM tok)
    SELECT CAST(token AS BIGINT) AS token,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(doc) AS BIGINT) AS sum_docs,
           CAST(min(doc) AS BIGINT) AS min_doc,
           CAST(max(doc) AS BIGINT) AS max_doc
    FROM p GROUP BY token
    """
    return q, sql


def build_wave25_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_weighted_sample",) + _weighted_sample_query(8)))
    add(*(("token_postings_stats",) + _postings_stats_query()))
    return queries, oracles
