"""Nineteenth query wave: data-selection operators from the modern
pretraining playbook — DSIR importance weights (target-vs-source LM
log-ratio, Xie et al. 2023), CCNet-style perplexity terciles
(head/middle/tail buckets via EXACT distributed float order
statistics — no global sort), and the cross-source near-duplicate
matrix (which dumps contaminate which, from the MinHash pair stream
joined back to sources with the bucketed equi-join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks, corpus_ds

DSIR_TARGET = "src0"


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


# ------------------------------------------------------------------ DSIR
def _dsir_query():
    def q(sf_dir: str):
        from ..extras.lm import dsir_importance

        ds = dsir_importance(lambda: corpus_ds(sf_dir), DSIR_TARGET)
        return _cast(
            ds,
            {"doc_id": pa.string(), "n_bigrams": pa.int64(),
             "logw": pa.float64()},
        )

    from ..extras.lm import dsir_importance_sql

    return q, dsir_importance_sql(DSIR_TARGET)


# -------------------------------------------------------- CCNet buckets
def _ppl_buckets_query():
    """Perplexity terciles: thresholds are the exact mean_logprob order
    statistics at ranks n//3 and 2n//3 (0-based ascending), found by the
    bucketed-count selection over order-preserving float keys — the
    100 TB-safe replacement for `ORDER BY score` + ntile. Output is the
    bounded (source, bucket) matrix."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.quantile import (
            exact_order_stats,
            float_order_keys,
            keys_to_float,
        )
        from ..stages.source_rollup import tree_reduce_tables
        from ..extras.lm import bigram_perplexity

        scored = bigram_perplexity(corpus_ds(sf_dir)).materialize()
        n = scored.count()
        i1, i2 = n // 3, (2 * n) // 3

        def keys_ds():
            def fn(t: pa.Table) -> pa.Table:
                m = t.column("mean_logprob").to_numpy(zero_copy_only=False)
                return pa.table(
                    {"key": pa.array(float_order_keys(m), type=pa.int64())}
                )

            return scored.map_batches(fn, batch_format="pyarrow")

        st = exact_order_stats(keys_ds, [i1, i2])
        t1 = float(keys_to_float(np.asarray([st[i1]], dtype=np.int64))[0])
        t2 = float(keys_to_float(np.asarray([st[i2]], dtype=np.int64))[0])

        def partial(t: pa.Table) -> pa.Table:
            m = t.column("mean_logprob").to_numpy(zero_copy_only=False)
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            bucket = np.where(
                m < t1, "tail", np.where(m < t2, "mid", "head")
            ).astype(object)
            key = np.asarray(
                [f"{s}\x00{b}" for s, b in zip(src, bucket)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = (
                np.add.reduceat(np.ones(m.size, np.int64), start)
                .astype(np.int64)
                if m.size
                else np.zeros(0, np.int64)
            )
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "bucket": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_docs": pa.array(cnt, type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            s = np.asarray(t.column("source").to_pylist(), dtype=object)
            b = np.asarray(t.column("bucket").to_pylist(), dtype=object)
            c = t.column("n_docs").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [a + "\x00" + x for a, x in zip(s, b)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "source": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "bucket": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_docs": pa.array(
                        np.add.reduceat(c[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        refs = list(
            scored.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        return rd.from_arrow(tree_reduce_tables(refs, merge))

    from ..extras.lm import bigram_perplexity_sql

    sql = f"""
    WITH s AS (
        SELECT q.doc_id, d.source, q.mean_logprob
        FROM ({bigram_perplexity_sql()}) q
        JOIN documents d ON q.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    ranked AS (
        SELECT mean_logprob AS m,
               row_number() OVER (ORDER BY mean_logprob) AS rn
        FROM s
    ),
    th AS (
        SELECT
            max(CASE WHEN rn = (SELECT n // 3 FROM nn) + 1
                     THEN m END) AS t1,
            max(CASE WHEN rn = (SELECT 2 * n // 3 FROM nn) + 1
                     THEN m END) AS t2
        FROM ranked
    )
    SELECT s.source,
           CASE WHEN s.mean_logprob < th.t1 THEN 'tail'
                WHEN s.mean_logprob < th.t2 THEN 'mid'
                ELSE 'head' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM s CROSS JOIN th
    GROUP BY s.source, bucket
    """
    return q, sql


# ------------------------------------------------- cross-source dups
def _cross_source_query():
    """Which sources near-duplicate each other: MinHash candidate pairs
    (doc ids + hashes only — text never reshuffles) joined back to the
    doc->source map with the bucketed equi-join (both sides large), then
    a bounded (src_lo, src_hi) count matrix."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_candidate_pairs
        from ..stages.join import bucketed_equi_join
        from ..stages.source_rollup import tree_reduce_tables

        pairs = minhash_candidate_pairs(
            _docs(sf_dir, ["doc_id", "text"]), threshold=0.5,
            max_bucket=None, shuffle_partitions=8,
        )

        def p_prep(t: pa.Table) -> pa.Table:
            a = np.asarray(
                [int(x) for x in t.column("doc_a").to_pylist()],
                dtype=np.int64,
            )
            b = np.asarray(
                [int(x) for x in t.column("doc_b").to_pylist()],
                dtype=np.int64,
            )
            return pa.table(
                {"key": pa.array(a, type=pa.int64()),
                 "doc_b": pa.array(b, type=pa.int64())}
            )

        def d_prep(name):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"key": t.column("doc_id").cast(pa.int64()),
                     name: t.column("source").cast(pa.string())}
                )

            return fn

        j1 = bucketed_equi_join(
            pairs.map_batches(p_prep, batch_format="pyarrow"),
            _docs(sf_dir, ["doc_id", "source"]).map_batches(
                d_prep("src_a"), batch_format="pyarrow"
            ),
            "key",
        )

        def rekey(t: pa.Table) -> pa.Table:
            return pa.table(
                {"key": t.column("doc_b").cast(pa.int64()),
                 "src_a": t.column("src_a").cast(pa.string())}
            )

        j2 = bucketed_equi_join(
            j1.map_batches(rekey, batch_format="pyarrow"),
            _docs(sf_dir, ["doc_id", "source"]).map_batches(
                d_prep("src_b"), batch_format="pyarrow"
            ),
            "key",
        )

        def partial(t: pa.Table) -> pa.Table:
            a = np.asarray(t.column("src_a").to_pylist(), dtype=object)
            b = np.asarray(t.column("src_b").to_pylist(), dtype=object)
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            key = np.asarray(
                [x + "\x00" + y for x, y in zip(lo, hi)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            cnt = (
                np.add.reduceat(np.ones(a.size, np.int64), start)
                .astype(np.int64)
                if a.size
                else np.zeros(0, np.int64)
            )
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "src_lo": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "src_hi": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_pairs": pa.array(cnt, type=pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            a = np.asarray(t.column("src_lo").to_pylist(), dtype=object)
            b = np.asarray(t.column("src_hi").to_pylist(), dtype=object)
            c = t.column("n_pairs").to_numpy(zero_copy_only=False)
            key = np.asarray(
                [x + "\x00" + y for x, y in zip(a, b)], dtype=object
            )
            order = np.argsort(key, kind="stable")
            uk, start = np.unique(key[order], return_index=True)
            parts = [k.split("\x00", 1) for k in uk]
            return pa.table(
                {
                    "src_lo": pa.array(
                        [x[0] for x in parts], type=pa.string()
                    ),
                    "src_hi": pa.array(
                        [x[1] for x in parts], type=pa.string()
                    ),
                    "n_pairs": pa.array(
                        np.add.reduceat(c[order], start).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        refs = list(
            j2.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        return rd.from_arrow(tree_reduce_tables(refs, merge))

    from ..extras.dedup import minhash_pairs_sql

    sql = f"""
    WITH j AS (
        SELECT least(da.source, db.source) AS src_lo,
               greatest(da.source, db.source) AS src_hi
        FROM ({minhash_pairs_sql(threshold=0.5)}) p
        JOIN documents da ON CAST(da.doc_id AS VARCHAR) = p.doc_a
        JOIN documents db ON CAST(db.doc_id AS VARCHAR) = p.doc_b
    )
    SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY src_lo, src_hi
    """
    return q, sql


def build_wave19_queries():
    queries, oracles = {}, {}

    def add(name, q, sql):
        queries[name] = q
        oracles[name] = sql

    add(*((f"dsir_importance_{DSIR_TARGET}",) + _dsir_query()))
    add(*(("doc_ppl_buckets",) + _ppl_buckets_query()))
    add(*(("dedup_cross_source_matrix",) + _cross_source_query()))
    return queries, oracles
