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


def _bpe_encode_stats_query(k: int = 6):
    """Tokenizer APPLICATION at corpus scale: train the k-merge BPE
    (distributed trainer, golden-checked elsewhere), apply the rules to
    every doc, and report per-source fertility — tokens before/after and
    the compression ratio. The aggregate is bounded (source, ints)
    partials tree-reduced; token rows never shuffle. Golden oracle:
    the sequential reference BPE aggregated the same way."""

    def q(sf_dir: str):
        import numpy as np
        import ray.data as rd

        from ..extras.bpe import train_bpe
        from ..stages.source_rollup import tree_reduce_tables
        from .queries import corpus_ds

        def partial(t: pa.Table) -> pa.Table:
            src = t.column("source")
            n = t.column("n_tok").cast(pa.int64())
            g = pa.table({"source": src, "n": n}).group_by("source")
            agg = g.aggregate([("n", "sum"), ("n", "count")])
            return pa.table(
                {
                    "source": agg.column("source"),
                    "toks": agg.column("n_sum"),
                    "docs": agg.column("n_count"),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("toks", "sum"), ("docs", "sum")]
            )
            return pa.table(
                {
                    "source": g.column("source"),
                    "toks": g.column("toks_sum"),
                    "docs": g.column("docs_sum"),
                }
            )

        ds = corpus_ds(sf_dir)
        _, encoded = train_bpe(ds, k=k)
        before = tree_reduce_tables(
            list(ds.map_batches(partial, batch_format="pyarrow")
                 .to_arrow_refs()),
            merge,
        )
        after = tree_reduce_tables(
            list(encoded.map_batches(partial, batch_format="pyarrow")
                 .to_arrow_refs()),
            merge,
        )
        bd = {s: (int(t), int(d)) for s, t, d in zip(
            before.column("source").to_pylist(),
            before.column("toks").to_pylist(),
            before.column("docs").to_pylist())}
        ad = {s: int(t) for s, t in zip(
            after.column("source").to_pylist(),
            after.column("toks").to_pylist())}
        srcs = sorted(bd)
        tb = np.array([bd[s][0] for s in srcs], dtype=np.int64)
        ta = np.array([ad[s] for s in srcs], dtype=np.int64)
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(srcs, type=pa.string()),
                    "n_docs": pa.array(
                        [bd[s][1] for s in srcs], type=pa.int64()
                    ),
                    "tokens_before": pa.array(tb),
                    "tokens_after": pa.array(ta),
                    "ratio": pa.array(
                        tb.astype(np.float64) / ta.astype(np.float64)
                    ),
                }
            )
        )

    return (q,)


def build_wave22_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("streaming_online_dedup",) + _online_dedup_query()))
    add(*(("bpe_encode_stats_k6",) + _bpe_encode_stats_query(6)))
    return queries, oracles
