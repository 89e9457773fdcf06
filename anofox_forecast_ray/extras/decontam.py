"""Benchmark decontamination: flag training docs sharing any char
k-shingle with a held-out benchmark set.

Standard LLM-corpus hygiene (the reference engine has no counterpart;
this is part of the training-data-ops surface): the benchmark here is a
deterministic slice of the corpus itself (doc_id % 97 == 0) so the whole
operation is oracle-replayable.

Scale shape:
  - the benchmark shingle set is built with per-block distinct partials
    and reduced once — benchmarks are small by nature (test sets, not
    corpora), so collecting the distinct hash set to the driver and
    broadcasting it with ``ray.put`` is the right pattern (same as the
    ANN query matrix, extras/ann.py);
  - the scan over the 100-TB side is one stateless ``map_batches`` with
    a vectorized ``np.isin`` against the broadcast sorted array — no
    shuffle, no join.

Oracle-exactness: shingle ids reuse the rolling polynomial mod 2^64
from extras/dedup.py, which DuckDB replays HUGEINT-exact — membership
is on identical integers, not on strings, so there is no collision
caveat between engine and oracle (both sides see the same ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _BASE, _M64, _SQL_TOK, _char_shingle_hashes

K = 16           # chars per shingle (~3 words of this corpus)
BENCH_MOD = 97   # doc_id % BENCH_MOD == 0 -> benchmark member


def _bench_shingles_batch(t: pa.Table) -> pa.Table:
    """Distinct shingle hashes of the benchmark docs in this block."""
    hs = [
        _char_shingle_hashes(txt or "", K)
        for txt in t.column("text").to_pylist()
    ]
    flat = (
        np.unique(np.concatenate(hs)) if hs else np.zeros(0, np.uint64)
    )
    return pa.table({"h": pa.array(flat, type=pa.uint64())})


def _merge_distinct(t: pa.Table) -> pa.Table:
    h = np.unique(t.column("h").to_numpy(zero_copy_only=False))
    return pa.table({"h": pa.array(h, type=pa.uint64())})


class DecontamScanStage:
    """Actor stage: benchmark hash set fetched once per actor."""

    def __init__(self, bench_ref):
        import ray

        self.bench = ray.get(bench_ref)  # sorted uint64

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_n, out_hits = [], [], []
        for did, txt in zip(ids, t.column("text").to_pylist()):
            if int(did) % BENCH_MOD == 0:
                continue  # benchmark members are not scanned
            hs = _char_shingle_hashes(txt or "", K)
            out_id.append(int(did))
            out_n.append(hs.size)
            out_hits.append(
                int(np.isin(hs, self.bench, assume_unique=True).sum())
            )
        hits = np.asarray(out_hits, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_shingles": pa.array(out_n, type=pa.int64()),
                "n_hits": pa.array(hits, type=pa.int64()),
                "contaminated": pa.array(
                    (hits > 0).astype(np.int32), type=pa.int32()
                ),
            }
        )


def decontaminate(docs_ds_factory):
    """docs_ds_factory: zero-arg callable -> Dataset(doc_id,text); called
    once for the benchmark pass and once for the scan (each streams)."""
    import ray

    from ..stages.source_rollup import tree_reduce_tables

    def bench_filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % BENCH_MOD == 0))

    bench_partials = (
        docs_ds_factory()
        .map_batches(bench_filter, batch_format="pyarrow")
        .map_batches(_bench_shingles_batch, batch_format="pyarrow")
    )
    refs = list(bench_partials.to_arrow_refs())
    bench_t = (
        tree_reduce_tables(refs, _merge_distinct)
        if refs
        else pa.table({"h": pa.array([], type=pa.uint64())})
    )
    bench = np.sort(
        bench_t.column("h").to_numpy(zero_copy_only=False)
    )
    bench_ref = ray.put(bench)
    return docs_ds_factory().map_batches(
        DecontamScanStage,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    )


def _shingle_sql_modstep(k: int) -> str:
    """Like extras/dedup._shingle_sql but reduces mod 2^64 after EVERY
    multiply-add step: at k=16 the unreduced polynomial overflows INT128
    (base^15 ~ 2^300); with per-step reduction each intermediate stays
    below 2^64 * base < 2^84. uint64 wraparound on the engine side is
    the same per-step mod, so the ids are identical."""
    leads = ", ".join(
        f"lead(token, {j}) OVER w AS c{j}" for j in range(1, k)
    )
    poly = "c0"
    for j in range(1, k):
        poly = f"(({poly} * {_BASE} + c{j}) % {_M64})"
    return f"""
    tok AS ({_SQL_TOK}),
    win AS (
        SELECT doc_id, CAST(token AS HUGEINT) AS c0, {leads}
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (
        SELECT DISTINCT doc_id, CAST({poly} AS UBIGINT) AS h
        FROM win WHERE c{k - 1} IS NOT NULL
    )"""


def decontaminate_sql() -> str:
    """DuckDB replay: identical shingle polynomial (HUGEINT-exact), set
    membership by integer anti-/semi-join."""
    return f"""
    WITH {_shingle_sql_modstep(K)},
    ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   doc_id AS did FROM documents),
    sh2 AS (
        SELECT s.doc_id, s.h, i.did
        FROM sh s JOIN ids i ON i.doc_id = s.doc_id
    ),
    bench AS (
        SELECT DISTINCT h FROM sh2 WHERE did % {BENCH_MOD} = 0
    ),
    train AS (SELECT * FROM sh2 WHERE did % {BENCH_MOD} <> 0),
    agg AS (
        SELECT did AS doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM train LEFT JOIN bench b USING (h)
        GROUP BY did
    ),
    short AS (
        -- docs shorter than K chars have zero shingles and appear in no
        -- sh row; they are still scanned (0 shingles, clean)
        SELECT did AS doc_id, CAST(0 AS BIGINT) AS n_shingles,
               CAST(0 AS BIGINT) AS n_hits
        FROM ids
        WHERE did % {BENCH_MOD} <> 0
          AND CAST(did AS VARCHAR) NOT IN (SELECT doc_id FROM sh2)
    )
    SELECT doc_id, n_shingles, n_hits,
           CAST(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS contaminated
    FROM (SELECT * FROM agg UNION ALL SELECT * FROM short)
    """
