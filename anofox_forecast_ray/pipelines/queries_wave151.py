"""Wave-151 queries: skyline operator, exact phrase search.

- part_skyline: the classic SKYLINE (Pareto-front) database
  operator — parts not dominated on (retail cents low, size low).
  The distributed shape is textbook: each block computes its LOCAL
  skyline with a sort + running-min sweep (dominance pruning), and
  the tree reduce re-applies the SAME kernel to the union — the
  skyline of a union of local skylines is the global skyline.
  Equal points never dominate each other (strictness), so
  duplicates survive together; all-integer comparisons.
- doc_phrase_count: exact-phrase search ("table scan") over the
  space-separated word stream — adjacency of word positions, the
  positional-inverted-index primitive. Docs are whole rows so the
  per-block counts are complete; only two integers per block move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

PHRASE_A = "table"
PHRASE_B = "scan"


# --------------------------------------------------------------- part_skyline
def local_skyline(cents, size, keys):
    order = np.lexsort((size, cents))
    cents, size, keys = (cents[order], size[order],
                         keys[order])
    out_c, out_s, out_k = [], [], []
    best = None
    i = 0
    n = len(cents)
    while i < n:
        j = i
        while j < n and cents[j] == cents[i]:
            j += 1
        gmin = int(size[i:j].min())
        if best is None or gmin < best:
            for t in range(i, j):
                if int(size[t]) == gmin:
                    out_c.append(int(cents[t]))
                    out_s.append(int(size[t]))
                    out_k.append(int(keys[t]))
            best = gmin if best is None \
                else min(best, gmin)
        i = j
    return (np.array(out_c, dtype=np.int64),
            np.array(out_s, dtype=np.int64),
            np.array(out_k, dtype=np.int64))

def _skyline_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "pkey": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
                "size": pa.array([], type=pa.int64()),
            })
            if "p_partkey" not in t.column_names:
                return empty
            keys = t.column("p_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("p_retailprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            size = t.column("p_size").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            c, s, k = local_skyline(cents, size, keys)
            return pa.table({
                "pkey": pa.array(k),
                "cents": pa.array(c),
                "size": pa.array(s),
            })

        def merge(t: pa.Table) -> pa.Table:
            c, s, k = local_skyline(
                t.column("cents").to_numpy(
                    zero_copy_only=False),
                t.column("size").to_numpy(
                    zero_copy_only=False),
                t.column("pkey").to_numpy(
                    zero_copy_only=False))
            return pa.table({
                "pkey": pa.array(k),
                "cents": pa.array(c),
                "size": pa.array(s),
            })

        refs = list(
            read_cols(sf_dir, "part", ["p_partkey", "p_retailprice",
                         "p_size"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        sky = tree_reduce_tables(refs, merge).to_pandas()
        sky = sky.sort_values(["cents", "size", "pkey"]).\
            reset_index(drop=True)
        return pa.table({
            "p_partkey": pa.array(
                sky["pkey"].to_numpy(np.int64)),
            "retail_cents": pa.array(
                sky["cents"].to_numpy(np.int64)),
            "p_size": pa.array(
                sky["size"].to_numpy(np.int64)),
        })

    sql = """
    WITH p AS (
        SELECT p_partkey,
               CAST(round_even(p_retailprice * 100, 0)
                    AS BIGINT) AS cents,
               CAST(p_size AS BIGINT) AS size
        FROM part
    )
    SELECT a.p_partkey AS p_partkey,
           a.cents AS retail_cents,
           a.size AS p_size
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.cents <= a.cents AND b.size <= a.size
          AND (b.cents < a.cents OR b.size < a.size)
    )
    ORDER BY 2, 3, 1
    """
    return q, sql


# ----------------------------------------------------------- doc_phrase_count
def _phrase_query(wa: str = PHRASE_A, wb: str = PHRASE_B):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "docs": pa.array([], type=pa.int64()),
                "occ": pa.array([], type=pa.int64()),
            })
            if "text" not in t.column_names or t.num_rows == 0:
                return empty
            docs = 0
            occ = 0
            for txt in t.column("text").to_pylist():
                words = txt.split(" ")
                c = 0
                for i in range(len(words) - 1):
                    if words[i] == wa and words[i + 1] == wb:
                        c += 1
                if c:
                    docs += 1
                    occ += c
            return pa.table({
                "docs": pa.array([docs], type=pa.int64()),
                "occ": pa.array([occ], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "docs": pa.array(
                    [pc.sum(t.column("docs")).as_py()],
                    type=pa.int64()),
                "occ": pa.array(
                    [pc.sum(t.column("occ")).as_py()],
                    type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        return pa.table({
            "docs_with_phrase": pa.array(
                [int(a["docs"].iloc[0])], type=pa.int64()),
            "occurrences": pa.array(
                [int(a["occ"].iloc[0])], type=pa.int64()),
        })

    sql = f"""
    WITH w AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1)
                   AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    hits AS (
        SELECT a.doc_id, CAST(count(*) AS BIGINT) AS c
        FROM w a JOIN w b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.word = '{wa}' AND b.word = '{wb}'
        GROUP BY a.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS docs_with_phrase,
           CAST(COALESCE(sum(c), 0) AS BIGINT) AS occurrences
    FROM hits
    """
    return q, sql


def build_wave151_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("part_skyline",) + _skyline_query()))
    add(*(("doc_phrase_count",) + _phrase_query()))
    return queries, oracles
