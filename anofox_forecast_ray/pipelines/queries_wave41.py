"""Wave-41 queries: Hill tail-index, near-dup graph degrees, and
exact-integer trend slopes.

- source_hill_tail: Hill estimator of the tail index over the k=25
  largest doc lengths per source — heavy-tail diagnosis for corpus
  length distributions. Top-k order statistics come exactly from the
  bounded (source, length) histogram; the log fold runs in descending
  value order with scalar math.log (ties contribute identical terms,
  so multiplicity expansion cannot reorder the sum).
- dedup_degree_histogram: degree distribution of the MinHash near-dup
  candidate graph — the shape a dedup campaign inspects before
  clustering. The pair set is bounded by the LSH cap; degrees and the
  histogram are exact integers.
- orders_priority_trend: OLS slope of monthly order counts per
  priority where slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is ONE f64
  division of exact int64 sums — regression as a bitwise-replayable
  monitoring op. Months are indexed from the global minimum month so
  x is small and every product stays well inside int64.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

HILL_K = 25


# ------------------------------------------------------- source_hill_tail
def _hill_query(k: int = HILL_K):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "v": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            g = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            ).group_by(["source", "v"]).aggregate([("v", "count")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("v_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "v"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        rows = {"source": [], "k": [], "x_k": [], "hill": []}
        for src, g in hp.groupby("source"):
            g = g.sort_values("v", ascending=False)
            v = g["v"].to_numpy(np.int64)
            c = g["cnt"].to_numpy(np.int64)
            # expand only the top k items
            top = []
            for vi, ci in zip(v, c):
                take = min(int(ci), k - len(top))
                top.extend([int(vi)] * take)
                if len(top) >= k:
                    break
            if len(top) < k or top[-1] <= 0:
                continue
            x_k = top[k - 1]  # the k-th largest
            h = 0.0  # descending-order fold over the top k-1
            for x in top[: k - 1]:
                h = h + (math.log(float(x)) - math.log(float(x_k)))
            hill = h / float(k - 1)
            rows["source"].append(str(src))
            rows["k"].append(k)
            rows["x_k"].append(x_k)
            rows["hill"].append(hill)
        return pa.table(
            {"source": pa.array(rows["source"], type=pa.string()),
             "k": pa.array(rows["k"], type=pa.int64()),
             "x_k": pa.array(rows["x_k"], type=pa.int64()),
             "hill": pa.array(rows["hill"], type=pa.float64())}
        )

    sql = f"""
    WITH r AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id)
                   AS rk
        FROM documents
    ),
    xk AS (
        SELECT source, v AS x_k FROM r WHERE rk = {k}
    ),
    terms AS (
        SELECT r.source, r.rk,
               ln(CAST(r.v AS DOUBLE)) - ln(CAST(x.x_k AS DOUBLE))
                   AS term
        FROM r JOIN xk x ON x.source = r.source
        WHERE r.rk < {k}
    )
    SELECT t.source, CAST({k} AS BIGINT) AS k,
           CAST(x.x_k AS BIGINT) AS x_k,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list(t.term ORDER BY t.rk)),
               (a, b) -> a + b) / CAST({k - 1} AS DOUBLE) AS hill
    FROM terms t JOIN xk x ON x.source = t.source
    WHERE x.x_k > 0
    GROUP BY t.source, x.x_k
    """
    return q, sql


# ------------------------------------------------- dedup_degree_histogram
def _degree_histogram_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import minhash_candidate_pairs

        docs = read_cols(sf_dir, "documents", ["doc_id", "text"])
        pairs = minhash_candidate_pairs(
            docs, threshold=0.5, max_bucket=None, shuffle_partitions=8
        ).to_pandas()  # bounded by the LSH cap
        ids = np.concatenate(
            (pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy())
        )
        u, deg = np.unique(ids, return_counts=True)
        dg, nd = np.unique(deg.astype(np.int64), return_counts=True)
        return pa.table(
            {"degree": pa.array(dg),
             "n_docs": pa.array(nd.astype(np.int64))}
        )

    from ..extras.dedup import minhash_pairs_sql

    base = minhash_pairs_sql(threshold=0.5)
    sql = f"""
    WITH pairs AS ({base}),
    ends AS (
        SELECT doc_a AS d FROM pairs
        UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
        SELECT d, CAST(count(*) AS BIGINT) AS degree FROM ends
        GROUP BY d
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """
    return q, sql


# --------------------------------------------------- orders_priority_trend
def _priority_trend_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "o_orderdate" not in t.column_names:
                return pa.table(
                    {"prio": pa.array([], type=pa.string()),
                     "month": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            # calendar month index: days since epoch -> (y, m) exact
            days = us // 86_400_000_000
            # month index via numpy datetime arithmetic (exact ints)
            d64 = days.astype("datetime64[D]")
            month = d64.astype("datetime64[M]").astype(np.int64)
            g = pa.table(
                {"prio": t.column("o_orderpriority"),
                 "month": pa.array(month)}
            ).group_by(["prio", "month"]).aggregate(
                [("month", "count")]
            )
            return pa.table(
                {"prio": g.column("prio"),
                 "month": g.column("month"),
                 "cnt": g.column("month_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["prio", "month"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"prio": g.column("prio"),
                 "month": g.column("month"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        m0 = int(a["month"].min())
        rows = {"prio": [], "n_months": [], "slope_num": [],
                "slope_den": [], "slope": []}
        for prio, g in a.groupby("prio"):
            g = g.sort_values("month")
            x = g["month"].to_numpy(np.int64) - m0
            y = g["cnt"].to_numpy(np.int64)
            n = int(x.size)
            sx = int(x.sum())
            sy = int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            rows["prio"].append(str(prio))
            rows["n_months"].append(n)
            rows["slope_num"].append(num)
            rows["slope_den"].append(den)
            rows["slope"].append(
                float(np.float64(num) / np.float64(den))
                if den else 0.0
            )
        return pa.table(
            {"prio": pa.array(rows["prio"], type=pa.string()),
             "n_months": pa.array(rows["n_months"],
                                  type=pa.int64()),
             "slope_num": pa.array(rows["slope_num"],
                                   type=pa.int64()),
             "slope_den": pa.array(rows["slope_den"],
                                   type=pa.int64()),
             "slope": pa.array(rows["slope"], type=pa.float64())}
        )

    sql = """
    WITH m AS (
        SELECT o_orderpriority AS prio,
               (date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate) - 1) AS mi,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    m0 AS (SELECT min(mi) AS m0 FROM m),
    c AS (
        SELECT prio, CAST(mi - m0.m0 AS BIGINT) AS x, cnt AS y
        FROM m, m0
    ),
    g AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM c GROUP BY prio
    )
    SELECT prio, n AS n_months,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope
    FROM g
    """
    return q, sql


def build_wave41_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_hill_tail",) + _hill_query(HILL_K)))
    add(*(("dedup_degree_histogram",) + _degree_histogram_query()))
    add(*(("orders_priority_trend",) + _priority_trend_query()))
    return queries, oracles
