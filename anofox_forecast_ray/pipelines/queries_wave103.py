"""Wave-103 queries: customer lifespan and within-doc drift.

- orders_customer_lifespan: days between a customer's first and last
  order — median and P90 from the bounded day-span histogram (LOWER
  nearest rank; repeat customers only).
- doc_half_jsd: Jensen-Shannon divergence between the token
  distributions of each doc's first and second half — the within-doc
  topic-drift score (high = the doc changes subject or glues
  unrelated content; a boilerplate/concatenation detector). Terms
  fold in ascending token order with scalar logs on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------- orders_customer_lifespan
def _lifespan_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "o_custkey" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "custkey": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                })
            ck = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = (t.column("o_orderdate").cast(pa.int64())
                   .to_numpy(zero_copy_only=False)
                   // 86_400_000_000)
            uk, inv = np.unique(ck, return_inverse=True)
            lo = np.full(uk.size, np.iinfo(np.int64).max)
            hi = np.full(uk.size, np.iinfo(np.int64).min)
            np.minimum.at(lo, inv, day)
            np.maximum.at(hi, inv, day)
            return pa.table({
                "custkey": pa.array(uk),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
                "n": pa.array(np.bincount(
                    inv, minlength=uk.size).astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("custkey").aggregate(
                [("lo", "min"), ("hi", "max"), ("n", "sum")])
            return pa.table({
                "custkey": g.column("custkey").cast(pa.int64()),
                "lo": g.column("lo_min").cast(pa.int64()),
                "hi": g.column("hi_max").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["n"] >= 2]
        span = (a["hi"] - a["lo"]).to_numpy(np.int64)
        span = np.sort(span)
        n = span.size

        def rank_stat(q100):
            return int(span[(n - 1) * q100 // 100])

        return pa.table({
            "n_repeat_customers": pa.array([n], type=pa.int64()),
            "median_days": pa.array([rank_stat(50)],
                                    type=pa.int64()),
            "p90_days": pa.array([rank_stat(90)],
                                 type=pa.int64()),
        })

    sql = """
    WITH u AS (
        SELECT o_custkey,
               max(epoch_us(o_orderdate) // 86400000000)
               - min(epoch_us(o_orderdate) // 86400000000)
                   AS span,
               count(*) AS n
        FROM orders GROUP BY o_custkey HAVING count(*) >= 2
    ),
    r AS (
        SELECT span,
               row_number() OVER (ORDER BY span) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM u
    )
    SELECT CAST(max(n) AS BIGINT) AS n_repeat_customers,
           CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                    THEN span END) AS BIGINT) AS median_days,
           CAST(max(CASE WHEN rn = (n - 1) * 90 // 100 + 1
                    THEN span END) AS BIGINT) AS p90_days
    FROM r
    """
    return q, sql


# -------------------------------------------------------------- doc_half_jsd
def _half_jsd_query():
    def q(sf_dir: str):
        def jsd(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "jsd": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= 2
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            out = []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]]
                h = seg.size // 2
                a, b = seg[:h], seg[h:]
                ua, ca = np.unique(a, return_counts=True)
                ub, cb = np.unique(b, return_counts=True)
                da = dict(zip(ua.tolist(), ca.tolist()))
                db = dict(zip(ub.tolist(), cb.tolist()))
                n1, n2 = float(a.size), float(b.size)
                j = 0.0
                for tok in sorted(set(da) | set(db)):
                    p = float(da.get(tok, 0)) / n1
                    qq = float(db.get(tok, 0)) / n2
                    mm = 0.5 * (p + qq)
                    term = 0.0
                    if p > 0:
                        term = term + 0.5 * (p * math.log(p / mm))
                    if qq > 0:
                        term = term + 0.5 * (qq * math.log(
                            qq / mm))
                    j = j + term
                out.append(j)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(lens[keep], type=pa.int64()),
                "jsd": pa.array(out, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            jsd, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "jsd": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id HAVING count(*) >= 2
    ),
    lab AS (
        SELECT t.doc_id, t.token,
               CASE WHEN t.pos < tl.n // 2 THEN 1 ELSE 2 END
                   AS half
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
    ),
    c AS (
        SELECT doc_id, token, half,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lab GROUP BY doc_id, token, half
    ),
    piv AS (
        SELECT doc_id, token,
               CAST(COALESCE(sum(CASE WHEN half = 1
                             THEN cnt END), 0) AS BIGINT) AS c1,
               CAST(COALESCE(sum(CASE WHEN half = 2
                             THEN cnt END), 0) AS BIGINT) AS c2
        FROM c GROUP BY doc_id, token
    ),
    nn AS (
        SELECT doc_id,
               CAST(sum(c1) AS DOUBLE) AS n1,
               CAST(sum(c2) AS DOUBLE) AS n2
        FROM piv GROUP BY doc_id
    ),
    terms AS (
        SELECT p.doc_id, p.token,
               (CASE WHEN p.c1 > 0
                     THEN 0.5e0 * ((CAST(p.c1 AS DOUBLE) / nn.n1)
                          * ln((CAST(p.c1 AS DOUBLE) / nn.n1)
                               / (0.5e0
                                  * (CAST(p.c1 AS DOUBLE) / nn.n1
                                     + CAST(p.c2 AS DOUBLE)
                                       / nn.n2))))
                     ELSE 0.0e0 END)
               + (CASE WHEN p.c2 > 0
                     THEN 0.5e0 * ((CAST(p.c2 AS DOUBLE) / nn.n2)
                          * ln((CAST(p.c2 AS DOUBLE) / nn.n2)
                               / (0.5e0
                                  * (CAST(p.c1 AS DOUBLE) / nn.n1
                                     + CAST(p.c2 AS DOUBLE)
                                       / nn.n2))))
                     ELSE 0.0e0 END) AS term
        FROM piv p JOIN nn ON nn.doc_id = p.doc_id
    )
    SELECT t.doc_id, tl.n AS n_tok,
           list_reduce(list_prepend(0.0e0,
               list(t.term ORDER BY t.token)), (a, b) -> a + b)
               AS jsd
    FROM terms t JOIN tl ON tl.doc_id = t.doc_id
    GROUP BY t.doc_id, tl.n
    """
    return q, sql


def build_wave103_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_customer_lifespan",) + _lifespan_query()))
    add(*(("doc_half_jsd",) + _half_jsd_query()))
    return queries, oracles
