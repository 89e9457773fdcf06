"""Wave-251 queries: revenue-curve knee and Hill diversity profile.

customer_revenue_knee: the Kneedle-style knee of the cumulative
revenue-share curve — customers ranked by exact integer cents
(revenue desc, key asc), the knee is the rank maximizing the gap
between the curve and the diagonal.  The argmax is a PURE INTEGER
comparison, gap_k·(n·tot) = cum_k·n − k·tot, ties broken at the
smallest rank, so the selected knee is bitwise deterministic; only
the two reported fractions divide.

source_hill_numbers: the Hill diversity profile (q = 0, 1, 2) of
each source's token distribution — q0 = richness, q1 = exp(Shannon),
q2 = inverse Simpson = N²/Σc².  The Shannon entropy is a SEQUENTIAL
left fold of −p·ln p in token order (the list_reduce discipline —
numpy pairwise sums would not bit-match), Σc² is exact integer.
Hill numbers are the effective-species scale for the existing
simpson/renyi2/chao1 diversity rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def knee_from_sorted(cents):
    """(k, frac, share, gap) — cents sorted desc; integer argmax."""
    n = len(cents)
    tot = sum(cents)
    best = None
    cum = 0
    for k, c in enumerate(cents, start=1):
        cum += c
        g = cum * n - k * tot
        if best is None or g > best[0]:
            best = (g, k, cum)
    g, k, cum = best
    return (k, float(k) / float(n), float(cum) / float(tot),
            float(g) / (float(n) * float(tot)))


def hill_numbers(counts):
    """(q0, q1, q2) from per-token counts in ascending token order."""
    n = sum(counts)
    q0 = len(counts)
    h = 0.0
    for c in counts:
        p = float(c) / float(n)
        h = h + (-(p * math.log(p)))
    q1 = math.exp(h)
    sq = sum(c * c for c in counts)
    q2 = float(n) * float(n) / float(sq)
    return q0, q1, q2


# ------------------------------------------- customer_revenue_knee
def _knee_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(ckey, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "ckey": pa.array(uk),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("ckey").aggregate([("cents", "sum")])
            return pa.table({
                "ckey": g.column("ckey").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        per = tree_reduce_tables(refs, merge).to_pandas()
        rows = sorted(zip(per["cents"], per["ckey"]),
                      key=lambda r: (-int(r[0]), int(r[1])))
        k, frac, share, gap = knee_from_sorted(
            [int(c) for c, _ in rows])
        return pa.table({
            "knee_rank": pa.array([k], type=pa.int64()),
            "knee_frac": pa.array([frac], type=pa.float64()),
            "knee_share": pa.array([share], type=pa.float64()),
            "knee_gap": pa.array([gap], type=pa.float64()),
        })

    sql = """
    WITH per AS (
        SELECT o_custkey AS ckey,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    rk AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents DESC,
                                       ckey ASC) AS BIGINT) AS k
        FROM per
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(cents) AS BIGINT) AS tot
           FROM per),
    cum AS (
        SELECT k,
               CAST(sum(cents) OVER (ORDER BY k
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM rk
    ),
    best AS (
        SELECT k, cum,
               cum * nn.n - k * nn.tot AS g
        FROM cum CROSS JOIN nn
        ORDER BY g DESC, k ASC
        LIMIT 1
    )
    SELECT best.k AS knee_rank,
           CAST(best.k AS DOUBLE) / CAST(nn.n AS DOUBLE)
               AS knee_frac,
           CAST(best.cum AS DOUBLE) / CAST(nn.tot AS DOUBLE)
               AS knee_share,
           CAST(best.g AS DOUBLE)
           / (CAST(nn.n AS DOUBLE) * CAST(nn.tot AS DOUBLE))
               AS knee_gap
    FROM best CROSS JOIN nn
    """
    return q, sql


# --------------------------------------------- source_hill_numbers
def _hill_query():
    def q(sf_dir: str):
        from .queries_wave247 import _src_token_hist

        h = _src_token_hist(sf_dir)
        out = {"source": [], "hill0": [], "hill1": [], "hill2": []}
        for src, grp in h.groupby("source", sort=True):
            counts = [int(v) for v in grp.sort_values("token")
                      ["cnt"]]
            q0, q1, q2 = hill_numbers(counts)
            out["source"].append(src)
            out["hill0"].append(q0)
            out["hill1"].append(q1)
            out["hill2"].append(q2)
        return pa.table({
            "source": pa.array(out["source"], type=pa.string()),
            "hill0": pa.array(out["hill0"], type=pa.int64()),
            "hill1": pa.array(out["hill1"], type=pa.float64()),
            "hill2": pa.array(out["hill2"], type=pa.float64()),
        })

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    nn AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS q0,
               CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(cnt * cnt) AS BIGINT) AS sq
        FROM hist GROUP BY source
    ),
    ent AS (
        SELECT h.source,
               list_reduce(list_prepend(0.0e0,
                   list(-(CAST(h.cnt AS DOUBLE)
                          / CAST(nn.n AS DOUBLE)
                          * ln(CAST(h.cnt AS DOUBLE)
                               / CAST(nn.n AS DOUBLE)))
                        ORDER BY h.token)),
                   (a, b) -> a + b) AS hshannon
        FROM hist h JOIN nn ON h.source = nn.source
        GROUP BY h.source
    )
    SELECT nn.source,
           nn.q0 AS hill0,
           exp(ent.hshannon) AS hill1,
           CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
               / CAST(nn.sq AS DOUBLE) AS hill2
    FROM nn JOIN ent ON nn.source = ent.source
    ORDER BY nn.source
    """
    return q, sql


def build_wave251_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_revenue_knee",) + _knee_query()))
    add(*(("source_hill_numbers",) + _hill_query()))
    return queries, oracles
