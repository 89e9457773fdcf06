"""Wave-216 queries: Quandt sup-Wald break, Dixon's Q.

- orders_sup_wald_break: the Quandt/Andrews sup-Wald test for a
  MEAN SHIFT in monthly revenue at an unknown date: for every
  candidate break in the central 70% of months (revenue in
  thousand-dollar units so squared prefix sums stay int64),
  SSR splits come from prefix integer moments (S1, S2 per side), F(tau) =
  (SSR0 - SSR_tau) / (SSR_tau / (T-2)), and the reported break is
  the argmax (F DESC, tau ASC over identically computed doubles).
  Complements Pettitt (rank-based) and Chow (known date).
- source_dixon_q: Dixon's Q test for an outlying SOURCE: order the
  20 per-source mean doc lengths by the EXACT rational key
  (s1_a * n_b vs s1_b * n_a cross-multiplication — no float
  ordering), then Q_low = (m2 - m1)/(m20 - m1) and Q_high =
  (m20 - m19)/(m20 - m1) in doubles.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave191 import _monthly_cents


def sup_wald(y):
    """(tau_idx, sup_f) mean-shift sup-Wald over central 70%."""
    T = len(y)
    s1 = [0]
    s2 = [0]
    for v in y:
        s1.append(s1[-1] + int(v))
        s2.append(s2[-1] + int(v) * int(v))

    def ssr(lo, hi):  # rows lo..hi-1
        n = hi - lo
        a = s1[hi] - s1[lo]
        b = s2[hi] - s2[lo]
        return float(b) - float(a) * float(a) / n

    ssr0 = ssr(0, T)
    lo_t = (15 * T + 99) // 100
    hi_t = (85 * T) // 100
    best = None
    for tau in range(lo_t, hi_t + 1):
        s = ssr(0, tau) + ssr(tau, T)
        f = (ssr0 - s) / (s / (T - 2))
        key = (f, -tau)
        if best is None or key > best[0]:
            best = (key, tau, f)
    return best[1], best[2]


def dixon_q(ns, s1s, srcs=None):
    """(q_low, q_high) over per-group means ordered by the exact
    rational cross-multiplied key (ties by group name); means to
    doubles at the end."""
    if srcs is None:
        srcs = [str(i) for i in range(len(ns))]
    idx = sorted(range(len(ns)),
                 key=lambda i: (Fraction(s1s[i], ns[i]),
                                srcs[i]))
    m = [s1s[i] / ns[i] for i in idx]
    rng = m[-1] - m[0]
    return (m[1] - m[0]) / rng, (m[-1] - m[-2]) / rng


# ------------------------------------------------ orders_sup_wald_break
def _supwald_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries import _num_read_blocks

        US_PER_DAY = 86_400_000_000

        def partial(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({"month": pa.array(uk),
                             "cents": pa.array(cs)})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate([("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("month").reset_index(drop=True)
        # thousand-dollar units: cents^2 prefix sums overflow int64
        y = [int(v) // 100000 for v in m["cents"]]
        tau, f = sup_wald(y)
        return pa.table({
            "break_idx": pa.array([tau], type=pa.int64()),
            "sup_f": pa.array([f], type=pa.float64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT row_number() OVER (ORDER BY month) AS i,
               cents // 100000 AS kd
        FROM mm
    ),
    pre AS (
        SELECT i,
               CAST(sum(kd) OVER (ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p1,
               CAST(sum(kd * kd) OVER (ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p2
        FROM idx
    ),
    nn AS (
        SELECT CAST(max(i) AS BIGINT) AS t,
               CAST(max(p1) AS BIGINT) AS s1t,
               CAST(max(p2) AS BIGINT) AS s2t
        FROM pre
    ),
    base AS (
        SELECT t, s1t, s2t,
               CAST(s2t AS DOUBLE)
               - CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE)
                 / CAST(t AS DOUBLE) AS ssr0
        FROM nn
    ),
    cand AS (
        SELECT pre.i AS tau,
               (CAST(pre.p2 AS DOUBLE)
                - CAST(pre.p1 AS DOUBLE)
                  * CAST(pre.p1 AS DOUBLE)
                  / CAST(pre.i AS DOUBLE))
               + (CAST(base.s2t - pre.p2 AS DOUBLE)
                  - CAST(base.s1t - pre.p1 AS DOUBLE)
                    * CAST(base.s1t - pre.p1 AS DOUBLE)
                    / CAST(base.t - pre.i AS DOUBLE)) AS s,
               base.ssr0, base.t
        FROM pre CROSS JOIN base
        WHERE pre.i >= (15 * base.t + 99) // 100
          AND pre.i <= (85 * base.t) // 100
    ),
    f AS (
        SELECT tau,
               (ssr0 - s) / (s / CAST(t - 2 AS DOUBLE)) AS ff,
               row_number() OVER (ORDER BY
                   (ssr0 - s) / (s / CAST(t - 2 AS DOUBLE))
                   DESC, tau ASC) AS rk
        FROM cand
    )
    SELECT CAST(tau AS BIGINT) AS break_idx, ff AS sup_f
    FROM f WHERE rk = 1
    """
    return q, sql


# ----------------------------------------------------- source_dixon_q
def _dixon_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            uk = np.unique(src)
            rows = {"src": [], "n": [], "s1": []}
            for s in uk:
                m = src == s
                rows["src"].append(str(s))
                rows["n"].append(int(m.sum()))
                rows["s1"].append(int(v[m].sum()))
            return pa.table({
                "src": pa.array(rows["src"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "s1": pa.array(rows["s1"], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("src").aggregate(
                [("n", "sum"), ("s1", "sum")])
            return pa.table({
                "src": g.column("src").cast(pa.string()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s1": g.column("s1_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        ql, qh = dixon_q([int(v) for v in h["n"]],
                         [int(v) for v in h["s1"]],
                         [str(v) for v in h["src"]])
        return pa.table({
            "q_low": pa.array([ql], type=pa.float64()),
            "q_high": pa.array([qh], type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT source AS src,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS s1
        FROM documents GROUP BY source
    ),
    -- exact rational ordering: rank by s1_a * n_b <-> s1_b * n_a
    ranked AS (
        SELECT src, n, s1,
               (SELECT CAST(count(*) AS BIGINT) FROM g g2
                WHERE g2.s1 * g.n < g.s1 * g2.n
                   OR (g2.s1 * g.n = g.s1 * g2.n
                       AND g2.src < g.src)) + 1 AS rk,
               (SELECT CAST(count(*) AS BIGINT) FROM g) AS k
        FROM g
    ),
    pick AS (
        SELECT
            (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             FROM ranked WHERE rk = 1) AS m1,
            (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             FROM ranked WHERE rk = 2) AS m2,
            (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             FROM ranked
             WHERE rk = (SELECT max(k) FROM ranked) - 1)
                AS m19,
            (SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             FROM ranked
             WHERE rk = (SELECT max(k) FROM ranked)) AS m20
        FROM (SELECT 1)
    )
    SELECT (m2 - m1) / (m20 - m1) AS q_low,
           (m20 - m19) / (m20 - m1) AS q_high
    FROM pick
    """
    return q, sql


def build_wave216_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_sup_wald_break",) + _supwald_query()))
    add(*(("source_dixon_q",) + _dixon_query()))
    return queries, oracles
