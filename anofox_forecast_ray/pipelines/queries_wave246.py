"""Wave-246 queries: Brunner-Munzel test and Cox-Stuart trend test.

source_brunner_munzel: the heteroscedasticity-robust rank test of
P(X<Y)+0.5P(X=Y) = 0.5 between src0/src1 doc lengths (Brunner &
Munzel 2000), computed entirely from the bounded pooled per-value
histogram (the wave-180 distributed partial + tree reduce — nothing
per-row leaves the map side).  The whole statistic reduces to four
exact integers: doubled combined midranks M2_v give SR1 = Σc0·M2 and
SR2 = Σc1·M2; the rank-variance terms use the within-sample doubled
midranks W2 via t_v = M2_v − W2_v (constant inside a tie block), with
Se = Σ c_v (n·t_v − A)², A = SR − n(n+1) — HUGEINT-sized, carried as
Python ints / SQL HUGEINT.  The statistic, the Welch-Satterthwaite
df and the effect estimate p̂ are three short float expressions of
those integers, spelled identically on both sides.

events_cox_stuart: the Cox-Stuart (1955) sign test for monotone
trend in daily error counts — first-half vs second-half pairs at
offset ceil(n/2), ties dropped, with the EXACT two-sided binomial
p-value: tail sums of C(n,k) via the integer-exact multiplicative
recurrence (a recursive CTE mirrors math.comb), so the dyadic
p-value is bitwise reproducible.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def brunner_munzel_from_hist(c0: np.ndarray, c1: np.ndarray):
    """(n1, n2, p_hat, W, df) from ascending per-value counts."""
    c0 = [int(v) for v in c0]
    c1 = [int(v) for v in c1]
    n1 = sum(c0)
    n2 = sum(c1)
    n = n1 + n2
    sr1 = sr2 = 0
    se1 = se2 = 0
    cum = cum0 = cum1 = 0
    a1 = a2 = None
    # first pass: rank sums
    rows = []
    for v in range(len(c0)):
        cv = c0[v] + c1[v]
        m2 = 2 * cum + cv + 1
        w20 = 2 * cum0 + c0[v] + 1
        w21 = 2 * cum1 + c1[v] + 1
        rows.append((c0[v], c1[v], m2, w20, w21))
        sr1 += c0[v] * m2
        sr2 += c1[v] * m2
        cum += cv
        cum0 += c0[v]
        cum1 += c1[v]
    a1 = sr1 - n1 * (n1 + 1)
    a2 = sr2 - n2 * (n2 + 1)
    for cc0, cc1, m2, w20, w21 in rows:
        t0 = m2 - w20
        t1 = m2 - w21
        se1 += cc0 * (n1 * t0 - a1) ** 2
        se2 += cc1 * (n2 * t1 - a2) ** 2
    p_hat = float(sr2 - n2 * (n2 + 1)) / float(2 * n1 * n2)
    av = float(se1) / float(n1 * n1 * (n1 - 1))
    bv = float(se2) / float(n2 * n2 * (n2 - 1))
    w = (float(n1 * sr2 - n2 * sr1)
         / (float(n) * math.sqrt(float(n1) * av + float(n2) * bv)))
    fa = float(n1) * av
    fb = float(n2) * bv
    df = ((fa + fb) * (fa + fb)
          / (fa * fa / float(n1 - 1) + fb * fb / float(n2 - 1)))
    return n1, n2, p_hat, w, df


def cox_stuart(y):
    """(n_pairs, n_plus, n_minus, p_two_sided) with exact dyadic p."""
    n = len(y)
    m = n // 2
    off = n - m
    plus = minus = 0
    for i in range(m):
        if y[i + off] > y[i]:
            plus += 1
        elif y[i + off] < y[i]:
            minus += 1
    ne = plus + minus
    s = max(plus, minus)
    tail = sum(math.comb(ne, k) for k in range(s, ne + 1))
    den = sum(math.comb(ne, k) for k in range(0, ne + 1))
    p = min(1.0, float(2 * tail) / float(den))
    return m, plus, minus, p


# ---------------------------------------------- source_brunner_munzel
def _bm_query():
    def q(sf_dir: str):
        from .queries_wave180 import _two_source_hist

        h = _two_source_hist(sf_dir)
        n1, n2, p_hat, w, df = brunner_munzel_from_hist(
            h["c0"].to_numpy(np.int64), h["c1"].to_numpy(np.int64))
        return pa.table({
            "n_a": pa.array([n1], type=pa.int64()),
            "n_b": pa.array([n2], type=pa.int64()),
            "p_hat": pa.array([p_hat], type=pa.float64()),
            "bm_stat": pa.array([w], type=pa.float64()),
            "bm_df": pa.array([df], type=pa.float64()),
        })

    from .queries_wave180 import _SQL_HIST

    sql = f"""
    WITH {_SQL_HIST},
    w AS (
        SELECT v, c0, c1,
               2 * CAST(coalesce(sum(c0 + c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT)
                   + (c0 + c1) + 1 AS m2,
               2 * CAST(coalesce(sum(c0) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT)
                   + c0 + 1 AS w20,
               2 * CAST(coalesce(sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT)
                   + c1 + 1 AS w21
        FROM h
    ),
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2,
               CAST(sum(c0 * m2) AS BIGINT) AS sr1,
               CAST(sum(c1 * m2) AS BIGINT) AS sr2
        FROM w
    ),
    se AS (
        SELECT
            CAST(sum(CAST(c0 AS HUGEINT)
                 * (CAST(nn.n1 AS HUGEINT) * (m2 - w20)
                    - CAST(nn.sr1 - nn.n1 * (nn.n1 + 1) AS HUGEINT))
                 * (CAST(nn.n1 AS HUGEINT) * (m2 - w20)
                    - CAST(nn.sr1 - nn.n1 * (nn.n1 + 1)
                           AS HUGEINT))) AS HUGEINT) AS se1,
            CAST(sum(CAST(c1 AS HUGEINT)
                 * (CAST(nn.n2 AS HUGEINT) * (m2 - w21)
                    - CAST(nn.sr2 - nn.n2 * (nn.n2 + 1) AS HUGEINT))
                 * (CAST(nn.n2 AS HUGEINT) * (m2 - w21)
                    - CAST(nn.sr2 - nn.n2 * (nn.n2 + 1)
                           AS HUGEINT))) AS HUGEINT) AS se2
        FROM w CROSS JOIN nn
    ),
    f AS (
        SELECT nn.n1, nn.n2, nn.sr1, nn.sr2,
               CAST(nn.n1 AS DOUBLE)
               * (CAST(se.se1 AS DOUBLE)
                  / CAST(nn.n1 * nn.n1 * (nn.n1 - 1) AS DOUBLE))
                   AS fa,
               CAST(nn.n2 AS DOUBLE)
               * (CAST(se.se2 AS DOUBLE)
                  / CAST(nn.n2 * nn.n2 * (nn.n2 - 1) AS DOUBLE))
                   AS fb
        FROM se CROSS JOIN nn
    )
    SELECT n1 AS n_a, n2 AS n_b,
           CAST(sr2 - n2 * (n2 + 1) AS DOUBLE)
               / CAST(2 * n1 * n2 AS DOUBLE) AS p_hat,
           CAST(n1 * sr2 - n2 * sr1 AS DOUBLE)
               / (CAST(n1 + n2 AS DOUBLE) * sqrt(fa + fb))
               AS bm_stat,
           (fa + fb) * (fa + fb)
               / (fa * fa / CAST(n1 - 1 AS DOUBLE)
                  + fb * fb / CAST(n2 - 1 AS DOUBLE)) AS bm_df
    FROM f
    """
    return q, sql


# --------------------------------------------------- events_cox_stuart
def _cox_stuart_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, plus, minus, p = cox_stuart([int(v) for v in e])
        return pa.table({
            "n_pairs": pa.array([m], type=pa.int64()),
            "n_plus": pa.array([plus], type=pa.int64()),
            "n_minus": pa.array([minus], type=pa.int64()),
            "p_two_sided": pa.array([p], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day - (SELECT lo FROM span) AS idx,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    dims AS (
        SELECT count(*) // 2 AS m,
               count(*) - count(*) // 2 AS off
        FROM d
    ),
    prs AS (
        SELECT a.y AS y0, b.y AS y1
        FROM d a JOIN d b
          ON b.idx = a.idx + (SELECT off FROM dims)
        WHERE a.idx < (SELECT m FROM dims)
    ),
    cnt AS (
        SELECT CAST(sum(CASE WHEN y1 > y0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS plus,
               CAST(sum(CASE WHEN y1 < y0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS minus
        FROM prs
    ),
    ne AS (
        SELECT plus, minus, plus + minus AS n,
               greatest(plus, minus) AS s
        FROM cnt
    ),
    binom AS (
        WITH RECURSIVE b AS (
            SELECT 0 AS k, CAST(1 AS HUGEINT) AS c
            UNION ALL
            SELECT k + 1,
                   c * CAST((SELECT n FROM ne) - k AS HUGEINT)
                     // CAST(k + 1 AS HUGEINT)
            FROM b WHERE k < (SELECT n FROM ne)
        )
        SELECT CAST(sum(CASE WHEN k >= (SELECT s FROM ne)
                             THEN c ELSE 0 END) AS HUGEINT) AS tail,
               CAST(sum(c) AS HUGEINT) AS den
        FROM b
    )
    SELECT (SELECT CAST(m AS BIGINT) FROM dims) AS n_pairs,
           ne.plus AS n_plus,
           ne.minus AS n_minus,
           least(1.0, CAST(2 * binom.tail AS DOUBLE)
                      / CAST(binom.den AS DOUBLE)) AS p_two_sided
    FROM ne CROSS JOIN binom
    """
    return q, sql


def build_wave246_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_brunner_munzel",) + _bm_query()))
    add(*(("events_cox_stuart",) + _cox_stuart_query()))
    return queries, oracles
