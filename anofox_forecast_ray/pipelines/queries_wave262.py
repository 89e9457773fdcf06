"""Wave-262 queries: Poisson changepoint MLE and rarefaction curve.

events_poisson_changepoint: the maximum-likelihood single changepoint
in the daily error RATE under a piecewise-Poisson model — argmax over
τ of the profile log-likelihood S1·ln(S1/n1) + S2·ln(S2/n2) (the
xlnx 0-convention), reported with the likelihood-ratio statistic
2·(ll_max − ll_null).  All log arguments are ratios of exact integer
prefix sums, so the argmax over identically-computed floats is
deterministic (ties → smallest τ).  Completes the changepoint triple:
PELT (penalized, parametric), e-divisive (nonparametric energy), and
now the classic Poisson-rate LR scan.

corpus_rarefaction: the rarefaction curve E[S_m] — expected distinct
tokens in a uniform subsample of m tokens — via the exact
hypergeometric identity E[S_m] = Σ_v (1 − Π_{i<m} (N−f_v−i)/(N−i)).
Each per-token product is a SEQUENTIAL float fold in i order and the
outer sum folds in token order (list_reduce both times).  The
vocabulary-growth companion of Heaps' law / Chao1 / Good-Turing.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

RAREFY_MS = (10, 100, 1000)


def poisson_changepoint(x):
    """(tau, lr, rate_left, rate_right)."""
    n = len(x)
    tot = sum(x)

    def xlnx(s, m):
        if s == 0:
            return 0.0
        return float(s) * math.log(float(s) / float(m))

    best = None
    for tau in range(1, n):
        s1 = sum(x[:tau])
        s2 = tot - s1
        ll = xlnx(s1, tau) + xlnx(s2, n - tau)
        if best is None or ll > best[0]:
            best = (ll, tau)
    ll, tau = best
    lr = 2.0 * (ll - xlnx(tot, n))
    s1 = sum(x[:tau])
    return (tau, lr, float(s1) / float(tau),
            float(tot - s1) / float(n - tau))


def rarefaction(freqs, n, m):
    """E[S_m] — ordered hypergeometric product folds."""
    total = 0.0
    for f in freqs:               # ascending token order by caller
        p = 1.0
        for i in range(m):
            p = p * (float(n - f - i) / float(n - i))
        total = total + (1.0 - p)
    return total


# --------------------------------------- events_poisson_changepoint
def _pois_cp_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        tau, lr, rl, rr = poisson_changepoint([int(v) for v in e])
        return pa.table({
            "tau": pa.array([tau], type=pa.int64()),
            "lr_stat": pa.array([lr], type=pa.float64()),
            "rate_left": pa.array([rl], type=pa.float64()),
            "rate_right": pa.array([rr], type=pa.float64()),
        })

    xlnx = ("CASE WHEN {s} = 0 THEN 0.0 ELSE CAST({s} AS DOUBLE) "
            "* ln(CAST({s} AS DOUBLE) / CAST({m} AS DOUBLE)) END")
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
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot
           FROM d),
    pre AS (
        SELECT i + 1 AS tau,
               CAST(sum(y) OVER (ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
        FROM d
    ),
    scored AS (
        SELECT tau, s1,
               {xlnx.format(s='s1', m='tau')}
               + {xlnx.format(s='(nn.tot - s1)', m='(nn.n - tau)')}
                   AS ll
        FROM pre CROSS JOIN nn
        WHERE tau < nn.n
    ),
    best AS (
        SELECT tau, s1, ll FROM scored
        ORDER BY ll DESC, tau ASC LIMIT 1
    )
    SELECT best.tau AS tau,
           2.0 * (best.ll
                  - {xlnx.format(s='nn.tot', m='nn.n')}) AS lr_stat,
           CAST(best.s1 AS DOUBLE) / CAST(best.tau AS DOUBLE)
               AS rate_left,
           CAST(nn.tot - best.s1 AS DOUBLE)
               / CAST(nn.n - best.tau AS DOUBLE) AS rate_right
    FROM best CROSS JOIN nn
    """
    return q, sql


# ------------------------------------------------ corpus_rarefaction
def _rarefaction_query():
    def q(sf_dir: str):
        from .queries_wave187 import _token_hist

        h = _token_hist(sf_dir).sort_values("token")
        freqs = [int(v) for v in h["f"]]
        n = sum(freqs)
        out = {"m": [], "expected_distinct": []}
        for m in RAREFY_MS:
            out["m"].append(m)
            out["expected_distinct"].append(
                rarefaction(freqs, n, m))
        return pa.table({
            "m": pa.array(out["m"], type=pa.int64()),
            "expected_distinct": pa.array(
                out["expected_distinct"], type=pa.float64()),
        })

    from .queries import SQL_TOK

    ms = ", ".join(str(m) for m in RAREFY_MS)
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT token, CAST(count(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    nn AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM hist),
    ms AS (SELECT CAST(unnest([{ms}]) AS BIGINT) AS m),
    per AS (
        SELECT ms.m, hist.token,
               1.0e0 - list_reduce(list_prepend(1.0e0,
                   list_transform(generate_series(0,
                       CAST(ms.m AS INT) - 1),
                       i -> CAST(nn.n - hist.f - i AS DOUBLE)
                            / CAST(nn.n - i AS DOUBLE))),
                   (a, b) -> a * b) AS miss
        FROM hist CROSS JOIN ms CROSS JOIN nn
    )
    SELECT m,
           list_reduce(list_prepend(0.0e0,
               list(miss ORDER BY token)), (a, b) -> a + b)
               AS expected_distinct
    FROM per
    GROUP BY m
    ORDER BY m
    """
    return q, sql


def build_wave262_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_poisson_changepoint",) + _pois_cp_query()))
    add(*(("corpus_rarefaction",) + _rarefaction_query()))
    return queries, oracles
