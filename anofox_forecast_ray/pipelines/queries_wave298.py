"""Wave-298 query: exact Wilcoxon rank-sum p-value.

events_wilcoxon_exact: the EXACT two-sided permutation p-value of
the Wilcoxon rank-sum test between first-half and second-half daily
errors, conditional on the observed ties — the full null
distribution of the doubled-midrank sum is built by the integer
subset-sum DP ways[k][w] (choose k of n days), replayed as 30
MATERIALIZED flat-list layers (one per day; index arithmetic
k = idx//slots, w = idx%slots inside the lambda).  The p-value is a
ratio of exact integer counts to C(n, m) (binomial recurrence fold).
The exact-distribution upgrade of events_mannwhitney_u.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

MAX_DAYS = 30


def wilcoxon_exact(y):
    """(n, w_obs2, p_exact) — subset-sum DP over doubled ranks."""
    y = y[:MAX_DAYS]
    n = len(y)
    m = n // 2
    # doubled pooled midranks in day order
    import collections

    cnt = collections.Counter(y)
    cum = 0
    m2 = {}
    for v in sorted(cnt):
        c = cnt[v]
        m2[v] = 2 * cum + c + 1
        cum += c
    r2 = [m2[v] for v in y]
    w_obs = sum(r2[m:])
    slots = n * (n + 1) + 1
    ways = [[0] * slots for _ in range(m + 1)]
    ways[0][0] = 1
    for r in r2:
        for k in range(min(m, 1 << 30), 0, -1):
            row = ways[k]
            prev = ways[k - 1]
            for w in range(slots - 1, r - 1, -1):
                if prev[w - r]:
                    row[w] += prev[w - r]
    total = math.comb(n, m)
    le = sum(ways[m][w] for w in range(0, w_obs + 1))
    ge = sum(ways[m][w] for w in range(w_obs, slots))
    p = min(1.0, 2.0 * (float(min(le, ge)) / float(total)))
    return n, w_obs, p


def _wilcoxon_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, w_obs, p = wilcoxon_exact([int(v) for v in e])
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "w_obs2": pa.array([w_obs], type=pa.int64()),
            "p_exact": pa.array([p], type=pa.float64()),
        })

    layers = []
    for t in range(1, MAX_DAYS + 1):
        layers.append(f"""
    st{t} AS MATERIALIZED (
        SELECT list_transform(generate_series(1, dims.sz),
            i -> prev.v[i]
                 + CASE WHEN (i - 1) // dims.slots >= 1
                         AND (i - 1) % dims.slots >= rk{t}.r
                        THEN prev.v[i - dims.slots - rk{t}.r]
                        ELSE 0 END) AS v
        FROM st{t - 1} prev CROSS JOIN dims
        LEFT JOIN (SELECT coalesce((SELECT r FROM rks
                                    WHERE i = {t}),
                                   1000000) AS r) rk{t} ON TRUE
    )""")
    layers_sql = ",".join(layers)

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
        SELECT g.day - (SELECT lo FROM span) + 1 AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
        WHERE g.day - (SELECT lo FROM span) + 1 <= {MAX_DAYS}
    ),
    hist AS (
        SELECT y, CAST(count(*) AS BIGINT) AS c,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cumb
        FROM d GROUP BY y
    ),
    rks AS (
        SELECT d.i, 2 * hist.cumb + hist.c + 1 AS r
        FROM d JOIN hist ON d.y = hist.y
    ),
    dims AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) // 2 AS BIGINT) AS m,
               CAST(count(*) * (count(*) + 1) + 1 AS BIGINT)
                   AS slots,
               CAST((count(*) // 2 + 1)
                    * (count(*) * (count(*) + 1) + 1) AS BIGINT)
                   AS sz
        FROM d
    ),
    wobs AS (
        SELECT CAST(sum(r) AS BIGINT) AS w
        FROM rks, dims WHERE rks.i > dims.m
    ),
    st0 AS MATERIALIZED (
        SELECT list_transform(generate_series(1, dims.sz),
            i -> CASE WHEN i = 1 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS v
        FROM dims
    ),{layers_sql},
    fin AS (
        SELECT st{MAX_DAYS}.v AS v FROM st{MAX_DAYS}
    ),
    tails AS (
        SELECT
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(0,
                    CAST(wobs.w AS INT)),
                    w -> fin.v[CAST(dims.m * dims.slots AS INT)
                               + CAST(w AS INT) + 1])),
                (a, b) -> a + b) AS le,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(
                    CAST(wobs.w AS INT),
                    CAST(dims.slots AS INT) - 1),
                    w -> fin.v[CAST(dims.m * dims.slots AS INT)
                               + CAST(w AS INT) + 1])),
                (a, b) -> a + b) AS ge
        FROM fin CROSS JOIN dims CROSS JOIN wobs
    ),
    binom AS (
        WITH RECURSIVE b AS (
            SELECT 0 AS k, CAST(1 AS HUGEINT) AS c
            UNION ALL
            SELECT k + 1,
                   c * CAST((SELECT n FROM dims) - k AS HUGEINT)
                     // CAST(k + 1 AS HUGEINT)
            FROM b WHERE k < (SELECT m FROM dims)
        )
        SELECT c AS total FROM b
        WHERE k = (SELECT m FROM dims)
    )
    SELECT dims.n AS n_days,
           (SELECT w FROM wobs) AS w_obs2,
           least(1.0e0,
                 2.0e0 * (CAST(least(tails.le, tails.ge)
                               AS DOUBLE)
                          / CAST(binom.total AS DOUBLE)))
               AS p_exact
    FROM dims CROSS JOIN tails CROSS JOIN binom
    """
    return q, sql


def build_wave298_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_wilcoxon_exact",) + _wilcoxon_query()))
    return queries, oracles
