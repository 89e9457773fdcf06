"""Wave-297 query: exact longest-run significance.

events_longest_run_pvalue: the EXACT fair-coin p-value of the
longest up-run in the daily error direction chain — the count of
binary strings of length n with every 1-run shorter than L follows
the k-generalized Fibonacci recurrence g(m) = Σ_{j≤k} g(m−j)
(seeds g(m) = 2^m for m < k), all integers < 2^n, so
p = P(L_max ≥ L_obs) = 1 − g(n)/2^n is an exact dyadic rational
evaluated with one float division.  The recurrence replays as a
single history-growing LIST fold (the RTS-smoother idiom).  Gives
the existing runs tests their exact-distribution companion.
"""

from __future__ import annotations

import pyarrow as pa

US_PER_DAY = 86_400_000_000


def longest_run_pvalue(y):
    """(n_chain, l_obs, p_exact) for the up-move chain of y."""
    s = [1 if b > a else 0 for a, b in zip(y[:-1], y[1:])]
    n = len(s)
    l_obs = 0
    run = 0
    for v in s:
        run = run + 1 if v else 0
        l_obs = max(l_obs, run)
    if l_obs == 0:
        return n, 0, 1.0
    k = l_obs
    g = [1 << m for m in range(min(k, n + 1))]   # g(m) = 2^m, m<k
    while len(g) <= n:
        g.append(sum(g[-k:]))
    p = 1.0 - float(g[n]) / float(1 << n)
    return n, l_obs, p


def _run_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, l_obs, p = longest_run_pvalue([int(v) for v in e])
        return pa.table({
            "n_chain": pa.array([n], type=pa.int64()),
            "longest_up_run": pa.array([l_obs], type=pa.int64()),
            "p_exact": pa.array([p], type=pa.float64()),
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
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    moves AS (
        SELECT day,
               CASE WHEN y > lag(y) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS b,
               lag(y) OVER (ORDER BY day) AS prev
        FROM d
    ),
    chain AS (
        SELECT day, b,
               row_number() OVER (ORDER BY day) AS i
        FROM moves WHERE prev IS NOT NULL
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM chain),
    runs AS (
        SELECT i - row_number() OVER (ORDER BY i) AS grp
        FROM chain WHERE b = 1
    ),
    lmax AS (
        SELECT CAST(coalesce(max(c), 0) AS BIGINT) AS l
        FROM (SELECT count(*) AS c FROM runs GROUP BY grp)
    ),
    gfold AS (
        SELECT list_reduce(
            list_prepend(
                (SELECT list_transform(generate_series(0,
                    CAST(least(lmax.l, nn.n + 1) AS INT) - 1),
                    m -> CAST(1 AS HUGEINT) << m)
                 FROM lmax, nn),
                (SELECT list_transform(generate_series(1,
                    CAST(greatest(nn.n - lmax.l + 1, 0) AS INT)),
                    j -> [CAST(0 AS HUGEINT)])
                 FROM lmax, nn)),
            (acc, e) -> list_append(acc,
                list_reduce(acc[greatest(1,
                    CAST(len(acc) AS INT)
                    - CAST(lmax.l AS INT) + 1):],
                    (a, b) -> a + b))) AS g
        FROM lmax
    )
    SELECT nn.n AS n_chain,
           lmax.l AS longest_up_run,
           CASE WHEN lmax.l = 0 THEN 1.0e0
                ELSE 1.0e0
                     - CAST(gfold.g[CAST(nn.n + 1 AS INT)]
                            AS DOUBLE)
                       / CAST(CAST(1 AS HUGEINT) << nn.n
                              AS DOUBLE) END AS p_exact
    FROM nn CROSS JOIN lmax CROSS JOIN gfold
    """
    return q, sql


def build_wave297_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_longest_run_pvalue",) + _run_query()))
    return queries, oracles
