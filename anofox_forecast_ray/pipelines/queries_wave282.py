"""Wave-282 query: Bayesian online changepoint detection (BOCPD).

events_bocpd: the Adams-MacKay (2007) run-length filter over daily
error counts with a Poisson-Gamma(1,1) conjugate model and constant
hazard 1/10.  The negative-binomial predictive is computed in log
space WITHOUT lgamma (DuckDB's lgamma differs from libm at 1 ulp):
ln C(x+α−1, x) folds the exact integer ratios ln((S+i)/i), i = 1..x,
where S is the run's suffix sum — so every term is an identical
float expression of integers.  Thirty recursion layers (the 8th
bitwise-replayed loop) carry the run-length probability vector as a
LIST, with growth/changepoint/normalize folds in fixed r order.
Emits the final MAP run length, its probability, and the mass on
run lengths ≤ 5 (recent-changepoint probability).
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

HAZ = 0.1


def bocpd(x):
    """(map_run, map_prob, p_recent) after filtering all of x."""
    n = len(x)
    pre = [0]
    for v in x:
        pre.append(pre[-1] + v)
    p = [1.0]                       # run length 0 before any data
    for t in range(1, n + 1):
        xt = x[t - 1]
        preds = []
        for r in range(t):          # run length BEFORE x_t
            s = pre[t - 1] - pre[t - 1 - r]
            alpha = 1 + s
            beta = 1 + r
            lp = 0.0
            for i in range(1, xt + 1):
                lp = lp + math.log(float(s + i) / float(i))
            lp = lp + float(alpha) * math.log(
                float(beta) / float(beta + 1))
            lp = lp + float(xt) * math.log(
                1.0 / float(beta + 1))
            preds.append(math.exp(lp))
        w = [p[r] * preds[r] for r in range(t)]
        cp_mass = 0.0
        for v in w:
            cp_mass = cp_mass + v
        cp = cp_mass * HAZ
        growth = [v * (1.0 - HAZ) for v in w]
        new = [cp] + growth
        total = 0.0
        for v in new:
            total = total + v
        p = [v / total for v in new]
    best = None
    for r, v in enumerate(p):        # ascending r: first max
        if best is None or v > best[0]:
            best = (v, r)
    p_recent = 0.0
    for r in range(min(6, len(p))):
        p_recent = p_recent + p[r]
    return best[1], best[0], p_recent


def _bocpd_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        # 30 recursion layers on the SQL side: cap both sides
        map_run, map_prob, p_recent = bocpd(
            [int(v) for v in e][:30])
        return pa.table({
            "map_run_length": pa.array([map_run],
                                       type=pa.int64()),
            "map_prob": pa.array([map_prob], type=pa.float64()),
            "p_recent_cp": pa.array([p_recent],
                                    type=pa.float64()),
        })

    # generated SQL: logpred table + 30 layers of list recursion
    layers = []
    for t in range(1, 31):
        w = (f"list_transform(generate_series(1, {t}), "
             f"i -> prev.p[i] * pr.preds[i])")
        cp = (f"list_reduce(list_prepend(0.0e0, {w}), "
              f"(a, b) -> a + b) * {HAZ!r}")
        growth = (f"list_transform(generate_series(1, {t}), "
                  f"i -> (prev.p[i] * pr.preds[i])"
                  f" * (1.0e0 - {HAZ!r}))")
        new = f"list_prepend({cp}, {growth})"
        tot = (f"list_reduce(list_prepend(0.0e0, {new}), "
               f"(a, b) -> a + b)")
        p_expr = f"list_transform({new}, v -> v / ({tot}))"
        layers.append(
            f"st{t} AS MATERIALIZED (SELECT CASE WHEN {t} > "
            f"(SELECT n FROM nn) THEN prev.p ELSE {p_expr} END"
            f" AS p FROM st{t - 1} prev LEFT JOIN predt pr"
            f" ON pr.t = {t})")
    layers_sql = ",\n    ".join(layers)

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
    d AS MATERIALIZED (
        SELECT g.day - (SELECT lo FROM span) + 1 AS t,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
        WHERE g.day - (SELECT lo FROM span) + 1 <= 30
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    pre AS (
        SELECT t, y,
               CAST(coalesce(sum(y) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS pcum
        FROM d
    ),
    logpred AS MATERIALIZED (
        SELECT a.t, b.r,
               list_reduce(list_prepend(0.0e0,
                   list_transform(
                       generate_series(1, CAST(a.y AS INT)),
                       i -> ln(CAST((a.pcum - p2.pcum) + i
                                    AS DOUBLE)
                               / CAST(i AS DOUBLE)))),
                   (x, z) -> x + z)
               + CAST(1 + a.pcum - p2.pcum AS DOUBLE)
                 * ln(CAST(1 + b.r AS DOUBLE)
                      / CAST(2 + b.r AS DOUBLE))
               + CAST(a.y AS DOUBLE)
                 * ln(1.0e0 / CAST(2 + b.r AS DOUBLE)) AS lp
        FROM pre a
        JOIN (SELECT CAST(unnest(generate_series(0, 29))
                          AS BIGINT) AS r) b
          ON b.r < a.t
        JOIN pre p2 ON p2.t = a.t - b.r
    ),
    predt AS MATERIALIZED (
        SELECT t, list(exp(lp) ORDER BY r) AS preds
        FROM logpred GROUP BY t
    ),
    st0 AS MATERIALIZED (SELECT [1.0e0] AS p),{layers_sql},
    fin AS (
        SELECT p FROM st30
    ),
    best AS (
        SELECT r, fin.p[CAST(r + 1 AS INT)] AS v
        FROM fin, (SELECT CAST(unnest(generate_series(0, 30))
                               AS BIGINT) AS r)
        WHERE r + 1 <= len(fin.p)
        ORDER BY v DESC, r ASC LIMIT 1
    )
    SELECT best.r AS map_run_length,
           best.v AS map_prob,
           (SELECT list_reduce(list_prepend(0.0e0,
                list_transform(generate_series(1,
                    least(6, CAST(len(fin.p) AS INT))),
                    i -> fin.p[i])), (a, b) -> a + b)
            FROM fin) AS p_recent_cp
    FROM best
    """
    return q, sql


def build_wave282_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bocpd",) + _bocpd_query()))
    return queries, oracles
