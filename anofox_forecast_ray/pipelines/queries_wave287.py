"""Wave-287 queries: ES backtest and pinball loss.

events_es_backtest: the Acerbi-Szekely (2014) direct expected-
shortfall backtest for the half-split daily error "losses": the
train half fixes VaR (exact integer order statistic at q75) and
ES (mean of train values strictly above VaR — one integer ratio);
the test statistic Z = (1/(n·p))·Σ_test x_t·I(x_t > VaR)/ES − 1 is
a single float expression of integer sums (Z ≈ 0 when ES is
well-calibrated, > 0 when tail risk is understated).

events_pinball_loss: the τ = 3/4 quantile (pinball) loss of the
train-q75 forecast on the test half.  With dyadic τ the TOTAL loss
is the exact integer Σ max(3(x−q), (q−x)) over 4 — one division for
the mean.  The quantile-forecast companion of the CRPS row.
"""

from __future__ import annotations

import pyarrow as pa

US_PER_DAY = 86_400_000_000

_SPLIT_CTE = f"""
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
    m AS (SELECT count(*) // 2 AS m FROM d),
    train AS (SELECT y FROM d WHERE idx < (SELECT m FROM m)),
    test AS (
        SELECT idx, y FROM d WHERE idx >= (SELECT m FROM m)
    ),
    thr AS (
        SELECT y AS var FROM train ORDER BY y
        LIMIT 1 OFFSET ((3 * (SELECT m FROM m) + 3) // 4 - 1)
    )
"""


def _split(y):
    m = len(y) // 2
    train = sorted(y[:m])
    k = -(-3 * m // 4)
    var = train[k - 1]
    return m, train, y[m:], var


def es_backtest(y):
    """(var, es, z) — AS direct test at p = 1/4."""
    m, train, test, var = _split(y)
    tail = [v for v in train if v > var]
    if not tail:                 # tie-degenerate tail: ES := VaR
        es = float(var)
    else:
        es = float(sum(tail)) / float(len(tail))
    n = len(test)
    s = sum(v for v in test if v > var)
    z = (float(4 * s) / (float(n) * es)) - 1.0
    return var, es, z


def pinball_loss(y):
    """(q, total4, mean_loss) at tau = 3/4."""
    m, train, test, q = _split(y)
    total4 = sum(max(3 * (v - q), q - v) for v in test)
    return q, total4, float(total4) / (4.0 * float(len(test)))


# --------------------------------------------------- events_es_backtest
def _es_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        var, es, z = es_backtest([int(v) for v in e])
        return pa.table({
            "var_threshold": pa.array([var], type=pa.int64()),
            "es_train": pa.array([es], type=pa.float64()),
            "as_z": pa.array([z], type=pa.float64()),
        })

    sql = _SPLIT_CTE + """,
    tail AS (
        SELECT CAST(sum(y) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS c
        FROM train WHERE y > (SELECT var FROM thr)
    ),
    ts AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(CASE WHEN y > (SELECT var
                                                FROM thr)
                                      THEN y ELSE 0 END), 0)
                    AS BIGINT) AS s
        FROM test
    ),
    es AS (
        SELECT CASE WHEN tail.c = 0
                    THEN CAST((SELECT var FROM thr) AS DOUBLE)
                    ELSE CAST(tail.s AS DOUBLE)
                         / CAST(tail.c AS DOUBLE) END AS es
        FROM tail
    )
    SELECT (SELECT CAST(var AS BIGINT) FROM thr)
               AS var_threshold,
           es.es AS es_train,
           (CAST(4 * ts.s AS DOUBLE)
            / (CAST(ts.n AS DOUBLE) * es.es)) - 1.0 AS as_z
    FROM es CROSS JOIN ts
    """
    return q, sql


# --------------------------------------------------- events_pinball_loss
def _pinball_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        qv, total4, mean_loss = pinball_loss([int(v) for v in e])
        return pa.table({
            "q75_train": pa.array([qv], type=pa.int64()),
            "pinball_total4": pa.array([total4], type=pa.int64()),
            "pinball_mean": pa.array([mean_loss],
                                     type=pa.float64()),
        })

    sql = _SPLIT_CTE + """,
    loss AS (
        SELECT CAST(sum(greatest(
                   3 * (y - (SELECT var FROM thr)),
                   (SELECT var FROM thr) - y)) AS BIGINT)
                   AS total4,
               CAST(count(*) AS BIGINT) AS n
        FROM test
    )
    SELECT (SELECT CAST(var AS BIGINT) FROM thr) AS q75_train,
           loss.total4 AS pinball_total4,
           CAST(loss.total4 AS DOUBLE)
               / (4.0 * CAST(loss.n AS DOUBLE)) AS pinball_mean
    FROM loss
    """
    return q, sql


def build_wave287_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_es_backtest",) + _es_query()))
    add(*(("events_pinball_loss",) + _pinball_query()))
    return queries, oracles
