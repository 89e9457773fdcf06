"""Wave-222 query: Engle-Granger cointegration test.

events_engle_granger: the two-step Engle-Granger test between the
zero-filled daily ERROR and PURCHASE count series: (1) the
cointegrating OLS y = a + b x from exact int64 moments; (2) the
lag-0 Dickey-Fuller regression WITHOUT drift on the residuals,
delta_e_t = gamma e_{t-1} + u_t, with gamma = sum e_{t-1} de_t /
sum e_{t-1}^2, s^2 = sum (de - gamma e)^2 / (m - 1), and the EG
t-statistic gamma / sqrt(s^2 / sum e_{t-1}^2). All float
reductions are sequential folds in day order (list_reduce). The
sibling of the Granger-causality and VAR(1) views of the same
pair.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave207 import _daily_ep, _SQL_MOMENTS


def engle_granger(e, p):
    """(b, gamma, tstat) over int64 daily series."""
    n = len(e)
    fn = float(n)
    sx = 0.0
    sy = 0.0
    for v in p:
        sx = sx + float(int(v))
    for v in e:
        sy = sy + float(int(v))
    mx = sx / fn
    my = sy / fn
    sxy = 0.0
    sxx = 0.0
    for a, b in zip(p, e):
        sxy = sxy + (float(int(a)) - mx) * (float(int(b)) - my)
        sxx = sxx + (float(int(a)) - mx) * (float(int(a)) - mx)
    beta = sxy / sxx
    alpha = my - beta * mx
    res = [float(int(ee)) - (alpha + beta * float(int(pp)))
           for ee, pp in zip(e, p)]
    num = 0.0
    den = 0.0
    for t in range(1, n):
        de = res[t] - res[t - 1]
        num = num + res[t - 1] * de
        den = den + res[t - 1] * res[t - 1]
    gamma = num / den
    ssq = 0.0
    for t in range(1, n):
        de = res[t] - res[t - 1]
        u = de - gamma * res[t - 1]
        ssq = ssq + u * u
    s2 = ssq / (n - 2)
    tstat = gamma / math.sqrt(s2 / den)
    return beta, gamma, tstat


# ---------------------------------------------- events_engle_granger
def _eg_query():
    def q(sf_dir: str):
        e, p = _daily_ep(sf_dir)
        beta, gamma, tstat = engle_granger(list(e), list(p))
        return pa.table({
            "beta_coint": pa.array([beta], type=pa.float64()),
            "df_gamma": pa.array([gamma], type=pa.float64()),
            "eg_tstat": pa.array([tstat], type=pa.float64()),
        })

    # reuse the wave-207 daily grid CTEs (ev/span/grid/d)
    sql = f"""
    WITH {_SQL_MOMENTS},
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(e AS DOUBLE) ORDER BY day) AS es,
               list(CAST(p AS DOUBLE) ORDER BY day) AS xs
        FROM d
    ),
    muv AS (
        SELECT n, es, xs,
               list_reduce(list_prepend(0.0e0, xs),
                   (a, v) -> a + v) / CAST(n AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0, es),
                   (a, v) -> a + v) / CAST(n AS DOUBLE) AS my
        FROM l
    ),
    ols2 AS (
        SELECT n, es, xs, mx, my,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n AS INTEGER)),
                       i -> (xs[i] - mx) * (es[i] - my))),
                   (a, v) -> a + v)
               / list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n AS INTEGER)),
                       i -> (xs[i] - mx) * (xs[i] - mx))),
                   (a, v) -> a + v) AS b
        FROM muv
    ),
    ab AS (
        SELECT n, es, xs, b, my - b * mx AS a FROM ols2
    ),
    gfold AS (
        SELECT n, es, xs, a, b,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(2,
                       CAST(n AS INTEGER)),
                       i -> (es[i - 1] - (a + b * xs[i - 1]))
                            * ((es[i] - (a + b * xs[i]))
                               - (es[i - 1]
                                  - (a + b * xs[i - 1]))))),
                   (p2, v) -> p2 + v) AS num,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(2,
                       CAST(n AS INTEGER)),
                       i -> (es[i - 1] - (a + b * xs[i - 1]))
                            * (es[i - 1]
                               - (a + b * xs[i - 1])))),
                   (p2, v) -> p2 + v) AS den
        FROM ab
    ),
    sfold AS (
        SELECT n, b, num, den, num / den AS g,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(2,
                       CAST(n AS INTEGER)),
                       i -> (((es[i] - (a + b * xs[i]))
                              - (es[i - 1]
                                 - (a + b * xs[i - 1])))
                             - (num / den)
                               * (es[i - 1]
                                  - (a + b * xs[i - 1])))
                            * (((es[i] - (a + b * xs[i]))
                                - (es[i - 1]
                                   - (a + b * xs[i - 1])))
                               - (num / den)
                                 * (es[i - 1]
                                    - (a + b
                                       * xs[i - 1]))))),
                   (p2, v) -> p2 + v) AS ssq
        FROM gfold
    )
    SELECT b AS beta_coint, g AS df_gamma,
           g / sqrt((ssq / CAST(n - 2 AS DOUBLE)) / den)
               AS eg_tstat
    FROM sfold
    """
    return q, sql


def build_wave222_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_engle_granger",) + _eg_query()))
    return queries, oracles
