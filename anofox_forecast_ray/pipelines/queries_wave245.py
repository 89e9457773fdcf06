"""Wave-245 queries: VaR backtesting and probabilistic-forecast CRPS.

events_kupiec_christoffersen: the two classic VaR backtests run on
daily error counts.  The first half of the day grid trains an
empirical 75%-quantile threshold (exact integer order statistic,
k = ceil(0.75 m)); the second half is scored for violations.  Kupiec
(1995) LR_pof compares the violation rate to p=0.25 and
Christoffersen (1998) LR_ind tests first-order independence from the
2x2 transition counts.  All inputs are exact integer counts; every
log term uses the 0·ln0 = 0 convention spelled as the same CASE on
both sides, so the statistic is a short identical float fold.

events_crps_climatology: mean Continuous Ranked Probability Score of
the climatological forecast — the train-half empirical distribution
scored against each test-half observation via the energy form
CRPS = E|X−y| − ½E|X−X'|.  Both expectations reduce to exact integer
sums (pairwise |X−X'| via the sorted-prefix identity
Σ_{i<j}(x_(j)−x_(i)) = Σ_k (2k−m−1)·x_(k)), leaving two float
divisions.  The independent check integrates (F(z)−H(z))² over unit
steps — a genuinely different formulation of the same functional.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

_E_GRID_CTE = f"""
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
    )
"""


def _xlnx(x: int, n: int) -> float:
    """x * ln(x/n) with the 0*ln0 = 0 convention."""
    if x == 0:
        return 0.0
    return float(x) * math.log(float(x) / float(n))


def kupiec_christoffersen(y, p_num=1, p_den=4):
    """(m_train, n_test, violations, lr_pof, lr_ind) on a half split."""
    n_all = len(y)
    m = n_all // 2
    train = sorted(y[:m])
    k = -(-3 * m // 4)  # ceil(0.75 m)
    var = train[k - 1]
    viol = [1 if v > var else 0 for v in y[m:]]
    n = len(viol)
    x = sum(viol)
    p = float(p_num) / float(p_den)
    # LR_pof = -2 [ (n-x) ln(1-p) + x ln p - (n-x) ln(1-pi) - x ln pi ]
    lr_pof = -2.0 * (float(n - x) * math.log(1.0 - p)
                     + float(x) * math.log(p)
                     - _xlnx(n - x, n) - _xlnx(x, n))
    n00 = n01 = n10 = n11 = 0
    for a, b in zip(viol[:-1], viol[1:]):
        if a == 0 and b == 0:
            n00 += 1
        elif a == 0:
            n01 += 1
        elif b == 0:
            n10 += 1
        else:
            n11 += 1
    npair = n - 1
    x1 = n01 + n11
    lr_ind = -2.0 * (_xlnx(npair - x1, npair) + _xlnx(x1, npair)
                     - _xlnx(n00, n00 + n01) - _xlnx(n01, n00 + n01)
                     - _xlnx(n10, n10 + n11) - _xlnx(n11, n10 + n11))
    return m, n, x, var, lr_pof, lr_ind


def crps_climatology(y):
    """(m_train, n_test, crps_mean) for the train-half empirical
    forecast scored on the test half (energy form, integer sums)."""
    n_all = len(y)
    m = n_all // 2
    train = sorted(y[:m])
    test = y[m:]
    n = len(test)
    # S2 = sum_{i,j} |x_i - x_j| = 2 * sum_k (2k - m - 1) x_(k), k 1-based
    s2 = 2 * sum((2 * (k + 1) - m - 1) * v for k, v in enumerate(train))
    s1_total = sum(sum(abs(xi - yt) for xi in train) for yt in test)
    fm = float(m)
    crps = (float(s1_total) / (float(n) * fm)
            - float(s2) / (2.0 * fm * fm))
    return m, n, crps


# ------------------------------------ events_kupiec_christoffersen
def _kupiec_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, n, x, var, lr_pof, lr_ind = kupiec_christoffersen(
            [int(v) for v in e])
        return pa.table({
            "n_train": pa.array([m], type=pa.int64()),
            "n_test": pa.array([n], type=pa.int64()),
            "var_threshold": pa.array([var], type=pa.int64()),
            "violations": pa.array([x], type=pa.int64()),
            "lr_pof": pa.array([lr_pof], type=pa.float64()),
            "lr_ind": pa.array([lr_ind], type=pa.float64()),
        })

    xlnx = ("CASE WHEN {x} = 0 THEN 0.0 ELSE CAST({x} AS DOUBLE) "
            "* ln(CAST({x} AS DOUBLE) / CAST({n} AS DOUBLE)) END")
    sql = _E_GRID_CTE + f""",
    thr AS (
        SELECT y AS var FROM train ORDER BY y
        LIMIT 1 OFFSET ((3 * (SELECT m FROM m) + 3) // 4 - 1)
    ),
    viol AS (
        SELECT idx,
               CASE WHEN y > (SELECT var FROM thr) THEN 1 ELSE 0 END
                   AS v
        FROM test
    ),
    trans AS (
        SELECT v, lead(v) OVER (ORDER BY idx) AS w FROM viol
    ),
    cnt AS (
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM viol) AS n,
            (SELECT CAST(sum(v) AS BIGINT) FROM viol) AS x,
            CAST(sum(CASE WHEN v = 0 AND w = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n00,
            CAST(sum(CASE WHEN v = 0 AND w = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n01,
            CAST(sum(CASE WHEN v = 1 AND w = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n10,
            CAST(sum(CASE WHEN v = 1 AND w = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n11
        FROM trans WHERE w IS NOT NULL
    )
    SELECT (SELECT CAST(m AS BIGINT) FROM m) AS n_train,
           n AS n_test,
           (SELECT CAST(var AS BIGINT) FROM thr) AS var_threshold,
           x AS violations,
           -2.0 * (CAST(n - x AS DOUBLE) * ln(1.0 - 0.25)
                   + CAST(x AS DOUBLE) * ln(0.25)
                   - {xlnx.format(x='(n - x)', n='n')}
                   - {xlnx.format(x='x', n='n')}) AS lr_pof,
           -2.0 * ({xlnx.format(x='(n - 1 - n01 - n11)', n='(n - 1)')}
                   + {xlnx.format(x='(n01 + n11)', n='(n - 1)')}
                   - {xlnx.format(x='n00', n='(n00 + n01)')}
                   - {xlnx.format(x='n01', n='(n00 + n01)')}
                   - {xlnx.format(x='n10', n='(n10 + n11)')}
                   - {xlnx.format(x='n11', n='(n10 + n11)')})
               AS lr_ind
    FROM cnt
    """
    return q, sql


# ---------------------------------------- events_crps_climatology
def _crps_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, n, crps = crps_climatology([int(v) for v in e])
        return pa.table({
            "n_train": pa.array([m], type=pa.int64()),
            "n_test": pa.array([n], type=pa.int64()),
            "crps_mean": pa.array([crps], type=pa.float64()),
        })

    sql = _E_GRID_CTE + """,
    tr AS (
        SELECT y, CAST(row_number() OVER (ORDER BY y) AS BIGINT)
                   AS k
        FROM train
    ),
    s2 AS (
        SELECT 2 * CAST(sum((2 * k - (SELECT m FROM m) - 1) * y)
                        AS BIGINT) AS s2
        FROM tr
    ),
    s1 AS (
        SELECT CAST(sum(abs(t.y - te.y)) AS BIGINT) AS s1,
               CAST(count(DISTINCT te.idx) AS BIGINT) AS n
        FROM test te CROSS JOIN train t
    )
    SELECT (SELECT CAST(m AS BIGINT) FROM m) AS n_train,
           n AS n_test,
           CAST(s1 AS DOUBLE)
           / (CAST(n AS DOUBLE)
              * CAST((SELECT m FROM m) AS DOUBLE))
           - CAST((SELECT s2 FROM s2) AS DOUBLE)
             / (2.0 * CAST((SELECT m FROM m) AS DOUBLE)
                * CAST((SELECT m FROM m) AS DOUBLE)) AS crps_mean
    FROM s1
    """
    return q, sql


def build_wave245_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_kupiec_christoffersen",) + _kupiec_query()))
    add(*(("events_crps_climatology",) + _crps_query()))
    return queries, oracles
