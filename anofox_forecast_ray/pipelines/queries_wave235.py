"""Wave-235 query: dominant autocovariance mode (SSA-style).

events_toeplitz_power: the leading eigenpair of the 8x8 Toeplitz
autocovariance matrix C_ij = gamma(|i-j|) of the daily error
series — the rank-1 singular-spectrum-analysis view of "what shape
dominates an 8-day window". gamma(h) are centered folds in day
order; K = 6 synchronous power iterations with L1 (sum of abs)
normalization — no sqrt, every step a short fold in component
order, unrolled identically on both engines (C is PSD so the
dominant eigenvalue equals the converged L1 gain). Emits lambda1
and the first eigenvector component.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries_wave207 import _daily_ep

TP_L = 8
TP_K = 6


def gammas(x, L: int = TP_L):
    """Biased autocovariances gamma(0..L-1); folds in t order."""
    n = len(x)
    s = 0
    for v in x:
        s += int(v)
    mu = s / n
    out = []
    for h in range(L):
        acc = 0.0
        for t in range(n - h):
            acc = acc + (x[t] - mu) * (x[t + h] - mu)
        out.append(acc / n)
    return out


def toeplitz_power(x, L: int = TP_L, K: int = TP_K):
    """(lambda1, v_first) via L1-normalized power iteration."""
    g = gammas(x, L)
    v = [1.0e0 / L] * L
    lam = 0.0
    for _ in range(K):
        w = []
        for i in range(L):
            s = 0.0
            for j in range(L):
                s = s + g[abs(i - j)] * v[j]
            w.append(s)
        norm = 0.0
        for c in w:
            norm = norm + abs(c)
        v = [c / norm for c in w]
        lam = norm
    return lam, v[0]


# ------------------------------------------------ events_toeplitz_power
def _tp_query():
    def q(sf_dir: str):
        e, _ = _daily_ep(sf_dir)
        lam, v0 = toeplitz_power([int(v) for v in e])
        return pa.table({
            "lambda1": pa.array([lam], type=pa.float64()),
            "v_first": pa.array([v0], type=pa.float64()),
        })

    US_PER_DAY = 86_400_000_000
    # gamma CTE: one centered fold per lag
    gamma_cols = ",\n".join(f"""
        list_reduce(list_prepend(0.0e0,
            list_transform(generate_series(1,
                CAST(n - {h} AS INTEGER)),
                t -> (ys[t] - mu) * (ys[t + {h}] - mu))),
            (a, v) -> a + v) / CAST(n AS DOUBLE) AS g{h}"""
                            for h in range(TP_L))
    # unrolled power iterations
    layers = [("v0 AS MATERIALIZED (SELECT "
               + ", ".join(f"1.0e0 / {TP_L}.0e0 AS c{i}"
                           for i in range(TP_L))
               + " FROM (SELECT 1))")]
    prev = "v0"
    for it in range(1, TP_K + 1):
        comps = []
        for i in range(TP_L):
            terms = " + ".join(
                f"gm.g{abs(i - j)} * {prev}.c{j}"
                for j in range(TP_L))
            comps.append(f"({terms}) AS w{i}")
        norm = " + ".join(f"abs(w{i})" for i in range(TP_L))
        layers.append(f"""
    r{it} AS MATERIALIZED (
        SELECT {", ".join(comps)}
        FROM {prev} CROSS JOIN gm
    ),
    v{it} AS MATERIALIZED (
        SELECT {", ".join(
            f"w{i} / ({norm}) AS c{i}" for i in range(TP_L))},
               ({norm}) AS lam
        FROM r{it}
    )""")
        prev = f"v{it}"

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
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s1,
               list(CAST(x AS DOUBLE) ORDER BY day) AS ys
        FROM d
    ),
    lm AS (
        SELECT n, ys,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu
        FROM l
    ),
    gm AS (
        SELECT {gamma_cols}
        FROM lm
    ),
    {",".join(layers)}
    SELECT {prev}.lam AS lambda1, {prev}.c0 AS v_first
    FROM {prev}
    """
    return q, sql


def build_wave235_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_toeplitz_power",) + _tp_query()))
    return queries, oracles
