"""Wave-257 query: e-divisive energy-distance changepoint.

events_energy_changepoint: the Matteson-James (2014) e-divisive
statistic for a single changepoint in the daily error series — the
split maximizing Q(τ) = (n1·n2/n)·E(A, B) where E is the energy
distance 2·E|a−b| − E|a−a'| − E|b−b'|.  Every pairwise |·| sum is an
exact integer (SAB, SAA, SBB per split), so Q is an identical float
expression on both sides and the argmax (ties → smallest τ) is
bitwise deterministic.  The independent check exploits the 1-D
identity E(X,Y) = 2∫(F−G)²dz integrated exactly over unit steps —
a genuinely different formulation.  Complements PELT (parametric
costs) with the nonparametric energy approach.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def energy_changepoint(x):
    """(tau, n1, q_max, mean_left, mean_right) — best single split."""
    n = len(x)
    best = None
    for tau in range(1, n):
        a = x[:tau]
        b = x[tau:]
        n1, n2 = tau, n - tau
        sab = sum(abs(u - v) for u in a for v in b)
        saa = sum(abs(a[i] - a[j]) for i in range(n1)
                  for j in range(i + 1, n1))
        sbb = sum(abs(b[i] - b[j]) for i in range(n2)
                  for j in range(i + 1, n2))
        e = (2.0 * float(sab) / float(n1 * n2)
             - 2.0 * float(saa) / float(n1 * n1)
             - 2.0 * float(sbb) / float(n2 * n2))
        q = (float(n1 * n2) / float(n)) * e
        if best is None or q > best[0]:
            best = (q, tau)
    q, tau = best
    n1 = tau
    sa = sum(x[:tau])
    sb = sum(x[tau:])
    return (tau, n1, q,
            float(sa) / float(n1), float(sb) / float(n - n1))


def _energy_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        tau, n1, qmax, ml, mr = energy_changepoint(
            [int(v) for v in e])
        return pa.table({
            "tau": pa.array([tau], type=pa.int64()),
            "n_left": pa.array([n1], type=pa.int64()),
            "q_max": pa.array([qmax], type=pa.float64()),
            "mean_left": pa.array([ml], type=pa.float64()),
            "mean_right": pa.array([mr], type=pa.float64()),
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
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    prs AS (
        SELECT a.i AS i, b.i AS j, abs(a.y - b.y) AS ad
        FROM d a JOIN d b ON b.i > a.i
    ),
    taus AS (
        SELECT CAST(unnest(generate_series(1,
                   (SELECT n FROM nn) - 1)) AS BIGINT) AS tau
    ),
    sums AS (
        SELECT t.tau,
               CAST(sum(CASE WHEN p.i < t.tau AND p.j >= t.tau
                             THEN p.ad ELSE 0 END) AS BIGINT)
                   AS sab,
               CAST(sum(CASE WHEN p.j < t.tau
                             THEN p.ad ELSE 0 END) AS BIGINT)
                   AS saa,
               CAST(sum(CASE WHEN p.i >= t.tau
                             THEN p.ad ELSE 0 END) AS BIGINT)
                   AS sbb
        FROM taus t CROSS JOIN prs p
        GROUP BY t.tau
    ),
    scored AS (
        SELECT tau,
               (CAST(tau * (nn.n - tau) AS DOUBLE)
                / CAST(nn.n AS DOUBLE))
               * (2.0 * CAST(sab AS DOUBLE)
                      / CAST(tau * (nn.n - tau) AS DOUBLE)
                  - 2.0 * CAST(saa AS DOUBLE)
                        / CAST(tau * tau AS DOUBLE)
                  - 2.0 * CAST(sbb AS DOUBLE)
                        / CAST((nn.n - tau) * (nn.n - tau)
                               AS DOUBLE)) AS q
        FROM sums CROSS JOIN nn
    ),
    best AS (
        SELECT tau, q FROM scored ORDER BY q DESC, tau ASC LIMIT 1
    ),
    means AS (
        SELECT
            (SELECT CAST(sum(y) AS BIGINT) FROM d, best
             WHERE d.i < best.tau) AS sa,
            (SELECT CAST(sum(y) AS BIGINT) FROM d, best
             WHERE d.i >= best.tau) AS sb
    )
    SELECT best.tau AS tau,
           best.tau AS n_left,
           best.q AS q_max,
           CAST(means.sa AS DOUBLE) / CAST(best.tau AS DOUBLE)
               AS mean_left,
           CAST(means.sb AS DOUBLE)
               / CAST((SELECT n FROM nn) - best.tau AS DOUBLE)
               AS mean_right
    FROM best CROSS JOIN means
    """
    return q, sql


def build_wave257_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_energy_changepoint",) + _energy_query()))
    return queries, oracles
