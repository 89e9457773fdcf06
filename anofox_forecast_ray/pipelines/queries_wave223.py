"""Wave-223 queries: transfer entropy, active information storage.

Directional information theory over the BINARY UP-MOVE chains of
the daily error (e) and purchase (p) count series (a_t = 1 iff the
count rose vs yesterday — no median selection needed, pure integer
comparisons):

- events_transfer_entropy: Schreiber's transfer entropy
  TE(P -> E) = sum_{e',e,p} n(e',e,p)/N *
  log2( n(e',e,p) n(e) / (n(e,p) n(e',e)) ) from the exact 2x2x2
  integer contingency cube — the DIRECTIONAL complement of the
  symmetric MI and the linear Granger test. One log2 per occupied
  cell (<= 8), folded in (e',e,p) order.
- events_active_info_storage: AIS = I(E_t ; E_{t-1}) =
  sum n(e',e)/N log2( n(e',e) N / (n(e') n(e)) ) from the same
  chain — how much of the next state is predictable from the
  present alone.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave207 import _daily_ep


def _upmoves(x):
    return [1 if int(x[i]) > int(x[i - 1]) else 0
            for i in range(1, len(x))]


def transfer_entropy(e, p):
    """TE(P->E) in bits from binary chains; fold in cell order."""
    a = _upmoves(e)
    b = _upmoves(p)
    n = len(a) - 1
    c3 = {}
    for t in range(n):
        k = (a[t + 1], a[t], b[t])
        c3[k] = c3.get(k, 0) + 1
    c_ep = {}
    c_ee = {}
    c_e = {}
    for (e2, e1, p1), c in c3.items():
        c_ep[(e1, p1)] = c_ep.get((e1, p1), 0) + c
        c_ee[(e2, e1)] = c_ee.get((e2, e1), 0) + c
        c_e[e1] = c_e.get(e1, 0) + c
    te = 0.0
    for k in sorted(c3):
        e2, e1, p1 = k
        c = c3[k]
        ratio = (c * c_e[e1]) / (c_ep[(e1, p1)] * c_ee[(e2, e1)])
        te = te + (c / n) * math.log2(ratio)
    return n, te


def active_info(e):
    """AIS = I(E_t; E_{t-1}) in bits."""
    a = _upmoves(e)
    n = len(a) - 1
    c2 = {}
    c_prev = {}
    c_next = {}
    for t in range(n):
        k = (a[t + 1], a[t])
        c2[k] = c2.get(k, 0) + 1
        c_prev[a[t]] = c_prev.get(a[t], 0) + 1
        c_next[a[t + 1]] = c_next.get(a[t + 1], 0) + 1
    ais = 0.0
    for k in sorted(c2):
        e2, e1 = k
        c = c2[k]
        ratio = (c * n) / (c_next[e2] * c_prev[e1])
        ais = ais + (c / n) * math.log2(ratio)
    return n, ais


_SQL_CHAIN = """
    ev AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END AS is_p
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day,
               CAST(coalesce(c.e, 0) AS BIGINT) AS e,
               CAST(coalesce(c.p, 0) AS BIGINT) AS p
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e, sum(is_p) AS p
            FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    moves AS (
        SELECT day,
               CASE WHEN e > lag(e) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS ae,
               CASE WHEN p > lag(p) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS ap,
               lag(e) OVER (ORDER BY day) AS haslag
        FROM d
    ),
    chain AS (
        SELECT row_number() OVER (ORDER BY day) AS t, ae, ap
        FROM moves WHERE haslag IS NOT NULL
    ),
    trip AS (
        SELECT b.ae AS e2, a.ae AS e1, a.ap AS p1
        FROM chain a JOIN chain b ON b.t = a.t + 1
    )
"""


# ------------------------------------------- events_transfer_entropy
def _te_query():
    def q(sf_dir: str):
        e, p = _daily_ep(sf_dir)
        n, te = transfer_entropy(list(e), list(p))
        return pa.table({
            "n_steps": pa.array([n], type=pa.int64()),
            "te_bits": pa.array([te], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_CHAIN},
    c3 AS (
        SELECT e2, e1, p1, CAST(count(*) AS BIGINT) AS c
        FROM trip GROUP BY e2, e1, p1
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c3),
    fold AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list((CAST(c AS DOUBLE)
                  / CAST((SELECT n FROM nn) AS DOUBLE))
                 * log2(CAST(c * (SELECT sum(c2.c) FROM c3 c2
                                  WHERE c2.e1 = c3.e1)
                             AS DOUBLE)
                        / CAST((SELECT sum(c2.c) FROM c3 c2
                                WHERE c2.e1 = c3.e1
                                  AND c2.p1 = c3.p1)
                               * (SELECT sum(c2.c) FROM c3 c2
                                  WHERE c2.e2 = c3.e2
                                    AND c2.e1 = c3.e1)
                               AS DOUBLE))
                 ORDER BY e2, e1, p1)), (a, x) -> a + x) AS te
        FROM c3
    )
    SELECT (SELECT n FROM nn) AS n_steps, fold.te AS te_bits
    FROM fold
    """
    return q, sql


# ----------------------------------------- events_active_info_storage
def _ais_query():
    def q(sf_dir: str):
        e, _ = _daily_ep(sf_dir)
        n, ais = active_info(list(e))
        return pa.table({
            "n_steps": pa.array([n], type=pa.int64()),
            "ais_bits": pa.array([ais], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_CHAIN},
    c2t AS (
        SELECT e2, e1, CAST(count(*) AS BIGINT) AS c
        FROM trip GROUP BY e2, e1
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2t),
    fold AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list((CAST(c AS DOUBLE)
                  / CAST((SELECT n FROM nn) AS DOUBLE))
                 * log2(CAST(c * (SELECT n FROM nn) AS DOUBLE)
                        / CAST((SELECT sum(cc.c) FROM c2t cc
                                WHERE cc.e2 = c2t.e2)
                               * (SELECT sum(cc.c) FROM c2t cc
                                  WHERE cc.e1 = c2t.e1)
                               AS DOUBLE))
                 ORDER BY e2, e1)), (a, x) -> a + x) AS ais
        FROM c2t
    )
    SELECT (SELECT n FROM nn) AS n_steps, fold.ais AS ais_bits
    FROM fold
    """
    return q, sql


def build_wave223_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_transfer_entropy",) + _te_query()))
    add(*(("events_active_info_storage",) + _ais_query()))
    return queries, oracles
