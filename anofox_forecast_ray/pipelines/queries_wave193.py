"""Wave-193 queries: (s,S) inventory replay, Wagner-Whitin DP.

Operations-research completion over the exact integer monthly demand
series (sum of rounded l_quantity per ship month):

- lineitem_ss_policy: replay a periodic-review order-up-to (s, S)
  policy with zero lead time: each month demand is drawn down, a
  month ending negative is a stockout, and when on-hand falls below
  s the position is restored to S. s = mean monthly demand (integer
  floor division), S = 2s. The whole replay is a 4-slot integer
  fold [stock, n_orders, ordered, stockouts] — bit-exact by
  construction.
- lineitem_wagner_whitin: the Wagner-Whitin dynamic lot-sizing DP —
  f(t) = min_{j<=t} f(j-1) + K + h * sum_{i=j..t} (i-j) d_i with
  setup K=1000 and holding h=1 — computed via prefix sums
  P_i = sum d, Q_i = sum i*d so each candidate cost is O(1):
  cost(j,t) = f(j-1) + K + h*((Q_t - Q_{j-1}) - j*(P_t - P_{j-1})).
  The DP is a history-growing integer fold whose inner minimization
  is an integer list min — no float ever enters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries_wave191 import _monthly_cents  # noqa: F401 (pattern ref)
from .queries import _num_read_blocks
from ._scaffold import read_cols

WW_K = 1000
WW_H = 1


def _monthly_qty(sf_dir: str):
    """(month_index_0based sorted, qty int64) monthly demand."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        month = (ship.astype("datetime64[us]")
                 .astype("datetime64[M]").astype(np.int64))
        qty = np.round(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        uk, inv = np.unique(month, return_inverse=True)
        qs = np.bincount(inv, weights=qty.astype(
            np.float64)).astype(np.int64)
        return pa.table({"month": pa.array(uk),
                         "qty": pa.array(qs)})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("month").aggregate([("qty", "sum")])
        return pa.table({
            "month": g.column("month").cast(pa.int64()),
            "qty": g.column("qty_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "lineitem", ["l_shipdate", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    m = tree_reduce_tables(refs, merge).to_pandas()
    m = m.sort_values("month").reset_index(drop=True)
    return m["qty"].to_numpy(np.int64)


def ss_replay(d: np.ndarray, s: int, big_s: int):
    """(n_orders, total_ordered, n_stockouts, stock_end) ints."""
    stock = big_s
    n_orders = 0
    ordered = 0
    stockouts = 0
    for dv in d:
        stock -= int(dv)
        if stock < 0:
            stockouts += 1
        if stock < s:
            ordered += big_s - stock
            n_orders += 1
            stock = big_s
    return n_orders, ordered, stockouts, stock


def wagner_whitin(d: np.ndarray, K: int = WW_K, h: int = WW_H):
    """Exact integer DP; returns list of f values (f[0] = 0)."""
    T = d.size
    P = np.concatenate(([0], np.cumsum(d))).astype(object)
    i = np.arange(1, T + 1, dtype=np.int64)
    Q = np.concatenate(([0], np.cumsum(i * d))).astype(object)
    f = [0]
    for t in range(1, T + 1):
        best = None
        for j in range(1, t + 1):
            cost = (f[j - 1] + K
                    + h * ((int(Q[t]) - int(Q[j - 1]))
                           - j * (int(P[t]) - int(P[j - 1]))))
            if best is None or cost < best:
                best = cost
        f.append(best)
    return f


# ------------------------------------------------- lineitem_ss_policy
def _ss_query():
    def q(sf_dir: str):
        d = _monthly_qty(sf_dir)
        total = int(d.sum())
        n = int(d.size)
        s = total // n
        big_s = 2 * s
        n_orders, ordered, stockouts, stock = ss_replay(d, s, big_s)
        return pa.table({
            "s_level": pa.array([s], type=pa.int64()),
            "big_s": pa.array([big_s], type=pa.int64()),
            "n_orders": pa.array([n_orders], type=pa.int64()),
            "total_ordered": pa.array([ordered], type=pa.int64()),
            "n_stockouts": pa.array([stockouts], type=pa.int64()),
            "stock_end": pa.array([stock], type=pa.int64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS d
        FROM lineitem GROUP BY 1
    ),
    lvl AS (
        SELECT CAST(sum(d) // count(*) AS BIGINT) AS s,
               CAST(2 * (sum(d) // count(*)) AS BIGINT) AS ss
        FROM mm
    ),
    fold AS (
        SELECT list_reduce(
                   list_prepend(
                       [CAST((SELECT ss FROM lvl) AS DOUBLE),
                        0.0e0, 0.0e0, 0.0e0],
                       (SELECT list([CAST(d AS DOUBLE),
                                     CAST(lvl.s AS DOUBLE),
                                     CAST(lvl.ss AS DOUBLE)]
                                    ORDER BY month)
                        FROM mm CROSS JOIN lvl)),
                   (acc, e) -> [
                       CASE WHEN acc[1] - e[1] < e[2]
                            THEN e[3] ELSE acc[1] - e[1] END,
                       acc[2] + CASE WHEN acc[1] - e[1] < e[2]
                                     THEN 1.0e0 ELSE 0.0e0 END,
                       acc[3] + CASE WHEN acc[1] - e[1] < e[2]
                                     THEN e[3] - (acc[1] - e[1])
                                     ELSE 0.0e0 END,
                       acc[4] + CASE WHEN acc[1] - e[1] < 0.0e0
                                     THEN 1.0e0 ELSE 0.0e0 END])
                   AS a
        FROM (SELECT 1)
    )
    SELECT (SELECT s FROM lvl) AS s_level,
           (SELECT ss FROM lvl) AS big_s,
           CAST(a[2] AS BIGINT) AS n_orders,
           CAST(a[3] AS BIGINT) AS total_ordered,
           CAST(a[4] AS BIGINT) AS n_stockouts,
           CAST(a[1] AS BIGINT) AS stock_end
    FROM fold
    """
    return q, sql


# -------------------------------------------- lineitem_wagner_whitin
def _ww_query():
    def q(sf_dir: str):
        d = _monthly_qty(sf_dir)
        f = wagner_whitin(d)
        T = d.size
        return pa.table({
            "n_months": pa.array([T], type=pa.int64()),
            "total_cost": pa.array([int(f[T])], type=pa.int64()),
            "cost_mid": pa.array([int(f[T // 2])],
                                 type=pa.int64()),
        })

    sql = f"""
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS d
        FROM lineitem GROUP BY 1
    ),
    idx AS (
        SELECT row_number() OVER (ORDER BY month) AS i, d
        FROM mm
    ),
    pref AS (
        SELECT i,
               CAST(sum(d) OVER (ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
               CAST(sum(i * d) OVER (ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS qq
        FROM idx
    ),
    lists AS (
        SELECT CAST(count(*) AS BIGINT) AS t_n,
               list_prepend(CAST(0 AS BIGINT),
                   list(p ORDER BY i)) AS ps,
               list_prepend(CAST(0 AS BIGINT),
                   list(qq ORDER BY i)) AS qs
        FROM pref
    ),
    dp AS (
        SELECT t_n,
               list_reduce(
                   list_prepend([CAST(0 AS BIGINT)],
                       list_transform(generate_series(1,
                           CAST(t_n AS INTEGER)),
                           t -> [CAST(t AS BIGINT)])),
                   (acc, e) -> list_concat(acc, [
                       list_aggregate(
                           list_transform(generate_series(1,
                               CAST(e[1] AS INTEGER)),
                               j -> acc[j] + {WW_K}
                                    + {WW_H} * ((qs[CAST(e[1]
                                          AS INTEGER) + 1]
                                        - qs[j])
                                       - j * (ps[CAST(e[1]
                                             AS INTEGER) + 1]
                                          - ps[j]))),
                           'min')])) AS f
        FROM lists
    )
    SELECT t_n AS n_months,
           f[CAST(t_n AS INTEGER) + 1] AS total_cost,
           f[CAST(t_n // 2 AS INTEGER) + 1] AS cost_mid
    FROM dp
    """
    return q, sql


def build_wave193_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_ss_policy",) + _ss_query()))
    add(*(("lineitem_wagner_whitin",) + _ww_query()))
    return queries, oracles
