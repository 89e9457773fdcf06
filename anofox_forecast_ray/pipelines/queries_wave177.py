"""Wave-177 queries: Bradley-Terry strengths, share turnover.

- supplier_bradley_terry: Bradley-Terry pairwise strengths for the
  top-8 suppliers from monthly revenue duels (the model the
  Condorcet and Elo queries bracket), fit with TEN unrolled
  minorization-maximization updates
  pi_i <- w_i / sum_j n_ij / (pi_i + pi_j), normalized each round
  by the strength SUM (folds in supplier order). The fourth
  bitwise-replayed training loop; per-supplier opponent folds walk
  j in key order.
- supplier_share_turnover: the market-turbulence index — per
  consecutive month pair, T = 0.5 * sum_s |share_t(s) -
  share_{t-1}(s)| over the top-8 suppliers. Shares are one
  division each; the |delta| fold walks suppliers in key order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

BT_TOP = 8
BT_ITERS = 10


def _monthly_rev(sf_dir: str):
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "skey": pa.array([], type=pa.int64()),
            "month": pa.array([], type=pa.int64()),
            "rev": pa.array([], type=pa.int64()),
        })
        if "l_suppkey" not in t.column_names:
            return empty
        skey = t.column("l_suppkey").cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        ship = t.column("l_shipdate").cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        month = (ship.astype("datetime64[us]")
                 .astype("datetime64[M]").astype(np.int64))
        cents = np.round(
            t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0
        ).astype(np.int64)
        key = skey * np.int64(1 << 16) + month
        uk, inv = np.unique(key, return_inverse=True)
        rv = np.bincount(inv, weights=cents.astype(
            np.float64)).astype(np.int64)
        return pa.table({
            "skey": pa.array(uk // (1 << 16)),
            "month": pa.array(uk % (1 << 16)),
            "rev": pa.array(rv),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["skey", "month"]).aggregate(
            [("rev", "sum")])
        return pa.table({
            "skey": g.column("skey").cast(pa.int64()),
            "month": g.column("month").cast(pa.int64()),
            "rev": g.column("rev_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                     "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, merge).to_pandas()


# ---------------------------------------------------- supplier_bradley_terry
def _bt_query(top_n: int = BT_TOP, iters: int = BT_ITERS):
    def q(sf_dir: str):
        cells = _monthly_rev(sf_dir)
        tot = cells.groupby("skey")["rev"].sum()
        top = sorted(
            zip(tot.to_numpy(np.int64),
                tot.index.to_numpy(np.int64)),
            key=lambda r: (-int(r[0]), int(r[1])))[:top_n]
        sup = [int(s) for _r, s in top]
        six = {s: i for i, s in enumerate(sup)}

        sub = cells[cells["skey"].isin(set(sup))]
        by_m = {}
        for _, r in sub.iterrows():
            by_m.setdefault(int(r["month"]), {})[
                int(r["skey"])] = int(r["rev"])

        k = len(sup)
        w = [[0] * k for _ in range(k)]  # w[i][j]: i beats j
        for _m, d in by_m.items():
            for i in range(k):
                for j in range(k):
                    if i != j and sup[i] in d and sup[j] in d:
                        if d[sup[i]] > d[sup[j]]:
                            w[i][j] += 1
        wi = [sum(w[i]) for i in range(k)]
        nij = [[w[i][j] + w[j][i] for j in range(k)]
               for i in range(k)]

        pi = [1.0] * k
        for _it in range(iters):
            new = [0.0] * k
            for i in range(k):
                den = 0.0
                for j in range(k):
                    if j != i and nij[i][j] > 0:
                        den = den + float(nij[i][j]) \
                            / (pi[i] + pi[j])
                new[i] = float(wi[i]) / den
            ssum = 0.0
            for i in range(k):
                ssum = ssum + new[i]
            pi = [new[i] * (float(k) / ssum)
                  for i in range(k)]
        rows = sorted(zip(sup, pi),
                      key=lambda r: (-r[1], r[0]))
        return pa.table({
            "s_suppkey": pa.array([s for s, _p in rows],
                                  type=pa.int64()),
            "strength": pa.array([p for _s, p in rows],
                                 type=pa.float64()),
        })

    layers = []
    prev = "pi0"
    for it in range(1, iters + 1):
        layers.append(f"""
    raw{it} AS MATERIALIZED (
        SELECT p.ix,
               CAST(wv.wi AS DOUBLE)
               / (SELECT list_reduce(list_prepend(0.0e0,
                      list(CAST(d.nij AS DOUBLE)
                           / (p.v + p2.v) ORDER BY d.jx)),
                      (x, y) -> x + y)
                  FROM duels d
                  JOIN {prev} p2 ON p2.ix = d.jx
                  WHERE d.ix = p.ix AND d.nij > 0) AS v
        FROM {prev} p JOIN winsum wv ON wv.ix = p.ix
    ),
    pi{it} AS MATERIALIZED (
        SELECT r.ix,
               r.v * (CAST({top_n} AS DOUBLE)
                      / (SELECT list_reduce(
                             list_prepend(0.0e0,
                                 list(v ORDER BY ix)),
                             (x, y) -> x + y)
                         FROM raw{it})) AS v
        FROM raw{it} r
    )""")
        prev = f"pi{it}"
    layers_sql = ",".join(layers)

    sql = f"""
    WITH rev AS (
        SELECT l_suppkey AS skey,
               year(l_shipdate) * 12 + month(l_shipdate)
                   AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1, 2
    ),
    top AS (
        SELECT skey,
               CAST(row_number() OVER (
                   ORDER BY tr DESC, skey ASC) - 1
                   AS BIGINT) AS ix
        FROM (SELECT skey, sum(r) AS tr FROM rev
              GROUP BY skey
              ORDER BY tr DESC, skey ASC LIMIT {top_n})
    ),
    wmat AS (
        SELECT a.ix AS ix, b.ix AS jx,
               CAST(sum(CASE WHEN ra.r > rb.r
                        THEN 1 ELSE 0 END) AS BIGINT) AS w
        FROM top a JOIN top b ON b.ix <> a.ix
        JOIN rev ra ON ra.skey = a.skey
        JOIN rev rb ON rb.skey = b.skey
                   AND rb.month = ra.month
        GROUP BY 1, 2
    ),
    duels AS (
        SELECT a.ix, a.jx, a.w + b.w AS nij
        FROM wmat a JOIN wmat b
          ON b.ix = a.jx AND b.jx = a.ix
    ),
    winsum AS (
        SELECT ix, CAST(sum(w) AS BIGINT) AS wi
        FROM wmat GROUP BY ix
    ),
    pi0 AS MATERIALIZED (
        SELECT ix, 1.0e0 AS v FROM top
    ),{layers_sql}
    SELECT top.skey AS s_suppkey,
           p.v AS strength
    FROM pi{iters} p JOIN top ON top.ix = p.ix
    ORDER BY p.v DESC, top.skey ASC
    """
    return q, sql


# -------------------------------------------------- supplier_share_turnover
def _turnover_query(top_n: int = BT_TOP):
    def q(sf_dir: str):
        cells = _monthly_rev(sf_dir)
        tot = cells.groupby("skey")["rev"].sum()
        top = sorted(
            zip(tot.to_numpy(np.int64),
                tot.index.to_numpy(np.int64)),
            key=lambda r: (-int(r[0]), int(r[1])))[:top_n]
        sup = [int(s) for _r, s in top]
        sub = cells[cells["skey"].isin(set(sup))]
        months = sorted(int(m)
                        for m in sub["month"].unique())
        by_m = {}
        for _, r in sub.iterrows():
            by_m.setdefault(int(r["month"]), {})[
                int(r["skey"])] = int(r["rev"])

        def shares(m):
            d = by_m.get(m, {})
            t = sum(d.get(s, 0) for s in sup)
            return {s: float(d.get(s, 0)) / float(t)
                    for s in sup}

        out_m, out_t = [], []
        prev = shares(months[0])
        for m in months[1:]:
            cur = shares(m)
            acc = 0.0
            for s in sorted(sup):  # fold in skey order == oracle
                dv = cur[s] - prev[s]
                acc = acc + (dv if dv >= 0.0 else -dv)
            out_m.append(m + 1970 * 12 + 1)
            out_t.append(0.5 * acc)
            prev = cur
        return pa.table({
            "month": pa.array(out_m, type=pa.int64()),
            "turnover": pa.array(out_t,
                                 type=pa.float64()),
        })

    sql = f"""
    WITH rev AS (
        SELECT l_suppkey AS skey,
               year(l_shipdate) * 12 + month(l_shipdate)
                   AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1, 2
    ),
    top AS (
        SELECT skey FROM (
            SELECT skey, sum(r) AS tr FROM rev GROUP BY skey
            ORDER BY tr DESC, skey ASC LIMIT {top_n})
    ),
    months AS (
        SELECT DISTINCT month FROM rev
        WHERE skey IN (SELECT skey FROM top)
    ),
    grid AS (
        SELECT m.month, t.skey,
               COALESCE(rev.r, 0) AS r
        FROM months m CROSS JOIN top t
        LEFT JOIN rev ON rev.month = m.month
                     AND rev.skey = t.skey
    ),
    sh AS (
        SELECT month, skey,
               CAST(r AS DOUBLE)
               / CAST((SELECT sum(r) FROM grid g2
                       WHERE g2.month = grid.month)
                      AS DOUBLE) AS s
        FROM grid
    ),
    pairs AS (
        SELECT month,
               lag(month) OVER (ORDER BY month) AS pm
        FROM months
    ),
    turn AS (
        SELECT p.month,
               0.5e0 * list_reduce(list_prepend(0.0e0,
                   list(abs(a.s - b.s) ORDER BY a.skey)),
                   (x, y) -> x + y) AS t
        FROM pairs p
        JOIN sh a ON a.month = p.month
        JOIN sh b ON b.month = p.pm AND b.skey = a.skey
        GROUP BY p.month
    )
    SELECT month, t AS turnover
    FROM turn ORDER BY month
    """
    return q, sql


def build_wave177_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("supplier_bradley_terry",) + _bt_query()))
    add(*(("supplier_share_turnover",) + _turnover_query()))
    return queries, oracles
