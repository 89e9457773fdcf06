"""Wave-176 queries: forecast reconciliation, OC curve.

- orders_forecast_reconciliation: the hierarchical-forecasting
  coherence problem — mean-based monthly revenue forecasts at the
  nation level aggregate BOTTOM-UP to the total, a DIRECT total
  forecast is fit at the top, and the query scores both against
  the held-out last month (absolute errors, exact integer
  actuals, one division per mean) and reports the coherence gap
  (direct minus bottom-up forecast). The structural point the
  reconciliation literature makes: the two levels disagree unless
  forecasts are reconciled; with mean forecasts over the SAME
  months the gap is exactly 0 — asserted, the floating divisions
  notwithstanding, via integer totals.
- lineitem_oc_curve: the acceptance-sampling operating-
  characteristic curve — P(accept | defect rate p) for an (n=50,
  c=2) plan over a p grid including the corpus' observed return
  rate. Each binomial CDF anchors at (1-p)^50 (one pow) and walks
  the exact-ratio pmf recurrence (wave-147/148 rule) for k <= 2.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

OC_N = 50
OC_C = 2
OC_PS = [(1, 100), (2, 100), (5, 100), (10, 100), (20, 100),
         (1, 3)]  # 1/3 ~ the observed return rate


# ------------------------------------------- orders_forecast_reconciliation
def _reconciliation_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        nat_of = dict(zip(cust["c_custkey"].astype(int),
                          cust["c_nationkey"].astype(int)))

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "nat": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            od = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            nat = np.array([nat_of[int(c)] for c in ckey],
                           dtype=np.int64)
            key = nat * np.int64(1 << 16) + month
            uk, inv = np.unique(key, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "nat": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["nat", "month"]).aggregate(
                [("cents", "sum")])
            return pa.table({
                "nat": g.column("nat").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate",
                         "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        mmax = int(cells["month"].max())
        mmin = int(cells["month"].min())
        n_train = mmax - mmin  # months before holdout

        # bottom-up: sum of per-nation train means
        bu_num = 0  # sum over nations of train totals (int)
        bu = 0.0
        for _nat, g in cells[cells["month"] < mmax].groupby(
                "nat"):
            tot = int(g["cents"].sum())
            bu_num += tot
            bu = bu + float(tot) / float(n_train)
        # direct top-level mean
        direct = float(bu_num) / float(n_train)
        actual = int(cells.loc[cells["month"] == mmax,
                               "cents"].sum())
        return pa.table({
            "n_train_months": pa.array([n_train],
                                       type=pa.int64()),
            "actual_cents": pa.array([actual],
                                     type=pa.int64()),
            "fc_bottom_up": pa.array([bu],
                                     type=pa.float64()),
            "fc_direct": pa.array([direct],
                                  type=pa.float64()),
            "abs_err_bu": pa.array(
                [abs(bu - float(actual))],
                type=pa.float64()),
            "abs_err_direct": pa.array(
                [abs(direct - float(actual))],
                type=pa.float64()),
            "coherence_gap": pa.array([direct - bu],
                                      type=pa.float64()),
        })

    sql = """
    WITH o AS (
        SELECT c.c_nationkey AS nat,
               (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS month,
               CAST(round_even(o_totalprice * 100, 0)
                    AS BIGINT) AS cents
        FROM orders
        JOIN customer c ON c.c_custkey = orders.o_custkey
    ),
    cells AS (
        SELECT nat, month,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM o GROUP BY 1, 2
    ),
    bounds AS (
        SELECT max(month) AS mmax,
               max(month) - min(month) AS n_train
        FROM cells
    ),
    bu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(tot AS DOUBLE)
                        / CAST(b.n_train AS DOUBLE)
                        ORDER BY nat)),
                   (x, y) -> x + y) AS fc,
               CAST(sum(tot) AS BIGINT) AS num
        FROM (SELECT nat, CAST(sum(cents) AS BIGINT) AS tot
              FROM cells, bounds
              WHERE month < bounds.mmax GROUP BY nat),
             bounds b
        GROUP BY b.n_train
    ),
    act AS (
        SELECT CAST(sum(cents) AS BIGINT) AS a
        FROM cells, bounds WHERE month = bounds.mmax
    )
    SELECT bounds.n_train AS n_train_months,
           act.a AS actual_cents,
           bu.fc AS fc_bottom_up,
           CAST(bu.num AS DOUBLE)
               / CAST(bounds.n_train AS DOUBLE)
               AS fc_direct,
           abs(bu.fc - CAST(act.a AS DOUBLE)) AS abs_err_bu,
           abs(CAST(bu.num AS DOUBLE)
               / CAST(bounds.n_train AS DOUBLE)
               - CAST(act.a AS DOUBLE)) AS abs_err_direct,
           CAST(bu.num AS DOUBLE)
               / CAST(bounds.n_train AS DOUBLE) - bu.fc
               AS coherence_gap
    FROM bounds CROSS JOIN bu CROSS JOIN act
    """
    return q, sql


# ----------------------------------------------------------- lineitem_oc_curve
def _oc_query(n: int = OC_N, c: int = OC_C):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "n": pa.array([], type=pa.int64()),
                "r": pa.array([], type=pa.int64()),
            })
            if "l_returnflag" not in t.column_names:
                return empty
            flag = np.asarray(
                t.column("l_returnflag").to_pylist())
            return pa.table({
                "n": pa.array([len(flag)], type=pa.int64()),
                "r": pa.array([int((flag == "R").sum())],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "n": pa.array([pc.sum(t.column("n")).as_py()],
                              type=pa.int64()),
                "r": pa.array([pc.sum(t.column("r")).as_py()],
                              type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_returnflag"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        obs_p = (float(int(a["r"].iloc[0]))
                 / float(int(a["n"].iloc[0])))

        out = {"p_num": [], "p_den": [], "p": [],
               "p_accept": []}
        for num, den in OC_PS:
            p = float(num) / float(den)
            pmf = math.pow(1.0 - p, float(n))
            acc = pmf
            for k in range(c):
                pmf = pmf * (float(n - k) / float(k + 1)) \
                    * (p / (1.0 - p))
                acc = acc + pmf
            out["p_num"].append(num)
            out["p_den"].append(den)
            out["p"].append(p)
            out["p_accept"].append(acc)
        return pa.table({
            "p_num": pa.array(out["p_num"],
                              type=pa.int64()),
            "p_den": pa.array(out["p_den"],
                              type=pa.int64()),
            "defect_p": pa.array(out["p"],
                                 type=pa.float64()),
            "p_accept": pa.array(out["p_accept"],
                                 type=pa.float64()),
            "observed_p": pa.array(
                [obs_p] * len(OC_PS), type=pa.float64()),
        })

    p_rows = ", ".join(f"({a}, {b})" for a, b in OC_PS)
    sql = f"""
    WITH obs AS (
        SELECT CAST(sum(CASE WHEN l_returnflag = 'R'
                        THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS p
        FROM lineitem
    ),
    ps AS (SELECT * FROM (VALUES {p_rows})
           AS t(p_num, p_den)),
    acc AS (
        SELECT p_num, p_den,
               CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)
                   AS p,
               list_reduce(
                   list_prepend(
                       [power(1.0e0 - CAST(p_num AS DOUBLE)
                              / CAST(p_den AS DOUBLE),
                              {float(n)!r}),
                        power(1.0e0 - CAST(p_num AS DOUBLE)
                              / CAST(p_den AS DOUBLE),
                              {float(n)!r})],
                       list_transform(
                           generate_series(0, {c - 1}),
                           k -> [CAST(k AS DOUBLE),
                                 0.0e0])),
                   (a, e) -> [
                       a[1] * (({float(n)!r} - e[1])
                               / (e[1] + 1.0e0))
                           * ((CAST(p_num AS DOUBLE)
                               / CAST(p_den AS DOUBLE))
                              / (1.0e0
                                 - CAST(p_num AS DOUBLE)
                                   / CAST(p_den
                                          AS DOUBLE))),
                       a[2] + a[1] * (({float(n)!r} - e[1])
                               / (e[1] + 1.0e0))
                           * ((CAST(p_num AS DOUBLE)
                               / CAST(p_den AS DOUBLE))
                              / (1.0e0
                                 - CAST(p_num AS DOUBLE)
                                   / CAST(p_den
                                          AS DOUBLE)))])[2]
                   AS p_accept
        FROM ps
    )
    SELECT CAST(acc.p_num AS BIGINT) AS p_num,
           CAST(acc.p_den AS BIGINT) AS p_den,
           acc.p AS defect_p,
           acc.p_accept AS p_accept,
           obs.p AS observed_p
    FROM acc CROSS JOIN obs
    ORDER BY acc.p_den, acc.p_num
    """
    return q, sql


def build_wave176_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_forecast_reconciliation",)
          + _reconciliation_query()))
    add(*(("lineitem_oc_curve",) + _oc_query()))
    return queries, oracles
