"""Wave-169 queries: p-chart control limits, lognormal fit.

- lineitem_p_chart: the attribute control chart (p-chart) for the
  monthly RETURN RATE — center line p-bar from exact integer
  totals, per-month 3-sigma limits p-bar +/- 3 sqrt(p-bar
  (1-p-bar)/n_t) (variable subgroup sizes), and the out-of-control
  flag per month. Completes the SPC family next to the EWMA and
  CUSUM charts.
- orders_lognormal_fit: method-of-moments lognormal fit to monthly
  revenue — sigma^2 = ln(1 + CV^2), mu = ln(mean) - sigma^2/2 from
  exact integer moments (two scalar lns), plus the implied median
  exp(mu) and mode exp(mu - sigma^2) against the observed exact
  median (order statistic).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


# ------------------------------------------------------- lineitem_p_chart
def _p_chart_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "r": pa.array([], type=pa.int64()),
            })
            if "l_shipdate" not in t.column_names:
                return empty
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            flag = np.asarray(
                t.column("l_returnflag").to_pylist())
            isr = (flag == "R").astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size)
            rr = np.bincount(inv[isr == 1],
                             minlength=uk.size)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "r": pa.array(rr.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("n", "sum"), ("r", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "r": g.column("r_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas()
        mm = mm.sort_values("month").reset_index(drop=True)
        n_tot = int(mm["n"].sum())
        r_tot = int(mm["r"].sum())
        pbar = float(r_tot) / float(n_tot)

        out = {"month": [], "n": [], "p": [], "ucl": [],
               "lcl": [], "ooc": []}
        for _, r in mm.iterrows():
            n = int(r["n"])
            p = float(int(r["r"])) / float(n)
            se = math.sqrt(pbar * (1.0 - pbar) / float(n))
            ucl = pbar + 3.0 * se
            lcl = pbar - 3.0 * se
            ooc = 1 if (p > ucl or p < lcl) else 0
            out["month"].append(int(r["month"]))
            out["n"].append(n)
            out["p"].append(p)
            out["ucl"].append(ucl)
            out["lcl"].append(lcl)
            out["ooc"].append(ooc)
        return pa.table({
            "month": pa.array(out["month"],
                              type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
            "p_hat": pa.array(out["p"], type=pa.float64()),
            "ucl": pa.array(out["ucl"], type=pa.float64()),
            "lcl": pa.array(out["lcl"], type=pa.float64()),
            "out_of_control": pa.array(out["ooc"],
                                       type=pa.int64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                        THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ),
    pb AS (
        SELECT CAST(sum(r) AS DOUBLE)
                   / CAST(sum(n) AS DOUBLE) AS pbar
        FROM mm
    )
    SELECT mm.month AS month,
           mm.n AS n,
           CAST(mm.r AS DOUBLE) / CAST(mm.n AS DOUBLE)
               AS p_hat,
           pb.pbar + 3.0e0 * sqrt(pb.pbar * (1.0e0 - pb.pbar)
                                  / CAST(mm.n AS DOUBLE))
               AS ucl,
           pb.pbar - 3.0e0 * sqrt(pb.pbar * (1.0e0 - pb.pbar)
                                  / CAST(mm.n AS DOUBLE))
               AS lcl,
           CAST(CASE WHEN
               CAST(mm.r AS DOUBLE) / CAST(mm.n AS DOUBLE)
               > pb.pbar + 3.0e0 * sqrt(pb.pbar
                   * (1.0e0 - pb.pbar)
                   / CAST(mm.n AS DOUBLE))
               OR CAST(mm.r AS DOUBLE) / CAST(mm.n AS DOUBLE)
               < pb.pbar - 3.0e0 * sqrt(pb.pbar
                   * (1.0e0 - pb.pbar)
                   / CAST(mm.n AS DOUBLE))
               THEN 1 ELSE 0 END AS BIGINT)
               AS out_of_control
    FROM mm CROSS JOIN pb
    ORDER BY mm.month
    """
    return q, sql


# --------------------------------------------------- orders_lognormal_fit
def _lognormal_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "o_orderdate" not in t.column_names:
                return empty
            od = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas()
        xs = sorted(int(v) for v in mm["cents"])
        k = len(xs)
        kf = float(k)
        s = sum(xs)
        ss = sum(v * v for v in xs)
        mean = float(s) / kf
        var = (float(ss) - (float(s) * float(s)) / kf) / kf
        cv2 = var / (mean * mean)
        sig2 = math.log(1.0 + cv2)
        mu = math.log(mean) - sig2 / 2.0
        med_impl = math.exp(mu)
        mode_impl = math.exp(mu - sig2)
        kq = (k + 1) // 2
        med_obs = xs[kq - 1]
        return pa.table({
            "n_months": pa.array([k], type=pa.int64()),
            "mu": pa.array([mu], type=pa.float64()),
            "sigma2": pa.array([sig2], type=pa.float64()),
            "median_implied": pa.array([med_impl],
                                       type=pa.float64()),
            "mode_implied": pa.array([mode_impl],
                                     type=pa.float64()),
            "median_observed": pa.array([med_obs],
                                        type=pa.int64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS m,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(cents AS HUGEINT) * cents)
                    AS HUGEINT) AS ss
        FROM mm
    ),
    par AS (
        SELECT k,
               ln(1.0e0 + ((CAST(ss AS DOUBLE)
                            - (CAST(s AS DOUBLE)
                               * CAST(s AS DOUBLE))
                              / CAST(k AS DOUBLE))
                           / CAST(k AS DOUBLE))
                          / ((CAST(s AS DOUBLE)
                              / CAST(k AS DOUBLE))
                             * (CAST(s AS DOUBLE)
                                / CAST(k AS DOUBLE))))
                   AS sig2,
               ln(CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                   AS lnmean
        FROM agg
    ),
    med AS (
        SELECT cents AS m FROM (
            SELECT cents, row_number() OVER (ORDER BY cents)
                   AS rk FROM mm), agg
        WHERE rk = (agg.k + 1) // 2
    )
    SELECT par.k AS n_months,
           par.lnmean - par.sig2 / 2.0e0 AS mu,
           par.sig2 AS sigma2,
           exp(par.lnmean - par.sig2 / 2.0e0)
               AS median_implied,
           exp((par.lnmean - par.sig2 / 2.0e0) - par.sig2)
               AS mode_implied,
           med.m AS median_observed
    FROM par CROSS JOIN med
    """
    return q, sql


def build_wave169_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_p_chart",) + _p_chart_query()))
    add(*(("orders_lognormal_fit",) + _lognormal_query()))
    return queries, oracles
