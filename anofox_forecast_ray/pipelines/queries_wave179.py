"""Wave-179 queries: Weibull probability plot, Wright's law.

- events_weibull_plot: the reliability-engineering Weibull fit by
  median-rank regression — time-to-first-error durations (event
  users only; censoring handled by the KM/NA queries, documented),
  Benard's median ranks F_i = (i - 0.3)/(n + 0.4), and OLS of
  ln(-ln(1 - F_i)) on ln(t_i) giving the shape beta and scale eta
  = exp(-a/b). Ranks are exact; two scalar lns per point; folds in
  rank order. beta < 1 means infant-mortality hazard.
- lineitem_wrights_law: Wright's learning curve — ln(cumulative
  average unit price) against ln(cumulative quantity) at each
  month boundary, slope b and learning rate 2^b. Cumulative sums
  are exact integers (window SUMs); one division + two lns per
  month point; the flat synthetic prices make b ~ 0, the designed
  null.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


# -------------------------------------------------------- events_weibull_plot
def _weibull_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def surv(g: pa.Table) -> pa.Table:
            # per-user min / min-error via reduceat (+inf masking) —
            # exact int replacement of the Counter loop
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            order = np.argsort(u, kind="stable")
            u_s, t_s, e_s = u[order], tus[order], is_err[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            t0 = np.minimum.reduceat(t_s, starts)
            BIG = np.int64(1) << 62
            emin = np.minimum.reduceat(
                np.where(e_s, t_s, BIG), starts
            )
            has = emin < BIG
            dur = (emin[has] - t0[has]) // US_PER_HOUR + 1
            ud, uc = np.unique(dur, return_counts=True)
            return pa.table({
                "dur": pa.array(ud, type=pa.int64()),
                "c": pa.array(uc.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("dur").aggregate([("c", "sum")])
            return pa.table({
                "dur": g.column("dur").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket,
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(surv, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("dur").reset_index(drop=True)
        n = int(h["c"].sum())
        nf = float(n)

        # expand ranks per distinct duration
        xs = []
        ys = []
        i = 0
        for _, r in h.iterrows():
            dur = int(r["dur"])
            for _k in range(int(r["c"])):
                i += 1
                f = (float(i) - 0.3) / (nf + 0.4)
                xs.append(math.log(float(dur)))
                ys.append(math.log(-math.log(1.0 - f)))
        kf = float(n)
        sx = sy = 0.0
        for v in xs:
            sx = sx + v
        for v in ys:
            sy = sy + v
        mx = sx / kf
        my = sy / kf
        sxy = sxx = 0.0
        for a, b in zip(xs, ys):
            sxy = sxy + (a - mx) * (b - my)
            sxx = sxx + (a - mx) * (a - mx)
        beta = sxy / sxx
        a0 = my - beta * mx
        eta = math.exp(-a0 / beta)
        return pa.table({
            "n_events": pa.array([n], type=pa.int64()),
            "shape_beta": pa.array([beta],
                                   type=pa.float64()),
            "scale_eta_h": pa.array([eta],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH peru AS (
        SELECT user_id,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'error'
                   THEN epoch_us(ts) END) AS te
        FROM events GROUP BY user_id
    ),
    durs AS (
        SELECT (te - t0) // {US_PER_HOUR} + 1 AS dur
        FROM peru WHERE te IS NOT NULL
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) AS DOUBLE) AS nf FROM durs),
    rk AS (
        SELECT dur,
               CAST(row_number() OVER (ORDER BY dur)
                    AS BIGINT) AS i
        FROM durs
    ),
    pts AS (
        SELECT i,
               ln(CAST(dur AS DOUBLE)) AS x,
               ln(-ln(1.0e0 - (CAST(i AS DOUBLE) - 0.3e0)
                      / (nn.nf + 0.4e0))) AS y
        FROM rk CROSS JOIN nn
    ),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(x ORDER BY i)), (p, v) -> p + v)
                   / (SELECT nf FROM nn) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY i)), (p, v) -> p + v)
                   / (SELECT nf FROM nn) AS my
        FROM pts
    ),
    folds AS (
        SELECT mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list((x - mu.mx) * (y - mu.my)
                        ORDER BY i)), (p, v) -> p + v)
                   AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list((x - mu.mx) * (x - mu.mx)
                        ORDER BY i)), (p, v) -> p + v)
                   AS sxx
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    )
    SELECT (SELECT n FROM nn) AS n_events,
           sxy / sxx AS shape_beta,
           exp(-(my - (sxy / sxx) * mx) / (sxy / sxx))
               AS scale_eta_h
    FROM folds
    """
    return q, sql


# -------------------------------------------------------- lineitem_wrights_law
def _wright_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "qty": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "l_shipdate" not in t.column_names:
                return empty
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            qs = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "qty": pa.array(qs),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("qty", "sum"), ("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "qty": g.column("qty_sum").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_quantity",
                         "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas()
        mm = mm.sort_values("month").reset_index(drop=True)
        cq = 0
        cc = 0
        xs = []
        ys = []
        for _, r in mm.iterrows():
            cq += int(r["qty"])
            cc += int(r["cents"])
            xs.append(math.log(float(cq)))
            ys.append(math.log(float(cc) / float(cq)))
        k = len(xs)
        kf = float(k)
        sx = sy = 0.0
        for v in xs:
            sx = sx + v
        for v in ys:
            sy = sy + v
        mx = sx / kf
        my = sy / kf
        sxy = sxx = 0.0
        for a, b in zip(xs, ys):
            sxy = sxy + (a - mx) * (b - my)
            sxx = sxx + (a - mx) * (a - mx)
        b = sxy / sxx
        lr = math.pow(2.0, b)
        return pa.table({
            "n_months": pa.array([k], type=pa.int64()),
            "slope_b": pa.array([b], type=pa.float64()),
            "learning_rate": pa.array([lr],
                                      type=pa.float64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(round_even(l_extendedprice
                             * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT month,
               CAST(sum(qty) OVER (ORDER BY month
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cq,
               CAST(sum(cents) OVER (ORDER BY month
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cc
        FROM mm
    ),
    pts AS (
        SELECT month,
               ln(CAST(cq AS DOUBLE)) AS x,
               ln(CAST(cc AS DOUBLE) / CAST(cq AS DOUBLE))
                   AS y
        FROM cum
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(count(*) AS DOUBLE) AS kf FROM pts),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(x ORDER BY month)), (p, v) -> p + v)
                   / (SELECT kf FROM nn) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY month)), (p, v) -> p + v)
                   / (SELECT kf FROM nn) AS my
        FROM pts
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((x - mu.mx) * (y - mu.my)
                     ORDER BY month)), (p, v) -> p + v)
                AS sxy,
            list_reduce(list_prepend(0.0e0,
                list((x - mu.mx) * (x - mu.mx)
                     ORDER BY month)), (p, v) -> p + v)
                AS sxx
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    )
    SELECT (SELECT k FROM nn) AS n_months,
           sxy / sxx AS slope_b,
           power(2.0e0, sxy / sxx) AS learning_rate
    FROM folds
    """
    return q, sql


def build_wave179_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_weibull_plot",) + _weibull_query()))
    add(*(("lineitem_wrights_law",) + _wright_query()))
    return queries, oracles
