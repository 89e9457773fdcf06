"""Wave-186 queries: regression discontinuity, Wald IV estimator.

- events_rdd_noon: sharp regression-discontinuity design on the
  hour-of-day running variable with cutoff 12 and bandwidth 6: fit a
  separate OLS line to the hourly error RATE on each side (x = hour
  - 12, six binned points per side) and report the jump = right
  intercept - left intercept at the cutoff — the local-linear RDD
  estimator on binned data. Rates are single divisions of exact
  ints; OLS folds run in hour order on both sides.
- orders_wald_iv: the Wald instrumental-variable estimator — the
  simplest 2SLS — of the effect of URGENT/HIGH priority (treatment)
  on order value (outcome, exact cents), instrumented by the
  weekend dummy of the order date (dow from pure integer epoch-day
  math, (day+4)%7 in {6,0}): Wald = (Ybar1 - Ybar0)/(Xbar1 - Xbar0).
  Four single divisions of int64 sums, one final division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def rdd_side(x: np.ndarray, y: np.ndarray):
    """(intercept, slope) OLS with sequential folds in given order."""
    n = x.size
    sx = 0.0
    sy = 0.0
    for v in x:
        sx = sx + float(v)
    for v in y:
        sy = sy + float(v)
    mx = sx / n
    my = sy / n
    sxy = 0.0
    sxx = 0.0
    for a, b in zip(x, y):
        sxy = sxy + (float(a) - mx) * (b - my)
        sxx = sxx + (float(a) - mx) * (float(a) - mx)
    slope = sxy / sxx
    return my - slope * mx, slope


# --------------------------------------------------------- events_rdd_noon
def _rdd_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error").astype(np.int64)
            n = np.bincount(hod, minlength=24).astype(np.int64)
            r = np.bincount(hod, weights=err.astype(np.float64),
                            minlength=24).astype(np.int64)
            return pa.table({
                "k": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(n), "r": pa.array(r),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate(
                [("n", "sum"), ("r", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "r": g.column("r_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("k").reset_index(drop=True)
        n = h["n"].to_numpy(np.int64)
        r = h["r"].to_numpy(np.int64)
        ks = h["k"].to_numpy(np.int64)
        rate = np.array([int(r[i]) / int(n[i]) for i in range(24)])
        left = (ks >= 6) & (ks <= 11)
        right = (ks >= 12) & (ks <= 17)
        xl = (ks[left] - 12).astype(np.int64)
        xr = (ks[right] - 12).astype(np.int64)
        al, bl = rdd_side(xl, rate[left])
        ar, br = rdd_side(xr, rate[right])
        return pa.table({
            "icept_left": pa.array([al], type=pa.float64()),
            "icept_right": pa.array([ar], type=pa.float64()),
            "rdd_jump": pa.array([ar - al], type=pa.float64()),
        })

    def side_sql(lo: int, hi: int, alias: str) -> str:
        return f"""
    {alias} AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(k - 12 AS DOUBLE) ORDER BY k)),
                (p, v) -> p + v) / 6.0e0 AS mx,
            list_reduce(list_prepend(0.0e0,
                list(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                     ORDER BY k)), (p, v) -> p + v) / 6.0e0 AS my,
            list(CAST(k - 12 AS DOUBLE) ORDER BY k) AS xs,
            list(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                 ORDER BY k) AS ys
        FROM h WHERE k >= {lo} AND k <= {hi}
    ),
    {alias}b AS (
        SELECT
            my - (
                list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1, 6),
                        i -> (xs[i] - mx) * (ys[i] - my))),
                    (p, v) -> p + v)
                / list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1, 6),
                        i -> (xs[i] - mx) * (xs[i] - mx))),
                    (p, v) -> p + v)
            ) * mx AS icept
        FROM {alias}
    )"""

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS k,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    h AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(is_err) AS BIGINT) AS r
        FROM e GROUP BY k
    ),
    {side_sql(6, 11, "lft")},
    {side_sql(12, 17, "rgt")}
    SELECT lftb.icept AS icept_left,
           rgtb.icept AS icept_right,
           rgtb.icept - lftb.icept AS rdd_jump
    FROM lftb CROSS JOIN rgtb
    """
    return q, sql


# ----------------------------------------------------------- orders_wald_iv
def _wald_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            day = (t.column("o_orderdate").cast(pa.int64())
                   .to_numpy(zero_copy_only=False) // US_PER_DAY)
            dow = (day + 4) % 7
            z = ((dow == 6) | (dow == 0)).astype(np.int64)
            pr = np.asarray(
                t.column("o_orderpriority").to_pylist())
            x = ((pr == "1-URGENT") | (pr == "2-HIGH")).astype(
                np.int64)
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            rows = {"z": [], "n": [], "sx": [], "sy": []}
            for zz in (0, 1):
                m = z == zz
                rows["z"].append(zz)
                rows["n"].append(int(m.sum()))
                rows["sx"].append(int(x[m].sum()))
                rows["sy"].append(int(cents[m].sum()))
            return pa.table({k: pa.array(v, type=pa.int64())
                             for k, v in rows.items()})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("z").aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum")])
            return pa.table({
                "z": g.column("z").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "sx": g.column("sx_sum").cast(pa.int64()),
                "sy": g.column("sy_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                         "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.set_index("z")
        n1, n0 = int(m.loc[1, "n"]), int(m.loc[0, "n"])
        y1 = int(m.loc[1, "sy"]) / n1
        y0 = int(m.loc[0, "sy"]) / n0
        x1 = int(m.loc[1, "sx"]) / n1
        x0 = int(m.loc[0, "sx"]) / n0
        itt = y1 - y0
        fstage = x1 - x0
        wald = itt / fstage
        return pa.table({
            "n_weekend": pa.array([n1], type=pa.int64()),
            "n_weekday": pa.array([n0], type=pa.int64()),
            "itt_cents": pa.array([itt], type=pa.float64()),
            "first_stage": pa.array([fstage], type=pa.float64()),
            "wald_iv_cents": pa.array([wald], type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT CASE WHEN ((epoch_us(o_orderdate)
                           // {US_PER_DAY}) + 4) % 7 IN (6, 0)
                    THEN 1 ELSE 0 END AS z,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS x,
               CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
                   AS cents
        FROM orders
    ),
    g AS (
        SELECT z, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(cents) AS BIGINT) AS sy
        FROM o GROUP BY z
    ),
    w AS (
        SELECT
            (SELECT n FROM g WHERE z = 1) AS n1,
            (SELECT n FROM g WHERE z = 0) AS n0,
            CAST((SELECT sy FROM g WHERE z = 1) AS DOUBLE)
                / CAST((SELECT n FROM g WHERE z = 1) AS DOUBLE)
              - CAST((SELECT sy FROM g WHERE z = 0) AS DOUBLE)
                / CAST((SELECT n FROM g WHERE z = 0) AS DOUBLE)
                AS itt,
            CAST((SELECT sx FROM g WHERE z = 1) AS DOUBLE)
                / CAST((SELECT n FROM g WHERE z = 1) AS DOUBLE)
              - CAST((SELECT sx FROM g WHERE z = 0) AS DOUBLE)
                / CAST((SELECT n FROM g WHERE z = 0) AS DOUBLE)
                AS fs
        FROM (SELECT 1)
    )
    SELECT n1 AS n_weekend, n0 AS n_weekday,
           itt AS itt_cents, fs AS first_stage,
           itt / fs AS wald_iv_cents
    FROM w
    """
    return q, sql


def build_wave186_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_rdd_noon",) + _rdd_query()))
    add(*(("orders_wald_iv",) + _wald_query()))
    return queries, oracles
