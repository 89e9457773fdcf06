"""Wave-168 queries: Kendall's W concordance, bullwhip ratio.

- events_kendalls_w: Kendall's coefficient of concordance — do the
  seven weekdays agree on the ranking of the 24 hours-of-day by
  traffic? Each weekday ranks the hours with doubled midranks
  (fully-integer tie handling), the rank-sum deviations square to
  an exact integer S, and W = 12 S / (m^2 (n^3 - n)) with the tie
  correction sum(t^3 - t) per weekday — one division at the end.
- orders_bullwhip: the supply-chain bullwhip diagnostic — the
  ratio of the squared coefficient of variation of monthly ORDER
  counts (upstream signal) to that of monthly shipped QUANTITY
  (downstream demand). CV^2 terms come from exact integer moments;
  ratio > 1 means order batching amplifies variability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


# ------------------------------------------------------- events_kendalls_w
def _kendalls_w_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "dow": pa.array([], type=pa.int64()),
                "hod": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            dow = (tus // US_PER_DAY) % 7
            hod = (tus // US_PER_HOUR) % 24
            key = dow * 24 + hod
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "dow": pa.array(uk // 24),
                "hod": pa.array(uk % 24),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dow", "hod"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "dow": g.column("dow").cast(pa.int64()),
                "hod": g.column("hod").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        n = 24
        m = 7
        mat = np.zeros((m, n), dtype=np.int64)
        for _, r in cells.iterrows():
            mat[int(r["dow"]), int(r["hod"])] = int(r["c"])

        # doubled midranks per weekday + tie correction
        r2sum = np.zeros(n, dtype=np.int64)
        tcorr = 0
        for d in range(m):
            vals = mat[d]
            uv, cnt = np.unique(vals, return_counts=True)
            less = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            r2_of = {int(v): 2 * int(lo) + int(cc) + 1
                     for v, lo, cc in zip(uv, less, cnt)}
            for h in range(n):
                r2sum[h] += r2_of[int(vals[h])]
            for cc in cnt.tolist():
                tcorr += cc * cc * cc - cc
        # S2 = sum (R2_h - mean)^2 in quadrupled units
        tot = int(r2sum.sum())
        # mean of doubled rank sums = m*(n+1); use integer 2S:
        s4 = 0
        for h in range(n):
            d = int(r2sum[h]) * n - tot
            s4 += d * d
        # W = 12*S / (m^2 (n^3-n) - m*T), S in singles:
        # r2sum = 2*Rsum -> d/(2n) relates; spell both sides equally
        num = 3.0 * float(s4)
        den = float(n) * float(n) * (
            float(m * m) * float(n ** 3 - n)
            - float(m) * float(tcorr))
        w = num / den
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "m_raters": pa.array([m], type=pa.int64()),
            "s4": pa.array([s4], type=pa.int64()),
            "tie_corr": pa.array([tcorr], type=pa.int64()),
            "kendalls_w": pa.array([w], type=pa.float64()),
        })

    sql = f"""
    WITH cells AS (
        SELECT (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.d AS dow, h.h AS hod,
               COALESCE(cells.c, 0) AS c
        FROM (SELECT unnest(generate_series(0, 6)) AS d) d
        CROSS JOIN (SELECT unnest(generate_series(0, 23))
                        AS h) h
        LEFT JOIN cells ON cells.dow = d.d
                       AND cells.hod = h.h
    ),
    r2 AS (
        SELECT dow, hod,
               2 * (SELECT CAST(count(*) AS BIGINT)
                    FROM grid g2
                    WHERE g2.dow = grid.dow
                      AND g2.c < grid.c)
               + (SELECT CAST(count(*) AS BIGINT)
                  FROM grid g2
                  WHERE g2.dow = grid.dow
                    AND g2.c = grid.c) + 1 AS r2
        FROM grid
    ),
    rsum AS (
        SELECT hod, CAST(sum(r2) AS BIGINT) AS r2sum
        FROM r2 GROUP BY hod
    ),
    tot AS (SELECT CAST(sum(r2sum) AS BIGINT) AS t
            FROM rsum),
    s4 AS (
        SELECT CAST(sum(CAST(r2sum * 24 - tot.t AS HUGEINT)
                        * (r2sum * 24 - tot.t)) AS BIGINT)
                   AS s4
        FROM rsum CROSS JOIN tot
    ),
    ties AS (
        SELECT CAST(sum(CAST(tc AS HUGEINT) * tc * tc - tc)
                    AS BIGINT) AS tcorr
        FROM (SELECT dow, c, count(*) AS tc
              FROM grid GROUP BY dow, c)
    )
    SELECT CAST(24 AS BIGINT) AS n_hours,
           CAST(7 AS BIGINT) AS m_raters,
           s4.s4 AS s4,
           ties.tcorr AS tie_corr,
           (3.0e0 * CAST(s4.s4 AS DOUBLE))
               / (24.0e0 * 24.0e0
                  * (49.0e0 * CAST(24 * 24 * 24 - 24
                                   AS DOUBLE)
                     - 7.0e0 * CAST(ties.tcorr AS DOUBLE)))
               AS kendalls_w
    FROM s4 CROSS JOIN ties
    """
    return q, sql


# ------------------------------------------------------------ orders_bullwhip
def _bullwhip_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def o_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
            if "o_orderdate" not in t.column_names:
                return empty
            od = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            uk, c = np.unique(month, return_counts=True)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            })

        def l_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
            if "l_shipdate" not in t.column_names:
                return empty
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            qs = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "n": pa.array(qs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate([("n", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
            })

        def moments(reader, partial):
            refs = list(
                reader.map_batches(partial,
                                   batch_format="pyarrow")
                .to_arrow_refs()
            )
            mm = tree_reduce_tables(refs, merge).to_pandas()
            xs = [int(v) for v in mm["n"]]
            k = len(xs)
            s = sum(xs)
            ss = sum(v * v for v in xs)
            kf = float(k)
            mean = float(s) / kf
            var = (float(ss) - (float(s) * float(s)) / kf) \
                / kf
            return k, mean, var

        ko, mo, vo = moments(
            read_cols(sf_dir, "orders", ["o_orderdate"]),
            o_partial)
        kl, ml, vl = moments(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_quantity"]),
            l_partial)
        cv2_o = vo / (mo * mo)
        cv2_l = vl / (ml * ml)
        ratio = cv2_o / cv2_l
        return pa.table({
            "months_orders": pa.array([ko],
                                      type=pa.int64()),
            "months_ship": pa.array([kl], type=pa.int64()),
            "cv2_orders": pa.array([cv2_o],
                                   type=pa.float64()),
            "cv2_shipqty": pa.array([cv2_l],
                                    type=pa.float64()),
            "bullwhip_ratio": pa.array([ratio],
                                       type=pa.float64()),
        })

    sql = """
    WITH om AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate)
                   AS m,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    lm AS (
        SELECT year(l_shipdate) * 12 + month(l_shipdate)
                   AS m,
               CAST(sum(CAST(round_even(l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    ),
    oagg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(n AS HUGEINT)) AS BIGINT) AS s,
               CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT)
                   AS ss
        FROM om
    ),
    lagg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(n AS HUGEINT)) AS BIGINT) AS s,
               CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT)
                   AS ss
        FROM lm
    ),
    cv AS (
        SELECT
            ((CAST(oagg.ss AS DOUBLE)
              - (CAST(oagg.s AS DOUBLE)
                 * CAST(oagg.s AS DOUBLE))
                / CAST(oagg.k AS DOUBLE))
             / CAST(oagg.k AS DOUBLE))
            / ((CAST(oagg.s AS DOUBLE)
                / CAST(oagg.k AS DOUBLE))
               * (CAST(oagg.s AS DOUBLE)
                  / CAST(oagg.k AS DOUBLE))) AS cv2_o,
            ((CAST(lagg.ss AS DOUBLE)
              - (CAST(lagg.s AS DOUBLE)
                 * CAST(lagg.s AS DOUBLE))
                / CAST(lagg.k AS DOUBLE))
             / CAST(lagg.k AS DOUBLE))
            / ((CAST(lagg.s AS DOUBLE)
                / CAST(lagg.k AS DOUBLE))
               * (CAST(lagg.s AS DOUBLE)
                  / CAST(lagg.k AS DOUBLE))) AS cv2_l,
            oagg.k AS ko, lagg.k AS kl
        FROM oagg CROSS JOIN lagg
    )
    SELECT ko AS months_orders,
           kl AS months_ship,
           cv2_o AS cv2_orders,
           cv2_l AS cv2_shipqty,
           cv2_o / cv2_l AS bullwhip_ratio
    FROM cv
    """
    return q, sql


def build_wave168_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_kendalls_w",) + _kendalls_w_query()))
    add(*(("orders_bullwhip",) + _bullwhip_query()))
    return queries, oracles
