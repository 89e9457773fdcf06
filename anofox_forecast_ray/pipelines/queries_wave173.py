"""Wave-173 queries: Fleiss' kappa detector agreement, Page trend.

- events_fleiss_kappa: do three classic anomaly detectors agree on
  which days are error-anomalous? Rater 1: |x - median| beyond
  1.5 IQR (exact via 2|x-med| > 3 IQR); rater 2: above the exact
  q90 order statistic; rater 3: beyond 2 sigma via the ALL-INTEGER
  test (n x - S)^2 > 4 (n SS - S^2). Fleiss' kappa over the
  3-rater binary table is then integer counts with the closed-form
  P-bar / Pe-bar divisions.
- events_page_trend: Page's L test for an ORDERED alternative —
  do the four six-hour day quadrants carry monotonically
  increasing traffic within each weekday block? Doubled midranks
  per block (integer), L2 = sum j * R2_j, and the normal
  approximation z = (3 L2 - 3 b k (k+1)^2 / ... ) spelled from the
  classic formula with doubled units kept integer until the final
  two divisions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _daily_errors(sf_dir: str):
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "day": pa.array([], type=pa.int64()),
            "err": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist())
        day = tus // US_PER_DAY
        ud, inv = np.unique(day, return_inverse=True)
        err = np.bincount(inv[et == "error"],
                          minlength=ud.size)
        return pa.table({
            "day": pa.array(ud.astype(np.int64)),
            "err": pa.array(err.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("err", "sum")])
        return pa.table({
            "day": g.column("day").cast(pa.int64()),
            "err": g.column("err_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    h = tree_reduce_tables(refs, merge).to_pandas()
    return h.sort_values("day").reset_index(drop=True)


# ------------------------------------------------------- events_fleiss_kappa
def _fleiss_query():
    def q(sf_dir: str):
        h = _daily_errors(sf_dir)
        xs = [int(v) for v in h["err"]]
        n = len(xs)
        srt = sorted(xs)
        med2 = srt[(n - 1) // 2] + srt[n // 2]  # 2*median
        q1 = srt[(n + 3) // 4 - 1]
        q3 = srt[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        q90 = srt[(9 * n + 9) // 10 - 1]
        s = sum(xs)
        ss = sum(v * v for v in xs)

        n_anom = [0, 0, 0]
        agree_sum = 0  # sum over days of r_i*(r_i-1)
        for x in xs:
            r1 = 1 if abs(2 * x - med2) * 2 > 3 * 2 * iqr \
                else 0
            r2 = 1 if x > q90 else 0
            lhs = (n * x - s)
            r3 = 1 if lhs * lhs > 4 * (n * ss - s * s) \
                else 0
            ri = r1 + r2 + r3
            n_anom[0] += r1
            n_anom[1] += r2
            n_anom[2] += r3
            agree_sum += ri * (ri - 1) + (3 - ri) * (2 - ri)
        m = 3
        p_bar = float(agree_sum) / (float(n) * float(m)
                                    * float(m - 1))
        tot_pos = n_anom[0] + n_anom[1] + n_anom[2]
        p1 = float(tot_pos) / (float(n) * float(m))
        pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
        kappa = (p_bar - pe) / (1.0 - pe)
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "anom_mad": pa.array([n_anom[0]],
                                 type=pa.int64()),
            "anom_q90": pa.array([n_anom[1]],
                                 type=pa.int64()),
            "anom_2sigma": pa.array([n_anom[2]],
                                    type=pa.int64()),
            "p_bar": pa.array([p_bar], type=pa.float64()),
            "fleiss_kappa": pa.array([kappa],
                                     type=pa.float64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS BIGINT) AS s,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS ss
        FROM dc
    ),
    os AS (
        SELECT
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (nn.n - 1) // 2 + 1)
            + (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
               WHERE r = nn.n // 2 + 1) AS med2,
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (3 * nn.n + 3) // 4)
            - (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
               WHERE r = (nn.n + 3) // 4) AS iqr,
            (SELECT x FROM (SELECT x, row_number()
                 OVER (ORDER BY x) AS r FROM dc), nn
             WHERE r = (9 * nn.n + 9) // 10) AS q90
    ),
    rated AS (
        SELECT dc.x,
               CASE WHEN abs(2 * dc.x - os.med2) * 2
                         > 3 * 2 * os.iqr
                    THEN 1 ELSE 0 END AS r1,
               CASE WHEN dc.x > os.q90 THEN 1 ELSE 0 END
                   AS r2,
               CASE WHEN CAST(nn.n * dc.x - nn.s AS HUGEINT)
                         * (nn.n * dc.x - nn.s)
                         > 4 * (nn.n * nn.ss
                                - CAST(nn.s AS HUGEINT)
                                  * nn.s)
                    THEN 1 ELSE 0 END AS r3
        FROM dc CROSS JOIN os CROSS JOIN nn
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r1) AS BIGINT) AS a1,
               CAST(sum(r2) AS BIGINT) AS a2,
               CAST(sum(r3) AS BIGINT) AS a3,
               CAST(sum((r1 + r2 + r3) * (r1 + r2 + r3 - 1)
                        + (3 - r1 - r2 - r3)
                          * (2 - r1 - r2 - r3)) AS BIGINT)
                   AS agree
        FROM rated
    )
    SELECT n AS n_days,
           a1 AS anom_mad,
           a2 AS anom_q90,
           a3 AS anom_2sigma,
           CAST(agree AS DOUBLE)
               / (CAST(n AS DOUBLE) * 3.0e0 * 2.0e0)
               AS p_bar,
           (CAST(agree AS DOUBLE)
            / (CAST(n AS DOUBLE) * 3.0e0 * 2.0e0)
            - ((CAST(a1 + a2 + a3 AS DOUBLE)
                / (CAST(n AS DOUBLE) * 3.0e0))
               * (CAST(a1 + a2 + a3 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 3.0e0))
               + (1.0e0 - CAST(a1 + a2 + a3 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 3.0e0))
                 * (1.0e0 - CAST(a1 + a2 + a3 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * 3.0e0))))
           / (1.0e0 - ((CAST(a1 + a2 + a3 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * 3.0e0))
                       * (CAST(a1 + a2 + a3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * 3.0e0))
                      + (1.0e0 - CAST(a1 + a2 + a3
                                      AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 3.0e0))
                        * (1.0e0 - CAST(a1 + a2 + a3
                                        AS DOUBLE)
                           / (CAST(n AS DOUBLE) * 3.0e0))))
               AS fleiss_kappa
    FROM agg
    """
    return q, sql


# -------------------------------------------------------- events_page_trend
def _page_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "dow": pa.array([], type=pa.int64()),
                "quad": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            dow = (tus // US_PER_DAY) % 7
            quad = ((tus // US_PER_HOUR) % 24) // 6
            key = dow * 4 + quad
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "dow": pa.array(uk // 4),
                "quad": pa.array(uk % 4),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dow", "quad"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "dow": g.column("dow").cast(pa.int64()),
                "quad": g.column("quad").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        mat = np.zeros((7, 4), dtype=np.int64)
        for _, r in cells.iterrows():
            mat[int(r["dow"]), int(r["quad"])] = int(r["c"])

        b, k = 7, 4
        l2 = 0
        for d in range(b):
            vals = mat[d]
            uv, cnt = np.unique(vals, return_counts=True)
            less = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            r2_of = {int(v): 2 * int(lo) + int(cc) + 1
                     for v, lo, cc in zip(uv, less, cnt)}
            for j in range(k):
                l2 += (j + 1) * r2_of[int(vals[j])]
        # E[L2] = 2 * b k (k+1)^2 / 4; Var[L] with doubled units:
        mean_l2 = b * k * (k + 1) * (k + 1) // 2
        var_l = float(b) * float(k * k) \
            * float(k + 1) \
            * (float(k * k) - 1.0) / 144.0
        z = (float(l2) / 2.0 - float(mean_l2) / 2.0) \
            / math.sqrt(var_l)
        return pa.table({
            "l2_stat": pa.array([l2], type=pa.int64()),
            "mean_l2": pa.array([mean_l2],
                                type=pa.int64()),
            "z_page": pa.array([z], type=pa.float64()),
        })

    sql = f"""
    WITH cells AS (
        SELECT (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               ((epoch_us(ts) // {US_PER_HOUR}) % 24) // 6
                   AS quad,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.d AS dow, qd.q AS quad,
               COALESCE(cells.c, 0) AS c
        FROM (SELECT unnest(generate_series(0, 6)) AS d) d
        CROSS JOIN (SELECT unnest(generate_series(0, 3))
                        AS q) qd
        LEFT JOIN cells ON cells.dow = d.d
                       AND cells.quad = qd.q
    ),
    r2 AS (
        SELECT dow, quad,
               2 * (SELECT CAST(count(*) AS BIGINT)
                    FROM grid g2 WHERE g2.dow = grid.dow
                      AND g2.c < grid.c)
               + (SELECT CAST(count(*) AS BIGINT)
                  FROM grid g2 WHERE g2.dow = grid.dow
                    AND g2.c = grid.c) + 1 AS r2
        FROM grid
    ),
    l2 AS (
        SELECT CAST(sum((quad + 1) * r2) AS BIGINT) AS l2
        FROM r2
    )
    SELECT l2.l2 AS l2_stat,
           CAST(7 * 4 * 5 * 5 // 2 AS BIGINT) AS mean_l2,
           (CAST(l2.l2 AS DOUBLE) / 2.0e0
            - CAST(7 * 4 * 5 * 5 // 2 AS DOUBLE) / 2.0e0)
           / sqrt(7.0e0 * 16.0e0 * 5.0e0 * 15.0e0
                  / 144.0e0) AS z_page
    FROM l2
    """
    return q, sql


def build_wave173_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_fleiss_kappa",) + _fleiss_query()))
    add(*(("events_page_trend",) + _page_query()))
    return queries, oracles
