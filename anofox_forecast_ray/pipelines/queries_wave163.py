"""Wave-163 queries: Oaxaca-Blinder decomposition, Fisher z test.

- orders_oaxaca_blinder: the econometric gap decomposition — the
  difference in mean order value between the two hash cohorts is
  split into the part EXPLAINED by market-segment composition
  (sum over segments of (w1_s - w0_s) * m0_s) and the UNEXPLAINED
  within-segment part (sum of w1_s * (m1_s - m0_s)), which add
  exactly to the raw gap (identity asserted in the brute). All
  cells are integer (count, cents-sum); shares and means are one
  division each; both folds walk segments in name order.
- events_fisher_z_corr: did the load/error correlation CHANGE
  between the first and second half of the observation window?
  Per-half daily Pearson r from two-pass centered folds, Fisher
  z = atanh(r) (spelled as 0.5 ln((1+r)/(1-r))), and the
  two-sample z statistic with SE = sqrt(1/(n1-3) + 1/(n2-3)).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
HASH_A = 2654435761


# ------------------------------------------------- orders_oaxaca_blinder
def _oaxaca_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"]).to_pandas()
        seg_of = dict(zip(cust["c_custkey"].astype(int),
                          cust["c_mktsegment"]))

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "g": pa.array([], type=pa.int64()),
                "seg": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            g = ((ckey * np.int64(HASH_A))
                 % np.int64(1 << 32)) >> np.int64(31)
            import collections
            agg = collections.defaultdict(lambda: [0, 0])
            for gv, ck, c in zip(g.tolist(), ckey.tolist(),
                                 cents.tolist()):
                k = (gv, seg_of[ck])
                agg[k][0] += 1
                agg[k][1] += c
            keys = sorted(agg)
            return pa.table({
                "g": pa.array([k[0] for k in keys],
                              type=pa.int64()),
                "seg": pa.array([k[1] for k in keys],
                                type=pa.string()),
                "n": pa.array([agg[k][0] for k in keys],
                              type=pa.int64()),
                "s": pa.array([agg[k][1] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["g", "seg"]).aggregate(
                [("n", "sum"), ("s", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "seg": g.column("seg").cast(pa.string()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        segs = sorted(cells["seg"].unique())
        tab = {}
        for _, r in cells.iterrows():
            tab[(int(r["g"]), r["seg"])] = (int(r["n"]),
                                            int(r["s"]))
        n0 = sum(tab.get((0, s), (0, 0))[0] for s in segs)
        n1 = sum(tab.get((1, s), (0, 0))[0] for s in segs)
        m0 = sum(tab.get((0, s), (0, 0))[1]
                 for s in segs) / float(n0) \
            if n0 else 0.0
        # keep expression shapes identical to SQL
        s0_tot = sum(tab.get((0, s), (0, 0))[1] for s in segs)
        s1_tot = sum(tab.get((1, s), (0, 0))[1] for s in segs)
        mean0 = float(s0_tot) / float(n0)
        mean1 = float(s1_tot) / float(n1)
        gap = mean1 - mean0

        explained = 0.0
        unexplained = 0.0
        for s in segs:
            n0s, s0s = tab.get((0, s), (0, 0))
            n1s, s1s = tab.get((1, s), (0, 0))
            w0 = float(n0s) / float(n0)
            w1 = float(n1s) / float(n1)
            m0s = float(s0s) / float(n0s) if n0s else 0.0
            m1s = float(s1s) / float(n1s) if n1s else 0.0
            explained = explained + (w1 - w0) * m0s
            unexplained = unexplained + w1 * (m1s - m0s)
        return pa.table({
            "n0": pa.array([n0], type=pa.int64()),
            "n1": pa.array([n1], type=pa.int64()),
            "gap_cents": pa.array([gap], type=pa.float64()),
            "explained": pa.array([explained],
                                  type=pa.float64()),
            "unexplained": pa.array([unexplained],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT ((o_custkey * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               c.c_mktsegment AS seg,
               CAST(round_even(o_totalprice * 100, 0)
                    AS BIGINT) AS cents
        FROM orders
        JOIN customer c ON c.c_custkey = orders.o_custkey
    ),
    cells AS (
        SELECT g, seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM o GROUP BY 1, 2
    ),
    tot AS (
        SELECT
            CAST(sum(CASE WHEN g = 0 THEN n ELSE 0 END)
                 AS BIGINT) AS n0,
            CAST(sum(CASE WHEN g = 1 THEN n ELSE 0 END)
                 AS BIGINT) AS n1,
            CAST(sum(CASE WHEN g = 0 THEN s ELSE 0 END)
                 AS BIGINT) AS s0,
            CAST(sum(CASE WHEN g = 1 THEN s ELSE 0 END)
                 AS BIGINT) AS s1
        FROM cells
    ),
    seglist AS (SELECT DISTINCT seg FROM cells),
    per AS (
        SELECT sl.seg,
               COALESCE((SELECT n FROM cells
                   WHERE g = 0 AND seg = sl.seg), 0) AS n0s,
               COALESCE((SELECT s FROM cells
                   WHERE g = 0 AND seg = sl.seg), 0) AS s0s,
               COALESCE((SELECT n FROM cells
                   WHERE g = 1 AND seg = sl.seg), 0) AS n1s,
               COALESCE((SELECT s FROM cells
                   WHERE g = 1 AND seg = sl.seg), 0) AS s1s
        FROM seglist sl
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((CAST(n1s AS DOUBLE)
                      / CAST(tot.n1 AS DOUBLE)
                      - CAST(n0s AS DOUBLE)
                        / CAST(tot.n0 AS DOUBLE))
                     * (CASE WHEN n0s > 0
                        THEN CAST(s0s AS DOUBLE)
                             / CAST(n0s AS DOUBLE)
                        ELSE 0.0e0 END)
                     ORDER BY seg)),
                (x, y) -> x + y) AS explained,
            list_reduce(list_prepend(0.0e0,
                list((CAST(n1s AS DOUBLE)
                      / CAST(tot.n1 AS DOUBLE))
                     * ((CASE WHEN n1s > 0
                         THEN CAST(s1s AS DOUBLE)
                              / CAST(n1s AS DOUBLE)
                         ELSE 0.0e0 END)
                        - (CASE WHEN n0s > 0
                           THEN CAST(s0s AS DOUBLE)
                                / CAST(n0s AS DOUBLE)
                           ELSE 0.0e0 END))
                     ORDER BY seg)),
                (x, y) -> x + y) AS unexplained
        FROM per CROSS JOIN tot
        GROUP BY tot.n0, tot.n1
    )
    SELECT tot.n0 AS n0,
           tot.n1 AS n1,
           CAST(tot.s1 AS DOUBLE) / CAST(tot.n1 AS DOUBLE)
               - CAST(tot.s0 AS DOUBLE)
                 / CAST(tot.n0 AS DOUBLE) AS gap_cents,
           folds.explained AS explained,
           folds.unexplained AS unexplained
    FROM tot CROSS JOIN folds
    """
    return q, sql


# ------------------------------------------------- events_fisher_z_corr
def _fisher_z_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "tot": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hour = tus // US_PER_HOUR
            uh, inv = np.unique(hour, return_inverse=True)
            tot = np.bincount(inv, minlength=uh.size)
            err = np.bincount(inv[et == "error"],
                              minlength=uh.size)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "tot": pa.array(tot.astype(np.int64)),
                "err": pa.array(err.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("tot", "sum"), ("err", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "tot": g.column("tot_sum").cast(pa.int64()),
                "err": g.column("err_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        day = h["hour"].to_numpy(np.int64) // 24
        g = h.groupby(day).agg(x=("tot", "sum"),
                               yv=("err", "sum"))
        g = g.sort_index()
        xs = [int(v) for v in g["x"]]
        ys = [int(v) for v in g["yv"]]
        nd = len(xs)
        half = nd // 2

        def corr(x, y):
            n = len(x)
            nf = float(n)
            sx = sy = 0.0
            for i in range(n):
                sx = sx + float(x[i])
                sy = sy + float(y[i])
            mx = sx / nf
            my = sy / nf
            sxy = sxx = syy = 0.0
            for i in range(n):
                dx = float(x[i]) - mx
                dy = float(y[i]) - my
                sxy = sxy + dx * dy
                sxx = sxx + dx * dx
                syy = syy + dy * dy
            return sxy / (math.sqrt(sxx) * math.sqrt(syy)), n

        r1, n1 = corr(xs[:half], ys[:half])
        r2, n2 = corr(xs[half:], ys[half:])
        z1 = 0.5 * math.log((1.0 + r1) / (1.0 - r1))
        z2 = 0.5 * math.log((1.0 + r2) / (1.0 - r2))
        se = math.sqrt(1.0 / float(n1 - 3)
                       + 1.0 / float(n2 - 3))
        z = (z1 - z2) / se
        return pa.table({
            "r_half1": pa.array([r1], type=pa.float64()),
            "r_half2": pa.array([r2], type=pa.float64()),
            "z_diff": pa.array([z], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    days AS (
        SELECT hour // 24 AS day,
               CAST(sum(tot) AS BIGINT) AS x,
               CAST(sum(err) AS BIGINT) AS y,
               CAST(row_number() OVER (ORDER BY hour // 24)
                    AS BIGINT) AS rn
        FROM hc GROUP BY hour // 24
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM days),
    halves AS (
        SELECT CASE WHEN rn <= nn.nd // 2 THEN 1 ELSE 2 END
                   AS hf,
               day, x, y
        FROM days CROSS JOIN nn
    ),
    mu AS (
        SELECT hf,
               CAST(count(*) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(x AS DOUBLE) ORDER BY day)),
                   (p, v) -> p + v)
                   / CAST(count(*) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(y AS DOUBLE) ORDER BY day)),
                   (p, v) -> p + v)
                   / CAST(count(*) AS DOUBLE) AS my
        FROM halves GROUP BY hf
    ),
    cr AS (
        SELECT h.hf, mu.n,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(h.x AS DOUBLE) - mu.mx)
                        * (CAST(h.y AS DOUBLE) - mu.my)
                        ORDER BY h.day)), (p, v) -> p + v)
               / (sqrt(list_reduce(list_prepend(0.0e0,
                      list((CAST(h.x AS DOUBLE) - mu.mx)
                           * (CAST(h.x AS DOUBLE) - mu.mx)
                           ORDER BY h.day)),
                      (p, v) -> p + v))
                  * sqrt(list_reduce(list_prepend(0.0e0,
                      list((CAST(h.y AS DOUBLE) - mu.my)
                           * (CAST(h.y AS DOUBLE) - mu.my)
                           ORDER BY h.day)),
                      (p, v) -> p + v))) AS r
        FROM halves h JOIN mu ON mu.hf = h.hf
        GROUP BY h.hf, mu.n, mu.mx, mu.my
    )
    SELECT
        (SELECT r FROM cr WHERE hf = 1) AS r_half1,
        (SELECT r FROM cr WHERE hf = 2) AS r_half2,
        (0.5e0 * ln((1.0e0 + (SELECT r FROM cr WHERE hf = 1))
                    / (1.0e0 - (SELECT r FROM cr
                                WHERE hf = 1)))
         - 0.5e0 * ln((1.0e0 + (SELECT r FROM cr
                                WHERE hf = 2))
                      / (1.0e0 - (SELECT r FROM cr
                                  WHERE hf = 2))))
        / sqrt(1.0e0 / CAST((SELECT n FROM cr WHERE hf = 1)
                            - 3 AS DOUBLE)
               + 1.0e0 / CAST((SELECT n FROM cr
                               WHERE hf = 2) - 3 AS DOUBLE))
            AS z_diff
    """
    return q, sql


def build_wave163_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_oaxaca_blinder",) + _oaxaca_query()))
    add(*(("events_fisher_z_corr",) + _fisher_z_query()))
    return queries, oracles
