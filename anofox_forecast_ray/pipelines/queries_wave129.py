"""Wave-129 queries: Granger causality, exact 1-D Wasserstein.

- events_granger_error: lag-1 Granger test "do error counts help
  predict next-hour total counts?" on the zero-filled dense hourly
  grid. Both OLS fits (restricted y~1+y_lag, unrestricted
  y~1+y_lag+x_lag) are solved by 3x3/2x2 Cramer over EXACT integer
  moments (HUGEINT in the oracle, Python ints in the engine); each
  coefficient is one division of identical ints, the RSS dot
  products fold in fixed coefficient order, and the F statistic is
  two more divisions. Because the determinant expansions are shared
  expression strings on both sides, the independent verify
  recomputes everything with np.linalg.lstsq (wave-99 rule).
- source_wasserstein_len: exact 1-D Wasserstein-1 distance between
  each source's doc-length distribution and the global one.
  W1 = (1/(n_s*n_g)) * sum over the sorted union grid of
  |cum_s*n_g - cum_g*n_s| * gap — every term integer (HUGEINT),
  the grid sum is an integer SUM (order-free, safe), and the only
  float is the final single division. Bounded (source, len) count
  partials; zero row shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


# ------------------------------------------------------- events_granger_error
def _granger_query():
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
        h = h.sort_values("hour").reset_index(drop=True)
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n_grid = hmax - hmin + 1
        tot = np.zeros(n_grid, dtype=np.int64)
        err = np.zeros(n_grid, dtype=np.int64)
        idx = (h["hour"].to_numpy(np.int64) - hmin)
        tot[idx] = h["tot"].to_numpy(np.int64)
        err[idx] = h["err"].to_numpy(np.int64)

        y = [int(v) for v in tot[1:]]
        a = [int(v) for v in tot[:-1]]
        b = [int(v) for v in err[:-1]]
        n = len(y)
        sa = sum(a)
        sb = sum(b)
        sy = sum(y)
        saa = sum(v * v for v in a)
        sbb = sum(v * v for v in b)
        sab = sum(va * vb for va, vb in zip(a, b))
        say = sum(va * vy for va, vy in zip(a, y))
        sby = sum(vb * vy for vb, vy in zip(b, y))
        syy = sum(v * v for v in y)

        det = (n * (saa * sbb - sab * sab)
               - sa * (sa * sbb - sab * sb)
               + sb * (sa * sab - saa * sb))
        det0 = (sy * (saa * sbb - sab * sab)
                - sa * (say * sbb - sab * sby)
                + sb * (say * sab - saa * sby))
        det1 = (n * (say * sbb - sab * sby)
                - sy * (sa * sbb - sab * sb)
                + sb * (sa * sby - say * sb))
        det2 = (n * (saa * sby - say * sab)
                - sa * (sa * sby - say * sb)
                + sy * (sa * sab - saa * sb))
        b0 = float(det0) / float(det)
        b1 = float(det1) / float(det)
        b2 = float(det2) / float(det)
        rss_u = float(syy) - ((b0 * float(sy)
                               + b1 * float(say))
                              + b2 * float(sby))

        det_r = n * saa - sa * sa
        c0 = float(sy * saa - sa * say) / float(det_r)
        c1 = float(n * say - sa * sy) / float(det_r)
        rss_r = float(syy) - (c0 * float(sy)
                              + c1 * float(say))

        f_num = rss_r - rss_u
        f_den = rss_u / float(n - 3)
        f_stat = f_num / f_den

        return pa.table({
            "n_pairs": pa.array([n], type=pa.int64()),
            "b_const": pa.array([b0], type=pa.float64()),
            "b_ylag": pa.array([b1], type=pa.float64()),
            "b_xlag": pa.array([b2], type=pa.float64()),
            "rss_u": pa.array([rss_u], type=pa.float64()),
            "rss_r": pa.array([rss_r], type=pa.float64()),
            "f_stat": pa.array([f_stat], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour,
               COALESCE(hc.tot, 0) AS tot,
               COALESCE(hc.err, 0) AS err
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    pairs AS (
        SELECT g1.tot AS y, g0.tot AS a, g0.err AS b
        FROM grid g1 JOIN grid g0 ON g0.hour = g1.hour - 1
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(a AS HUGEINT)) AS HUGEINT) AS sa,
               CAST(sum(CAST(b AS HUGEINT)) AS HUGEINT) AS sb,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT)
                   AS saa,
               CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT)
                   AS sbb,
               CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT)
                   AS sab,
               CAST(sum(CAST(a AS HUGEINT) * y) AS HUGEINT)
                   AS say,
               CAST(sum(CAST(b AS HUGEINT) * y) AS HUGEINT)
                   AS sby,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy
        FROM pairs
    ),
    dets AS (
        SELECT n, sy, say, sby, syy,
               (n * (saa * sbb - sab * sab)
                - sa * (sa * sbb - sab * sb)
                + sb * (sa * sab - saa * sb)) AS det,
               (sy * (saa * sbb - sab * sab)
                - sa * (say * sbb - sab * sby)
                + sb * (say * sab - saa * sby)) AS det0,
               (n * (say * sbb - sab * sby)
                - sy * (sa * sbb - sab * sb)
                + sb * (sa * sby - say * sb)) AS det1,
               (n * (saa * sby - say * sab)
                - sa * (sa * sby - say * sb)
                + sy * (sa * sab - saa * sb)) AS det2,
               (n * saa - sa * sa) AS det_r,
               (sy * saa - sa * say) AS detr0,
               (n * say - sa * sy) AS detr1
        FROM mom
    ),
    fit AS (
        SELECT CAST(n AS BIGINT) AS n_pairs,
               CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
               CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
               CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2,
               CAST(detr0 AS DOUBLE) / CAST(det_r AS DOUBLE)
                   AS c0,
               CAST(detr1 AS DOUBLE) / CAST(det_r AS DOUBLE)
                   AS c1,
               CAST(sy AS DOUBLE) AS syf,
               CAST(say AS DOUBLE) AS sayf,
               CAST(sby AS DOUBLE) AS sbyf,
               CAST(syy AS DOUBLE) AS syyf
        FROM dets
    ),
    rss AS (
        SELECT n_pairs, b0, b1, b2,
               syyf - ((b0 * syf + b1 * sayf) + b2 * sbyf)
                   AS rss_u,
               syyf - (c0 * syf + c1 * sayf) AS rss_r
        FROM fit
    )
    SELECT n_pairs,
           b0 AS b_const, b1 AS b_ylag, b2 AS b_xlag,
           rss_u, rss_r,
           (rss_r - rss_u)
               / (rss_u / CAST(n_pairs - 3 AS DOUBLE)) AS f_stat
    FROM rss
    """
    return q, sql


# ---------------------------------------------------- source_wasserstein_len
def _wasserstein_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "len": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _values, lengths = _flat_tokens(t)
            src = np.asarray(t.column("source").to_pylist())
            names, inv = np.unique(src, return_inverse=True)
            shift = np.int64(1 << 22)
            keys = inv.astype(np.int64) * shift \
                + lengths.astype(np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "len": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "len"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "len": g.column("len").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        grid = np.sort(a["len"].unique())
        gaps = np.diff(grid)
        g_hist = a.groupby("len")["cnt"].sum()
        g_cnt = np.zeros(grid.size, dtype=np.int64)
        g_cnt[np.searchsorted(grid, g_hist.index.to_numpy())] \
            = g_hist.to_numpy(np.int64)
        g_cum = np.cumsum(g_cnt)
        n_g = int(g_cum[-1])

        out = {"source": [], "n_docs": [], "w1": []}
        for src, grp in a.groupby("source", sort=True):
            s_cnt = np.zeros(grid.size, dtype=np.int64)
            s_cnt[np.searchsorted(
                grid, grp["len"].to_numpy(np.int64))] = (
                grp["cnt"].to_numpy(np.int64))
            s_cum = np.cumsum(s_cnt)
            n_s = int(s_cum[-1])
            total = 0
            for k in range(grid.size - 1):
                total += abs(int(s_cum[k]) * n_g
                             - int(g_cum[k]) * n_s) \
                    * int(gaps[k])
            out["source"].append(src)
            out["n_docs"].append(n_s)
            out["w1"].append(float(total)
                             / float(n_s * n_g))
        return pa.table({
            "source": pa.array(out["source"], type=pa.string()),
            "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            "w1": pa.array(out["w1"], type=pa.float64()),
        })

    sql = """
    WITH lens AS (
        SELECT source, CAST(length(text) AS BIGINT) AS len
        FROM documents
    ),
    grid AS (
        SELECT len,
               lead(len) OVER (ORDER BY len) - len AS gap
        FROM (SELECT DISTINCT len FROM lens)
    ),
    srcs AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s
        FROM lens GROUP BY source
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_g FROM lens),
    cells AS (
        SELECT s.source, s.n_s, g.len, g.gap,
               (SELECT CAST(count(*) AS HUGEINT) FROM lens l
                WHERE l.source = s.source AND l.len <= g.len)
                   AS cum_s,
               (SELECT CAST(count(*) AS HUGEINT) FROM lens l
                WHERE l.len <= g.len) AS cum_g
        FROM srcs s CROSS JOIN grid g
        WHERE g.gap IS NOT NULL
    )
    SELECT c.source AS source,
           max(c.n_s) AS n_docs,
           CAST(sum(abs(c.cum_s * t.n_g - c.cum_g * c.n_s)
                    * c.gap) AS DOUBLE)
               / CAST(max(c.n_s) * t.n_g AS DOUBLE) AS w1
    FROM cells c CROSS JOIN tot t
    GROUP BY c.source, t.n_g
    ORDER BY c.source
    """
    return q, sql


def build_wave129_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_granger_error",) + _granger_query()))
    add(*(("source_wasserstein_len",) + _wasserstein_query()))
    return queries, oracles
