"""Wave-63 queries: Hurst R/S exponent, ensemble forecast, and
hourly Holt-Winters over the events tier.

- doc_hurst_rs: rescaled-range Hurst exponent per doc over the raw
  token series at scales n = 16/32/64 (Hurst 1951; Mandelbrot &
  Wallis 1969). The trick that makes it bitwise-SQL-checkable: with
  integer tokens, the mean-centered cumulative deviation scaled by n
  is an INTEGER — ndev_k = n*cum_k - k*S — so R and the variance
  term n*SS - S^2 are exact int64s and rs_seg = R / sqrt(n*SS - S^2)
  is one correctly-rounded sqrt + divide per segment (hardware sqrt
  is IEEE-exact, same libm both sides). Per-scale R/S means fold in
  segment order; H = Cramer OLS slope of ln(RS_n) on ln(n) over the
  3 scales. Engine is fully vectorized (reshape to (nseg, n),
  integer cumsums; reduceat is numpy's sequential fold).
- forecast_ensemble_w8: mean combination of naive + SES(0.3) +
  Holt(0.3, 0.1) at h=1 (models.Ensemble, ensemble/model.rs) via the
  new 'ensemble' registry adapter. Each member's fold already has a
  proven SQL replay (forecast_ses_w8 / forecast_holt_w8); the
  combination is a 3-term left-assoc mean (numpy sums < 8 elements
  are left folds).
- events_hw_hourly: additive Holt-Winters (period 24, fixed params)
  over each event type's DENSE hourly count series (gap-filled with
  zeros over the global hour range) — forecasting on a rollup tier,
  the north-star composition. Series are scaled by the period
  (y' = 24*count) so every init sum (level = mean of first 24,
  trend = mean of cross-period diffs / 24) is a sum of exact
  integers — order-free, which is what lets the kernel's numpy
  pairwise sums meet the SQL left folds bitwise at p = 24 (the p=4
  doc variant never needed this). Counting is distributed partial
  bincounts tree-reduced ((type, hour) is bounded: 5 x ~720); only
  the 26-wide state fold runs on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import (SQL_TOK, _cast, _num_read_blocks, corpus_ds,
                      _forecast_query, _series_list_sql)
from ._scaffold import read_cols

HURST_SCALES = (16, 32, 64)
HW_PERIOD = 24
HW_ALPHA = 0.3
HW_BETA = 0.1
HW_GAMMA = 0.1
HW_H = 24


# ------------------------------------------------------------ doc_hurst_rs
def _hurst_query(scales: tuple = HURST_SCALES):
    min_len = 2 * max(scales)

    def q(sf_dir: str):
        def hurst(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                **{f"rs{n}": pa.array([], type=pa.float64())
                   for n in scales},
                "hurst": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= min_len
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            rs_cols = {}
            for n in scales:
                nseg = dlens // n
                tot = int(nseg.sum())
                g = np.repeat(np.arange(nd), nseg)
                sidx = (np.arange(tot)
                        - np.repeat(np.cumsum(nseg) - nseg, nseg))
                seg_starts = starts[g] + sidx * n
                idx = seg_starts[:, None] + np.arange(n)[None, :]
                y = flat[idx]                      # (tot, n) int64
                cums = np.cumsum(y, axis=1)        # exact int64
                s = cums[:, -1]
                ss = (y * y).sum(axis=1)
                k = np.arange(1, n + 1, dtype=np.int64)
                ndev = n * cums - k[None, :] * s[:, None]
                r = ndev.max(axis=1) - ndev.min(axis=1)
                den = n * ss - s * s
                valid = den > 0
                rs = np.zeros(tot, dtype=np.float64)
                rs[valid] = (r[valid].astype(np.float64)
                             / np.sqrt(den[valid].astype(
                                 np.float64)))
                # per-doc SEQUENTIAL fold over segments: reduceat is
                # pairwise (not SQL-replayable); scatter into a
                # zero-padded matrix and cumsum along axis 1 instead
                # (zeros — padding and invalid segments — add exactly
                # 0.0, leaving every partial sum bit-identical)
                bnd = np.cumsum(nseg) - nseg
                maxn = int(nseg.max())
                mat = np.zeros((nd, maxn), dtype=np.float64)
                mat[g, sidx] = rs
                sums = np.cumsum(mat, axis=1)[:, -1]
                cnts = np.bincount(
                    g, weights=valid, minlength=nd).astype(np.int64)
                mean = np.where(cnts > 0, sums / np.maximum(
                    cnts, 1).astype(np.float64), np.nan)
                rs_cols[n] = mean
            hv = np.full(nd, np.nan)
            lx = [math.log(float(n)) for n in scales]
            kf = float(len(scales))
            for i in range(nd):
                vals = [rs_cols[n][i] for n in scales]
                if any(not (v > 0) for v in vals):
                    continue
                ly = [math.log(v) for v in vals]
                sx = lx[0] + lx[1] + lx[2]
                sy = ly[0] + ly[1] + ly[2]
                sxx = lx[0] * lx[0] + lx[1] * lx[1] + lx[2] * lx[2]
                sxy = lx[0] * ly[0] + lx[1] * ly[1] + lx[2] * ly[2]
                den = kf * sxx - sx * sx
                hv[i] = (kf * sxy - sx * sy) / den
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                **{f"rs{n}": pa.array(rs_cols[n],
                                      type=pa.float64())
                   for n in scales},
                "hurst": pa.array(hv, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            hurst, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            **{f"rs{n}": pa.float64() for n in scales},
            "hurst": pa.float64(),
        })

    def scale_cte(n: int) -> str:
        return f"""
    c{n} AS (
        SELECT t.doc_id, t.pos // {n} AS seg,
               t.pos % {n} + 1 AS k, t.token,
               sum(t.token) OVER (PARTITION BY t.doc_id, t.pos // {n}
                                  ORDER BY t.pos
                                  ROWS UNBOUNDED PRECEDING) AS cum,
               sum(t.token) OVER (PARTITION BY t.doc_id,
                                  t.pos // {n}) AS s
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
        WHERE t.pos < (tl.len // {n}) * {n}
    ),
    g{n} AS (
        SELECT doc_id, seg,
               max({n} * cum - k * s) - min({n} * cum - k * s) AS r,
               {n} * sum(token * token) - max(s) * max(s) AS den
        FROM c{n} GROUP BY doc_id, seg
    ),
    m{n} AS (
        SELECT doc_id,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(r AS DOUBLE)
                        / sqrt(CAST(den AS DOUBLE)) ORDER BY seg)),
                   (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS rs
        FROM g{n} WHERE den > 0 GROUP BY doc_id
    )"""

    l16, l32, l64 = (f"ln({float(n)}e0)" for n in scales)
    sx = f"({l16} + {l32} + {l64})"
    sxx = f"({l16} * {l16} + {l32} * {l32} + {l64} * {l64})"
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len
        FROM tok GROUP BY doc_id HAVING count(*) >= {min_len}
    ),{scale_cte(16)},{scale_cte(32)},{scale_cte(64)}
    SELECT tl.doc_id, tl.len AS n_tok,
           COALESCE(m16.rs, 'nan'::DOUBLE) AS rs16,
           COALESCE(m32.rs, 'nan'::DOUBLE) AS rs32,
           COALESCE(m64.rs, 'nan'::DOUBLE) AS rs64,
           CASE WHEN m16.rs > 0 AND m32.rs > 0 AND m64.rs > 0
                THEN (3.0e0 * ({l16} * ln(m16.rs)
                               + {l32} * ln(m32.rs)
                               + {l64} * ln(m64.rs))
                      - {sx} * (ln(m16.rs) + ln(m32.rs)
                                + ln(m64.rs)))
                     / (3.0e0 * {sxx} - {sx} * {sx})
                ELSE 'nan'::DOUBLE END AS hurst
    FROM tl
    LEFT JOIN m16 ON m16.doc_id = tl.doc_id
    LEFT JOIN m32 ON m32.doc_id = tl.doc_id
    LEFT JOIN m64 ON m64.doc_id = tl.doc_id
    """
    return q, sql


# ------------------------------------------------- forecast_ensemble_w8
def _ensemble_query(width: int = 8, alpha: float = 0.3,
                    beta: float = 0.1):
    members = [("naive", {}), ("ses", {"alpha": alpha}),
               ("holt", {"alpha": alpha, "beta": beta})]
    q = _forecast_query(width, "ensemble", {"members": members}, 1)
    a = f"{alpha}e0"
    b = f"{beta}e0"
    lupd = f"{a} * x[1] + (1.0e0 - {a}) * (acc[1] + acc[2])"
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id,
               ms[CAST(n AS INTEGER)] AS nv,
               list_reduce(ms,
                   (acc, x) -> {a} * x + (1.0e0 - {a}) * acc) AS se,
               list_reduce(
                   list_prepend([ms[1], ms[2] - ms[1]],
                                list_transform(
                                    ms[2:CAST(n AS INTEGER)],
                                    v -> [v, 0.0e0])),
                   (acc, x) -> [{lupd},
                                {b} * (({lupd}) - acc[1])
                                + (1.0e0 - {b}) * acc[2]]) AS ho
        FROM l
    )
    SELECT doc_id, 'ensemble' AS model, CAST(1 AS INTEGER) AS h,
           (nv + se + (ho[1] + 1.0e0 * ho[2])) / 3.0e0 AS yhat
    FROM st
    """
    return q, sql


# ------------------------------------------------------ events_hw_hourly
def _hw_hourly_query(period: int = HW_PERIOD, alpha: float = HW_ALPHA,
                     beta: float = HW_BETA, gamma: float = HW_GAMMA,
                     horizon: int = HW_H):
    def q(sf_dir: str):
        import ray.data as rd

        from ..models import make_model
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "event_type": pa.array([], type=pa.string()),
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            et = np.asarray(t.column("event_type").to_pylist())
            key = np.char.add(np.char.add(
                et, "|"), hour.astype(str))
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=uk.size).astype(
                np.int64)
            parts = np.char.partition(uk, "|")
            return pa.table({
                "event_type": pa.array(list(parts[:, 0]),
                                       type=pa.string()),
                "hour": pa.array(
                    parts[:, 2].astype(np.int64)),
                "cnt": pa.array(cnt),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "hour"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "event_type": g.column("event_type"),
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        h1 = int(a["hour"].max())
        span = h1 - h0 + 1
        types = sorted(a["event_type"].unique())
        out_t, out_h, out_y = [], [], []
        for et in types:
            sub = a[a["event_type"] == et]
            dense = np.zeros(span, dtype=np.int64)
            dense[sub["hour"].to_numpy(np.int64) - h0] = (
                sub["cnt"].to_numpy(np.int64))
            if span < 2 * period:
                yh = np.full(horizon, np.nan)
            else:
                # scaled by period: init sums are integer-exact
                m = make_model(
                    "holt_winters", period=period, seasonal="add",
                    optimize=False, alpha=alpha, beta=beta,
                    gamma=gamma)
                m.fit((dense * period).astype(np.float64))
                yh = np.asarray(m.predict(horizon))
            out_t += [et] * horizon
            out_h += list(range(1, horizon + 1))
            out_y += list(yh)
        return pa.table({
            "event_type": pa.array(out_t, type=pa.string()),
            "h": pa.array(out_h, type=pa.int32()),
            "yhat": pa.array(out_y, type=pa.float64()),
        })

    p = period
    a, b, g = f"{alpha}e0", f"{beta}e0", f"{gamma}e0"
    lv = " + ".join(f"ms[{j + 1}]" for j in range(p))
    lv = f"({lv}) / {float(p)}e0"
    tr = " + ".join(f"(ms[{p + j + 1}] - ms[{j + 1}]) / {float(p)}e0"
                    for j in range(p))
    tr = f"({tr}) / {float(p)}e0"
    seas = ", ".join(f"ms[{j + 1}] - lv" for j in range(p))
    sidx = "CAST(e[2] AS INTEGER)"
    lupd = (f"{a} * (e[1] - acc[{sidx} + 3]) "
            f"+ (1.0e0 - {a}) * (acc[1] + acc[2])")
    sql = f"""
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour
        FROM events
    ),
    bounds AS (
        SELECT min(hour) AS h0, max(hour) AS h1 FROM e
    ),
    grid AS (
        SELECT t.event_type, gs.hour
        FROM (SELECT DISTINCT event_type FROM e) t
        CROSS JOIN (
            SELECT unnest(generate_series(
                (SELECT h0 FROM bounds),
                (SELECT h1 FROM bounds))) AS hour) gs
    ),
    cnts AS (
        SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY event_type, hour
    ),
    l AS (
        SELECT g.event_type,
               list(CAST(COALESCE(c.c, 0) * {p} AS DOUBLE)
                    ORDER BY g.hour) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM grid g LEFT JOIN cnts c
          ON c.event_type = g.event_type AND c.hour = g.hour
        GROUP BY g.event_type
    ),
    init AS (
        SELECT event_type, ms, n, {lv} AS lv
        FROM l WHERE n >= {2 * p}
    ),
    state AS (
        SELECT event_type, n,
            list_reduce(
                list_prepend(
                    [lv, {tr}, {seas}],
                    list_transform(
                        generate_series({p + 1}, CAST(n AS INTEGER)),
                        i -> [ms[i], CAST((i - 1) % {p} AS DOUBLE)])),
                (acc, e) -> list_concat(
                    list_concat(
                        list_concat(
                            [{lupd},
                             {b} * (({lupd}) - acc[1])
                             + (1.0e0 - {b}) * acc[2]],
                            acc[3 : {sidx} + 2]),
                        [{g} * (e[1] - ({lupd}))
                         + (1.0e0 - {g}) * acc[{sidx} + 3]]),
                    acc[{sidx} + 4 : {p + 2}])
            ) AS fin
        FROM init
    )
    SELECT l.event_type, CAST(hh.h AS INTEGER) AS h,
           CASE WHEN state.event_type IS NULL THEN 'nan'::DOUBLE
                ELSE fin[1] + CAST(hh.h AS DOUBLE) * fin[2]
                     + fin[CAST((l.n + hh.h - 1) % {p} AS INTEGER)
                           + 3]
           END AS yhat
    FROM l LEFT JOIN state ON state.event_type = l.event_type
    CROSS JOIN (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def build_wave63_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_hurst_rs",) + _hurst_query()))
    add(*(("forecast_ensemble_w8",) + _ensemble_query()))
    add(*(("events_hw_hourly",) + _hw_hourly_query()))
    return queries, oracles
