"""Wave-139 queries: interarrival exponential GOF, diurnal coherence.

- events_interarrival_ks: Kolmogorov-Smirnov goodness-of-fit of the
  global interarrival gaps against the exponential with the fitted
  rate. The gap MULTISET is assembled scale-shaped: each day's
  events sort inside one bucketed group (within-day integer gaps +
  that day's first/last timestamps), and the driver adds only the
  day-boundary gaps — no global sort. Equal timestamps make zero
  gaps, and the multiset is invariant to tie order. D scans the
  unique-gap histogram with both one-sided terms around each jump;
  exp is the only transcendental and is scalar on both sides.
- events_coherence_24h: Welch-style magnitude-squared coherence
  between hourly error and total counts at the diurnal frequency
  (period 24), averaged over five-day segments (single-segment
  coherence is identically 1). Per-segment demeaned cos/sin folds
  walk t in order; the segment averages fold in segment order;
  scalar cos/sin match DuckDB's libm.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
COH_SEG_H = 120  # 5-day segments


# --------------------------------------------------- events_interarrival_ks
def _interarrival_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // US_PER_DAY
            return pa.table({
                "day": pa.array(day.astype(np.int64)),
                "tus": pa.array(tus),
            })

        def day_gaps(g: pa.Table) -> pa.Table:
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            gaps = np.diff(tus)
            uv, c = np.unique(gaps, return_counts=True)
            day = int(g.column("day")[0].as_py())
            # gap histogram rows (kind 0) + one boundary row (kind 1)
            return pa.table({
                "kind": pa.array(
                    [0] * len(uv) + [1], type=pa.int8()),
                "a": pa.array(
                    list(uv.astype(np.int64))
                    + [int(tus[0])], type=pa.int64()),
                "b": pa.array(
                    list(c.astype(np.int64))
                    + [int(tus[-1])], type=pa.int64()),
                "day": pa.array([day] * (len(uv) + 1),
                                type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hist = t.filter(pc.equal(t.column("kind"), 0))
            bnd = t.filter(pc.equal(t.column("kind"), 1))
            hg = hist.group_by("a").aggregate([("b", "sum")])
            out = pa.table({
                "kind": pa.array(
                    np.zeros(hg.num_rows, dtype=np.int8),
                    type=pa.int8()),
                "a": hg.column("a").cast(pa.int64()),
                "b": hg.column("b_sum").cast(pa.int64()),
                "day": pa.array(
                    np.zeros(hg.num_rows, dtype=np.int64)),
            })
            return pa.concat_tables([out, bnd.select(
                ["kind", "a", "b", "day"])])

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("day")
            .map_groups(day_gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        hist = {}
        for _, r in m[m["kind"] == 0].iterrows():
            hist[int(r["a"])] = hist.get(int(r["a"]), 0) \
                + int(r["b"])
        bnd = m[m["kind"] == 1].sort_values("day")
        firsts = bnd["a"].to_numpy(np.int64)
        lasts = bnd["b"].to_numpy(np.int64)
        for i in range(len(bnd) - 1):
            gap = int(firsts[i + 1]) - int(lasts[i])
            hist[gap] = hist.get(gap, 0) + 1

        vals = sorted(hist)
        n = sum(hist.values())
        nf = float(n)
        total_us = 0
        for v in vals:
            total_us += v * hist[v]
        mean_s = (float(total_us) / 1000000.0) / nf
        lam = 1.0 / mean_s

        d_stat = 0.0
        cum = 0
        for v in vals:
            prev = cum
            cum += hist[v]
            f = 1.0 - math.exp(-lam * (float(v)
                                       / 1000000.0))
            d1 = (float(cum) / nf) - f
            d2 = f - (float(prev) / nf)
            if d1 > d_stat:
                d_stat = d1
            if d2 > d_stat:
                d_stat = d2
        return pa.table({
            "n_gaps": pa.array([n], type=pa.int64()),
            "mean_gap_s": pa.array([mean_s],
                                   type=pa.float64()),
            "lambda_hz": pa.array([lam], type=pa.float64()),
            "ks_d": pa.array([d_stat], type=pa.float64()),
        })

    sql = """
    WITH gaps AS (
        SELECT e - lag(e) OVER (ORDER BY e) AS g
        FROM (SELECT epoch_us(ts) AS e FROM events)
    ),
    hist AS (
        SELECT g, CAST(count(*) AS BIGINT) AS c
        FROM gaps WHERE g IS NOT NULL GROUP BY g
    ),
    nn AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c) AS DOUBLE) AS nf,
               1.0e0 / ((CAST(sum(CAST(g AS HUGEINT) * c)
                              AS DOUBLE) / 1000000.0e0)
                        / CAST(sum(c) AS DOUBLE)) AS lam,
               (CAST(sum(CAST(g AS HUGEINT) * c) AS DOUBLE)
                / 1000000.0e0) / CAST(sum(c) AS DOUBLE)
                   AS mean_s
        FROM hist
    ),
    scan AS (
        SELECT g, c,
               CAST(sum(c) OVER (ORDER BY g
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
        FROM hist
    )
    SELECT nn.n AS n_gaps,
           nn.mean_s AS mean_gap_s,
           nn.lam AS lambda_hz,
           (SELECT max(GREATEST(
                (CAST(cum AS DOUBLE) / nn.nf)
                    - (1.0e0 - exp(-nn.lam
                         * (CAST(g AS DOUBLE) / 1000000.0e0))),
                (1.0e0 - exp(-nn.lam
                     * (CAST(g AS DOUBLE) / 1000000.0e0)))
                    - (CAST(cum - c AS DOUBLE) / nn.nf)))
            FROM scan) AS ks_d
    FROM nn
    """
    return q, sql


# ----------------------------------------------------- events_coherence_24h
def _coherence_query(seg_h: int = COH_SEG_H):
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
        n = hmax - hmin + 1
        x = np.zeros(n, dtype=np.int64)
        y = np.zeros(n, dtype=np.int64)
        idx = h["hour"].to_numpy(np.int64) - hmin
        x[idx] = h["tot"].to_numpy(np.int64)
        y[idx] = h["err"].to_numpy(np.int64)
        n_seg = n // seg_h
        w = 2.0 * math.pi / 24.0

        sxx = 0.0
        syy = 0.0
        sre = 0.0
        sim = 0.0
        for s in range(n_seg):
            xs = x[s * seg_h:(s + 1) * seg_h]
            ys = y[s * seg_h:(s + 1) * seg_h]
            mx = float(int(xs.sum())) / float(seg_h)
            my = float(int(ys.sum())) / float(seg_h)
            ax = bx = ay = by = 0.0
            for t_i in range(seg_h):
                cw = math.cos(w * float(t_i))
                sw = math.sin(w * float(t_i))
                dx = float(xs[t_i]) - mx
                dy = float(ys[t_i]) - my
                ax = ax + dx * cw
                bx = bx + dx * sw
                ay = ay + dy * cw
                by = by + dy * sw
            sxx = sxx + (ax * ax + bx * bx)
            syy = syy + (ay * ay + by * by)
            sre = sre + (ax * ay + bx * by)
            sim = sim + (bx * ay - ax * by)
        coh = (sre * sre + sim * sim) / (sxx * syy)
        return pa.table({
            "n_segments": pa.array([n_seg], type=pa.int64()),
            "pxx": pa.array([sxx], type=pa.float64()),
            "pyy": pa.array([syy], type=pa.float64()),
            "coherence": pa.array([coh], type=pa.float64()),
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
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS i,
               COALESCE(hc.tot, 0) AS x,
               COALESCE(hc.err, 0) AS y
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    segd AS (
        SELECT i // {seg_h} AS s, i % {seg_h} AS t, x, y
        FROM grid, (SELECT count(*) // {seg_h} AS k FROM grid)
        WHERE i < k * {seg_h}
    ),
    mus AS (
        SELECT s,
               CAST(sum(x) AS DOUBLE)
                   / CAST({seg_h} AS DOUBLE) AS mx,
               CAST(sum(y) AS DOUBLE)
                   / CAST({seg_h} AS DOUBLE) AS my
        FROM segd GROUP BY s
    ),
    segf AS (
        SELECT d.s,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(d.x AS DOUBLE) - m.mx)
                        * cos(2.0e0 * pi() / 24.0e0
                              * CAST(d.t AS DOUBLE))
                        ORDER BY d.t)), (p, v) -> p + v) AS ax,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(d.x AS DOUBLE) - m.mx)
                        * sin(2.0e0 * pi() / 24.0e0
                              * CAST(d.t AS DOUBLE))
                        ORDER BY d.t)), (p, v) -> p + v) AS bx,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(d.y AS DOUBLE) - m.my)
                        * cos(2.0e0 * pi() / 24.0e0
                              * CAST(d.t AS DOUBLE))
                        ORDER BY d.t)), (p, v) -> p + v) AS ay,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(d.y AS DOUBLE) - m.my)
                        * sin(2.0e0 * pi() / 24.0e0
                              * CAST(d.t AS DOUBLE))
                        ORDER BY d.t)), (p, v) -> p + v) AS by
        FROM segd d JOIN mus m ON m.s = d.s
        GROUP BY d.s, m.mx, m.my
    ),
    folds AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_segments,
            list_reduce(list_prepend(0.0e0,
                list(ax * ax + bx * bx ORDER BY s)),
                (p, v) -> p + v) AS pxx,
            list_reduce(list_prepend(0.0e0,
                list(ay * ay + by * by ORDER BY s)),
                (p, v) -> p + v) AS pyy,
            list_reduce(list_prepend(0.0e0,
                list(ax * ay + bx * by ORDER BY s)),
                (p, v) -> p + v) AS sre,
            list_reduce(list_prepend(0.0e0,
                list(bx * ay - ax * by ORDER BY s)),
                (p, v) -> p + v) AS sim
        FROM segf
    )
    SELECT n_segments, pxx, pyy,
           (sre * sre + sim * sim) / (pxx * pyy) AS coherence
    FROM folds
    """
    return q, sql


def build_wave139_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_interarrival_ks",) + _interarrival_query()))
    add(*(("events_coherence_24h",) + _coherence_query()))
    return queries, oracles
