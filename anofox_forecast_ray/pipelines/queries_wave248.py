"""Wave-248 queries: circular two-sample test and Hawkes endogeny.

events_watson_u2: Watson's two-sample U² — the rotation-invariant
Cramer-von Mises variant, the right two-sample test for
hour-of-day (circular) data — comparing the error vs purchase
hour-of-day distributions.  On the pooled 24-bin histogram the CDF
gap cross-multiplies to integers e_k = m·cum1_k − n·cum2_k, and the
tie-weighted variance collapses to ONE float division:
U² = (N·Σc·e² − (Σc·e)²) / (N³·n·m).  Σc·e² needs HUGEINT.

events_hawkes_branching: the moment estimator of a Hawkes process's
branching ratio from the Fano factor of window counts: for a
stationary Hawkes process the count dispersion over long windows
satisfies F → 1/(1−n)², so n̂ = 1 − 1/√F (clamped at 0; F from
integer moments with the n−1 sample variance).  Reported at both the
hourly and daily window scales — rising n̂ with scale is the
clustered-arrivals signature.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def watson_u2_from_hist(c1, c2):
    """U² from two aligned per-value count vectors (ascending order)."""
    n = sum(c1)
    m = sum(c2)
    nn = n + m
    cum1 = cum2 = 0
    sce = 0
    sce2 = 0
    for a, b in zip(c1, c2):
        c = a + b
        if c == 0:
            continue
        cum1 += a
        cum2 += b
        e = m * cum1 - n * cum2
        sce += c * e
        sce2 += c * e * e
    u2 = (float(nn * sce2 - sce * sce)
          / (float(nn) * float(nn) * float(nn)
             * float(n) * float(m)))
    return n, m, u2


def fano_branching(x):
    """(fano, branching) from integer counts, n-1 sample variance."""
    n = len(x)
    sx = sum(x)
    sxx = sum(v * v for v in x)
    fn = float(n)
    fano = ((float(n * sxx - sx * sx) / (fn * (fn - 1.0)))
            / (float(sx) / fn))
    branching = 1.0 - 1.0 / math.sqrt(fano) if fano > 1.0 else 0.0
    return fano, branching


def _hourly_counts(sf_dir: str, event_type: str | None = None):
    """Dense per-hour integer counts (optionally one event type)."""
    import ray.data as rd

    from .queries import _num_read_blocks
    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "hour": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if event_type is not None:
            et = np.asarray(t.column("event_type").to_pylist())
            tus = tus[et == event_type]
        if tus.size == 0:
            return empty
        hour = tus // US_PER_HOUR
        uk, cnt = np.unique(hour, return_counts=True)
        return pa.table({
            "hour": pa.array(uk, type=pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("hour").aggregate([("cnt", "sum")])
        return pa.table({
            "hour": g.column("hour").cast(pa.int64()),
            "cnt": g.column("cnt_sum").cast(pa.int64()),
        })

    cols = ["ts"] if event_type is None else ["ts", "event_type"]
    refs = list(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=cols,
            override_num_blocks=_num_read_blocks(),
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    a = tree_reduce_tables(refs, merge).to_pandas()
    h0 = int(a["hour"].min())
    span = int(a["hour"].max()) - h0 + 1
    x = np.zeros(span, dtype=np.int64)
    x[a["hour"].to_numpy(np.int64) - h0] = a["cnt"].to_numpy(
        np.int64)
    return h0, x


# ------------------------------------------------- events_watson_u2
def _watson_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "c1": pa.array([], type=pa.int64()),
                "c2": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hod = (tus // US_PER_HOUR) % 24
            grid = np.arange(24, dtype=np.int64)
            c1 = np.bincount(hod[et == "error"], minlength=24)
            c2 = np.bincount(hod[et == "purchase"], minlength=24)
            return pa.table({
                "hod": pa.array(grid),
                "c1": pa.array(c1.astype(np.int64)),
                "c2": pa.array(c2.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hod").aggregate(
                [("c1", "sum"), ("c2", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "c1": g.column("c1_sum").cast(pa.int64()),
                "c2": g.column("c2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = (tree_reduce_tables(refs, merge).to_pandas()
             .sort_values("hod"))
        n, m, u2 = watson_u2_from_hist(
            [int(v) for v in h["c1"]], [int(v) for v in h["c2"]])
        return pa.table({
            "n_errors": pa.array([n], type=pa.int64()),
            "n_purchases": pa.array([m], type=pa.int64()),
            "watson_u2": pa.array([u2], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS i1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS i2
        FROM events
        WHERE event_type IN ('error', 'purchase')
    ),
    h AS (
        SELECT hod,
               CAST(sum(i1) AS BIGINT) AS c1,
               CAST(sum(i2) AS BIGINT) AS c2
        FROM ev GROUP BY hod
    ),
    nn AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n,
               CAST(sum(c2) AS BIGINT) AS m
        FROM h
    ),
    w AS (
        SELECT c1 + c2 AS c,
               (SELECT m FROM nn)
                   * CAST(sum(c1) OVER (ORDER BY hod
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - (SELECT n FROM nn)
                   * CAST(sum(c2) OVER (ORDER BY hod
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
        FROM h
    ),
    s AS (
        SELECT CAST(sum(CAST(c AS HUGEINT) * CAST(e AS HUGEINT))
                    AS HUGEINT) AS sce,
               CAST(sum(CAST(c AS HUGEINT) * CAST(e AS HUGEINT)
                        * CAST(e AS HUGEINT)) AS HUGEINT) AS sce2
        FROM w
    )
    SELECT nn.n AS n_errors, nn.m AS n_purchases,
           CAST(CAST(nn.n + nn.m AS HUGEINT) * s.sce2
                - s.sce * s.sce AS DOUBLE)
           / (CAST(nn.n + nn.m AS DOUBLE)
              * CAST(nn.n + nn.m AS DOUBLE)
              * CAST(nn.n + nn.m AS DOUBLE)
              * CAST(nn.n AS DOUBLE) * CAST(nn.m AS DOUBLE))
               AS watson_u2
    FROM s CROSS JOIN nn
    """
    return q, sql


# ------------------------------------------- events_hawkes_branching
def _hawkes_query():
    def q(sf_dir: str):
        h0, xh = _hourly_counts(sf_dir)
        fano_h, br_h = fano_branching([int(v) for v in xh])
        # daily counts = exact integer 24-hour block sums of the
        # dense hourly grid (every event lies inside the hour span)
        days = (np.arange(h0, h0 + xh.size) // 24) - h0 // 24
        xd = np.zeros(int(days.max()) + 1, dtype=np.int64)
        np.add.at(xd, days, xh)
        fano_d, br_d = fano_branching([int(v) for v in xd])
        return pa.table({
            "fano_hourly": pa.array([fano_h], type=pa.float64()),
            "branching_hourly": pa.array([br_h],
                                         type=pa.float64()),
            "fano_daily": pa.array([fano_d], type=pa.float64()),
            "branching_daily": pa.array([br_d], type=pa.float64()),
        })

    br = ("CASE WHEN {f} > 1.0 THEN 1.0 - 1.0 / sqrt({f}) "
          "ELSE 0.0 END")
    fano = ("(CAST({n} * {sxx} - {sx} * {sx} AS DOUBLE)"
            " / (CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1.0)))"
            " / (CAST({sx} AS DOUBLE) / CAST({n} AS DOUBLE))")
    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               epoch_us(ts) // {US_PER_DAY} AS day
        FROM events
    ),
    hspan AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
    hgrid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS hour
        FROM hspan
    ),
    hx AS (
        SELECT CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM hgrid g LEFT JOIN (
            SELECT hour, count(*) AS cnt FROM ev GROUP BY hour
        ) c ON g.hour = c.hour
    ),
    hs AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM hx
    ),
    dgrid AS (
        SELECT CAST(unnest(generate_series(
                   (SELECT lo FROM hspan) // 24,
                   (SELECT hi FROM hspan) // 24))
               AS BIGINT) AS day
    ),
    dx AS (
        SELECT CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM dgrid g LEFT JOIN (
            SELECT hour // 24 AS day, count(*) AS cnt
            FROM ev GROUP BY hour // 24
        ) c ON g.day = c.day
    ),
    ds AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM dx
    )
    SELECT
        {fano.format(n='hs.n', sx='hs.sx', sxx='hs.sxx')}
            AS fano_hourly,
        {br.format(f=fano.format(n='hs.n', sx='hs.sx',
                                 sxx='hs.sxx'))}
            AS branching_hourly,
        {fano.format(n='ds.n', sx='ds.sx', sxx='ds.sxx')}
            AS fano_daily,
        {br.format(f=fano.format(n='ds.n', sx='ds.sx',
                                 sxx='ds.sxx'))}
            AS branching_daily
    FROM hs CROSS JOIN ds
    """
    return q, sql


def build_wave248_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_watson_u2",) + _watson_query()))
    add(*(("events_hawkes_branching",) + _hawkes_query()))
    return queries, oracles
