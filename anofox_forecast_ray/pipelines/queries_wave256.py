"""Wave-256 queries: Hodges-Lehmann shift and A/B power analysis.

source_hodges_lehmann_shift: the two-sample Hodges-Lehmann location
shift between src0/src1 doc lengths — the median of all n1·n2
pairwise differences.  Computed EXACTLY from the bounded per-value
histograms: the difference histogram (value-pair cross join, weight
c0·c1) is selected at the doubled-median order statistics
(P−1)//2 and P//2, so the doubled estimate is a pure integer and
the only float is the final /2.  The robust-shift companion of
source_brunner_munzel / source_cliffs_delta on the same samples.

events_ab_power: classical two-proportion power analysis anchored on
the observed first-half vs second-half error rates — the required
per-group sample size n = (z_{.975}·√(2p̄q̄) + z_{.80}·√(p1q1+p2q2))²
/ (p1−p2)².  All inputs are four integer counts; the two normal
quantiles use the repo's A&S 26.2.23 approximation spelled
identically in SQL, so the whole row is bitwise-reproducible.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

from .queries_wave255 import _qn

US_PER_DAY = 86_400_000_000


def hodges_lehmann_from_hist(c0, c1, vals):
    """(n_pairs, hl2, hl) — doubled HL shift from per-value counts."""
    va = [(v, c) for v, c in zip(vals, c0) if c > 0]
    vb = [(v, c) for v, c in zip(vals, c1) if c > 0]
    diffs = {}
    for v0, ca in va:
        for v1, cb in vb:
            d = v0 - v1
            diffs[d] = diffs.get(d, 0) + ca * cb
    p = sum(diffs.values())
    lo_i = (p - 1) // 2
    hi_i = p // 2
    cum = 0
    lo = hi = None
    for d in sorted(diffs):
        nxt = cum + diffs[d]
        if lo is None and lo_i < nxt:
            lo = d
        if hi is None and hi_i < nxt:
            hi = d
        cum = nxt
    hl2 = lo + hi
    return p, hl2, float(hl2) / 2.0


def ab_power(e1, t1, e2, t2):
    """(p1, p2, n_required) two-proportion 5%/80% power formula."""
    p1 = float(e1) / float(t1)
    p2 = float(e2) / float(t2)
    pbar = float(e1 + e2) / float(t1 + t2)
    za = _qn(0.975)
    zb = _qn(0.8)
    num = (za * math.sqrt(2.0 * pbar * (1.0 - pbar))
           + zb * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
    d = p1 - p2
    n_req = (num * num) / (d * d)
    return p1, p2, n_req


# ------------------------------------- source_hodges_lehmann_shift
def _hl_query():
    def q(sf_dir: str):
        from .queries_wave180 import _two_source_hist

        h = _two_source_hist(sf_dir)
        p, hl2, hl = hodges_lehmann_from_hist(
            [int(v) for v in h["c0"]], [int(v) for v in h["c1"]],
            [int(v) for v in h["v"]])
        return pa.table({
            "n_pairs": pa.array([p], type=pa.int64()),
            "hl2": pa.array([hl2], type=pa.int64()),
            "hl_shift": pa.array([hl], type=pa.float64()),
        })

    from .queries_wave180 import _SQL_HIST

    sql = f"""
    WITH {_SQL_HIST},
    dh AS (
        SELECT a.v - b.v AS d,
               CAST(sum(a.c0 * b.c1) AS BIGINT) AS w
        FROM h a JOIN h b ON a.c0 > 0 AND b.c1 > 0
        GROUP BY a.v - b.v
    ),
    nn AS (SELECT CAST(sum(w) AS BIGINT) AS p FROM dh),
    cums AS (
        SELECT d, w,
               CAST(coalesce(sum(w) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS b
        FROM dh
    ),
    sel AS (
        SELECT
            (SELECT d FROM cums, nn
             WHERE (nn.p - 1) // 2 >= b
               AND (nn.p - 1) // 2 < b + w LIMIT 1)
            + (SELECT d FROM cums, nn
               WHERE nn.p // 2 >= b AND nn.p // 2 < b + w
               LIMIT 1) AS hl2
    )
    SELECT nn.p AS n_pairs,
           CAST(sel.hl2 AS BIGINT) AS hl2,
           CAST(sel.hl2 AS DOUBLE) / 2.0 AS hl_shift
    FROM nn CROSS JOIN sel
    """
    return q, sql


# ------------------------------------------------- events_ab_power
def _power_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "e": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            ud, inv = np.unique(day, return_inverse=True)
            e = np.bincount(inv[et == "error"], minlength=ud.size)
            n = np.bincount(inv, minlength=ud.size)
            return pa.table({
                "day": pa.array(ud.astype(np.int64)),
                "e": pa.array(e.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate(
                [("e", "sum"), ("n", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "e": g.column("e_sum").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = (tree_reduce_tables(refs, merge).to_pandas()
             .sort_values("day").reset_index(drop=True))
        lo = int(a["day"].min())
        hi = int(a["day"].max())
        mid = lo + (hi - lo + 1) // 2
        first = a[a["day"] < mid]
        second = a[a["day"] >= mid]
        e1, t1 = int(first["e"].sum()), int(first["n"].sum())
        e2, t2 = int(second["e"].sum()), int(second["n"].sum())
        p1, p2, n_req = ab_power(e1, t1, e2, t2)
        return pa.table({
            "errors_h1": pa.array([e1], type=pa.int64()),
            "errors_h2": pa.array([e2], type=pa.int64()),
            "rate_h1": pa.array([p1], type=pa.float64()),
            "rate_h2": pa.array([p2], type=pa.float64()),
            "n_required": pa.array([n_req], type=pa.float64()),
        })

    qn = """
        ({t} - (2.515517e0 + 0.802853e0 * {t}
                + 0.010328e0 * {t} * {t})
         / (1.0e0 + 1.432788e0 * {t} + 0.189269e0 * {t} * {t}
            + 0.001308e0 * {t} * {t} * {t}))
    """
    za_t = "sqrt(-2.0e0 * ln(1.0e0 - 0.975e0))"
    zb_t = "sqrt(-2.0e0 * ln(1.0e0 - 0.8e0))"
    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (
        SELECT min(day) AS lo,
               min(day) + (max(day) - min(day) + 1) // 2 AS mid
        FROM ev
    ),
    halves AS (
        SELECT CASE WHEN day < (SELECT mid FROM span)
                    THEN 0 ELSE 1 END AS h,
               CAST(sum(is_e) AS BIGINT) AS e,
               CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1
    ),
    c AS (
        SELECT
            (SELECT e FROM halves WHERE h = 0) AS e1,
            (SELECT n FROM halves WHERE h = 0) AS t1,
            (SELECT e FROM halves WHERE h = 1) AS e2,
            (SELECT n FROM halves WHERE h = 1) AS t2
    ),
    f AS (
        SELECT e1, e2,
               CAST(e1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS p1,
               CAST(e2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS p2,
               CAST(e1 + e2 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE)
                   AS pbar,
               {qn.format(t='za_t')} AS za,
               {qn.format(t='zb_t')} AS zb
        FROM c, (SELECT {za_t} AS za_t, {zb_t} AS zb_t)
    )
    SELECT e1 AS errors_h1,
           e2 AS errors_h2,
           p1 AS rate_h1,
           p2 AS rate_h2,
           ((za * sqrt(2.0e0 * pbar * (1.0e0 - pbar))
             + zb * sqrt(p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2)))
            * (za * sqrt(2.0e0 * pbar * (1.0e0 - pbar))
               + zb * sqrt(p1 * (1.0e0 - p1)
                           + p2 * (1.0e0 - p2))))
           / ((p1 - p2) * (p1 - p2)) AS n_required
    FROM f
    """
    return q, sql


def build_wave256_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_hodges_lehmann_shift",) + _hl_query()))
    add(*(("events_ab_power",) + _power_query()))
    return queries, oracles
