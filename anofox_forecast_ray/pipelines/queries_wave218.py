"""Wave-218 queries: Mann-Kendall + Sen slope, Borda count.

- events_daily_mann_kendall: the plain (non-seasonal) Mann-Kendall
  trend test on the zero-filled daily error-count series, with the
  full tie-corrected variance Var(S) = [n(n-1)(2n+5) -
  sum t(t-1)(2t+5)]/18 and the continuity-corrected z (S is a pure
  integer pair sum). Sen's slope is the median of the pairwise
  (x_j - x_i)/(j - i) doubles, selected by explicit row_number
  rank (odd/even handled as in Passing-Bablok).
- supplier_borda: the Borda-count voting rule over monthly revenue
  contests (the positional complement of wave-171's Condorcet/
  Copeland): each month ranks suppliers by exact revenue cents
  (ties by suppkey), awarding K - rank points; emits the top 5
  total scores (score DESC, suppkey ASC) — all integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
BORDA_K = 5


def mann_kendall(x):
    """(s, var_num, z, sen) over the daily series."""
    n = len(x)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = int(x[j]) - int(x[i])
            if d > 0:
                s += 1
            elif d < 0:
                s -= 1
            slopes.append(d / (j - i))
    import collections

    cnt = collections.Counter(int(v) for v in x)
    tie_term = 0
    for t in cnt.values():
        tie_term += t * (t - 1) * (2 * t + 5)
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    var = var_num / 18.0e0
    import math

    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    slopes.sort()
    m = len(slopes)
    if m % 2 == 1:
        sen = slopes[m // 2]
    else:
        sen = (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0e0
    return s, var_num, z, sen


# ------------------------------------------ events_daily_mann_kendall
def _mk_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error")
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            cnt = np.bincount((day[err] - lo).astype(np.int64),
                              minlength=span).astype(np.int64)
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(cnt),
                "lo": pa.array(np.full(span, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(span, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("day")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            c[g.index.to_numpy(np.int64) - lo] = g.to_numpy(
                np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(c),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        x = [int(v) for v in h["c"]]
        s, var_num, z, sen = mann_kendall(x)
        return pa.table({
            "mk_s": pa.array([s], type=pa.int64()),
            "var_num": pa.array([var_num], type=pa.int64()),
            "mk_z": pa.array([z], type=pa.float64()),
            "sen_slope": pa.array([sen], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.err, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_err) AS err FROM e GROUP BY day
        ) c ON g.day = c.day
    ),
    pairs AS (
        SELECT a.x AS xa, b.x AS xb, b.i - a.i AS gap
        FROM d a JOIN d b ON a.i < b.i
    ),
    sstat AS (
        SELECT CAST(sum(CASE WHEN xb > xa THEN 1
                             WHEN xb < xa THEN -1
                             ELSE 0 END) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS m
        FROM pairs
    ),
    ties AS (
        SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                   AS tt
        FROM (SELECT CAST(count(*) AS BIGINT) AS t
              FROM d GROUP BY x)
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    var_t AS (
        SELECT nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt
                   AS var_num
        FROM nn CROSS JOIN ties
    ),
    ranked AS (
        SELECT CAST(xb - xa AS DOUBLE) / CAST(gap AS DOUBLE)
                   AS sl,
               row_number() OVER (ORDER BY
                   CAST(xb - xa AS DOUBLE)
                   / CAST(gap AS DOUBLE)) AS r
        FROM pairs
    ),
    sen AS (
        SELECT CASE WHEN (SELECT m FROM sstat) % 2 = 1
               THEN (SELECT sl FROM ranked
                     WHERE r = (SELECT m FROM sstat) // 2 + 1)
               ELSE ((SELECT sl FROM ranked
                      WHERE r = (SELECT m FROM sstat) // 2)
                     + (SELECT sl FROM ranked
                        WHERE r = (SELECT m FROM sstat) // 2
                                + 1)) / 2.0e0
               END AS sen
        FROM (SELECT 1)
    )
    SELECT (SELECT s FROM sstat) AS mk_s,
           (SELECT var_num FROM var_t) AS var_num,
           CASE WHEN (SELECT s FROM sstat) > 0
                THEN CAST((SELECT s FROM sstat) - 1 AS DOUBLE)
                     / sqrt(CAST((SELECT var_num FROM var_t)
                                 AS DOUBLE) / 18.0e0)
                WHEN (SELECT s FROM sstat) < 0
                THEN CAST((SELECT s FROM sstat) + 1 AS DOUBLE)
                     / sqrt(CAST((SELECT var_num FROM var_t)
                                 AS DOUBLE) / 18.0e0)
                ELSE 0.0e0 END AS mk_z,
           (SELECT sen FROM sen) AS sen_slope
    FROM (SELECT 1)
    """
    return q, sql


# ----------------------------------------------------- supplier_borda
def _borda_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ship = t.column("l_shipdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            sk = t.column("l_suppkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(t.column("l_extendedprice")
                             .to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)
            import pandas as pd

            df = pd.DataFrame({"m": month, "s": sk, "c": cents})
            g = df.groupby(["m", "s"])["c"].sum().reset_index()
            return pa.table({
                "m": pa.array(g["m"].astype("int64")),
                "s": pa.array(g["s"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby(["m", "s"])["c"].sum().reset_index()
            return pa.table({
                "m": pa.array(g["m"].astype("int64")),
                "s": pa.array(g["s"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_suppkey",
                         "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        scores = {}
        for m, grp in h.groupby("m"):
            rows = sorted(zip(grp["c"], -grp["s"].astype(int)),
                          reverse=True)
            K = len(rows)
            for rank, (c, negs) in enumerate(rows, start=1):
                s = -negs
                scores[s] = scores.get(s, 0) + (K - rank)
        top = sorted(scores.items(),
                     key=lambda kv: (-kv[1], kv[0]))[:BORDA_K]
        return pa.table({
            "s_suppkey": pa.array([t[0] for t in top],
                                  type=pa.int64()),
            "borda_score": pa.array([t[1] for t in top],
                                    type=pa.int64()),
        })

    sql = f"""
    WITH rev AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS m,
               CAST(l_suppkey AS BIGINT) AS s,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                             0) AS BIGINT)) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT m, s,
               row_number() OVER (PARTITION BY m
                   ORDER BY c DESC, s ASC) AS rk,
               CAST(count(*) OVER (PARTITION BY m) AS BIGINT)
                   AS k
        FROM rev
    ),
    scores AS (
        SELECT s, CAST(sum(k - rk) AS BIGINT) AS score
        FROM ranked GROUP BY s
    ),
    top AS (
        SELECT s, score,
               row_number() OVER (ORDER BY score DESC, s ASC)
                   AS rk
        FROM scores
    )
    SELECT s AS s_suppkey, score AS borda_score
    FROM top WHERE rk <= {BORDA_K}
    """
    return q, sql


def build_wave218_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_daily_mann_kendall",) + _mk_query()))
    add(*(("supplier_borda",) + _borda_query()))
    return queries, oracles
