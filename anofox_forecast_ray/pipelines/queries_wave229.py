"""Wave-229 queries: Poisson CUSUM chart, Wilcoxon signed-rank.

- events_poisson_cusum: the one-sided Poisson CUSUM control chart
  for count data (the SPC sibling of the EWMA/p-chart/I-MR family):
  S_t = max(0, S_{t-1} + x_t - k) over daily error counts with the
  integer reference value k = floor(mean)+1 and decision interval
  h = 5k; emits alarms (S > h resets to 0) and the max excursion —
  a PURE INTEGER fold, bitwise by construction.
- customer_signed_rank: the one-sample Wilcoxon signed-rank test
  that the MEDIAN account balance is zero (balances go negative):
  zeros dropped, DOUBLED midranks of |x| make tie handling exact
  ints, W+ = sum of doubled ranks of positive balances (int64),
  z = (W+ - n(n+1)/2) / sqrt(tie-corrected variance) where all
  numerators stay integer until two final divisions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def poisson_cusum(x, k: int, h: int):
    """(n_alarms, max_s, s_end) integer fold with reset."""
    s = 0
    alarms = 0
    max_s = 0
    for v in x:
        s = s + int(v) - k
        if s < 0:
            s = 0
        if s > max_s:
            max_s = s
        if s > h:
            alarms += 1
            s = 0
    return alarms, max_s, s


def signed_rank(vals):
    """(n_used, w2_plus, z) with doubled midranks of |x|."""
    import collections

    nz = [int(v) for v in vals if v != 0]
    n = len(nz)
    cnt = collections.Counter(abs(v) for v in nz)
    cum = 0
    m2 = {}
    for a in sorted(cnt):
        c = cnt[a]
        m2[a] = 2 * cum + c + 1
        cum += c
    w2 = 0
    for v in nz:
        if v > 0:
            w2 += m2[abs(v)]
    # E[2W+] = n(n+1)/2 * 2 / 2 ... with doubled ranks:
    # E[W2] = sum of all doubled ranks / 2 = n(n+1)/2
    e2 = n * (n + 1) // 2 * 2  # = n(n+1)
    # Var(2W+) = 4 Var(W+) = 4 * [n(n+1)(2n+1)/24 - tie/48]
    tie = 0
    for c in cnt.values():
        tie += c * c * c - c
    var4 = (n * (n + 1) * (2 * n + 1)) / 6.0e0 - tie / 12.0e0
    z = (2 * w2 - e2) / (2.0e0 * math.sqrt(var4))
    return n, w2, z


# ---------------------------------------------- events_poisson_cusum
def _pcusum_query():
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
        hh = tree_reduce_tables(refs, merge).to_pandas()
        hh = hh.sort_values("day").reset_index(drop=True)
        x = [int(v) for v in hh["c"]]
        total = sum(x)
        k = total // len(x) + 1
        h = 5 * k
        alarms, max_s, s_end = poisson_cusum(x, k, h)
        return pa.table({
            "ref_k": pa.array([k], type=pa.int64()),
            "n_alarms": pa.array([alarms], type=pa.int64()),
            "max_s": pa.array([max_s], type=pa.int64()),
            "s_end": pa.array([s_end], type=pa.int64()),
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
        SELECT g.day, CAST(coalesce(c.err, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_err) AS err FROM e GROUP BY day
        ) c ON g.day = c.day
    ),
    kk AS (
        SELECT CAST(sum(x) // count(*) + 1 AS BIGINT) AS k
        FROM d
    ),
    fold AS (
        SELECT list_reduce(
                   list_prepend([0.0e0, 0.0e0, 0.0e0],
                       (SELECT list([CAST(x AS DOUBLE),
                                     CAST(kk.k AS DOUBLE)]
                                    ORDER BY day)
                        FROM d CROSS JOIN kk)),
                   (a, e2) -> [
                       CASE WHEN (CASE WHEN a[1] + e2[1] - e2[2]
                                       < 0.0e0 THEN 0.0e0
                                  ELSE a[1] + e2[1] - e2[2]
                                  END) > 5.0e0 * e2[2]
                            THEN 0.0e0
                            ELSE CASE WHEN a[1] + e2[1] - e2[2]
                                      < 0.0e0 THEN 0.0e0
                                 ELSE a[1] + e2[1] - e2[2] END
                       END,
                       a[2] + CASE WHEN (CASE WHEN a[1] + e2[1]
                                  - e2[2] < 0.0e0 THEN 0.0e0
                                  ELSE a[1] + e2[1] - e2[2]
                                  END) > 5.0e0 * e2[2]
                              THEN 1.0e0 ELSE 0.0e0 END,
                       CASE WHEN (CASE WHEN a[1] + e2[1] - e2[2]
                                       < 0.0e0 THEN 0.0e0
                                  ELSE a[1] + e2[1] - e2[2]
                                  END) > a[3]
                            THEN CASE WHEN a[1] + e2[1] - e2[2]
                                      < 0.0e0 THEN 0.0e0
                                 ELSE a[1] + e2[1] - e2[2] END
                            ELSE a[3] END]) AS f
        FROM (SELECT 1)
    )
    SELECT (SELECT k FROM kk) AS ref_k,
           CAST(f[2] AS BIGINT) AS n_alarms,
           CAST(f[3] AS BIGINT) AS max_s,
           CAST(f[1] AS BIGINT) AS s_end
    FROM fold
    """
    return q, sql


# ---------------------------------------------- customer_signed_rank
def _signed_rank_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("c_acctbal").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            cents = cents[cents != 0]
            av = np.abs(cents)
            pos = (cents > 0).astype(np.int64)
            import pandas as pd

            df = pd.DataFrame({"a": av, "p": pos})
            g = (df.groupby("a")
                 .agg(c=("p", "size"), cp=("p", "sum"))
                 .reset_index())
            return pa.table({
                "a": pa.array(g["a"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
                "cp": pa.array(g["cp"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("a").aggregate(
                [("c", "sum"), ("cp", "sum")])
            return pa.table({
                "a": g.column("a").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
                "cp": g.column("cp_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "customer", ["c_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("a").reset_index(drop=True)
        a = h["a"].to_numpy(np.int64)
        c = h["c"].to_numpy(np.int64)
        cp = h["cp"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        before = np.concatenate(([0], cum[:-1]))
        m2 = 2 * before + c + 1
        w2 = int((cp * m2).sum())
        e2 = n * (n + 1)
        tie = int((c * c * c - c).sum())
        var4 = (n * (n + 1) * (2 * n + 1)) / 6.0e0 \
            - tie / 12.0e0
        z = (2 * w2 - e2) / (2.0e0 * math.sqrt(var4))
        return pa.table({
            "n_used": pa.array([n], type=pa.int64()),
            "w2_plus": pa.array([w2], type=pa.int64()),
            "z_signed_rank": pa.array([z], type=pa.float64()),
        })

    sql = """
    WITH c AS (
        SELECT CAST(round_even(c_acctbal * 100, 0) AS BIGINT)
                   AS v
        FROM customer
        WHERE CAST(round_even(c_acctbal * 100, 0) AS BIGINT)
              <> 0
    ),
    h AS (
        SELECT abs(v) AS a,
               CAST(count(*) AS BIGINT) AS cc,
               CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cp
        FROM c GROUP BY abs(v)
    ),
    w AS (
        SELECT a, cc, cp,
               2 * (CAST(sum(cc) OVER (ORDER BY a
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - cc)
               + cc + 1 AS m2
        FROM h
    ),
    nn AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM h),
    s AS (
        SELECT CAST(sum(cp * m2) AS BIGINT) AS w2,
               CAST(sum(cc * cc * cc - cc) AS BIGINT) AS tie
        FROM w
    )
    SELECT (SELECT n FROM nn) AS n_used,
           s.w2 AS w2_plus,
           CAST(2 * s.w2 - (SELECT n FROM nn)
                * ((SELECT n FROM nn) + 1) AS DOUBLE)
           / (2.0e0 * sqrt(
               CAST((SELECT n FROM nn)
                    * ((SELECT n FROM nn) + 1)
                    * (2 * (SELECT n FROM nn) + 1) AS DOUBLE)
               / 6.0e0
               - CAST(s.tie AS DOUBLE) / 12.0e0))
               AS z_signed_rank
    FROM s
    """
    return q, sql


def build_wave229_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_poisson_cusum",) + _pcusum_query()))
    add(*(("customer_signed_rank",) + _signed_rank_query()))
    return queries, oracles
