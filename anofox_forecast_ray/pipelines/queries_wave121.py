"""Wave-121 queries: Jonckheere-Terpstra trend and Cohen's kappa.

- events_jonckheere_weekly: Jonckheere-Terpstra test for an ORDERED
  alternative — are daily error counts trending up across successive
  weeks? JT sums Mann-Whitney U counts over every ordered week pair;
  kept fully integer in DOUBLED units (2*[x<y] + [x=y]) like the
  other rank tests. The daily-count table is bounded (one row per
  day) from per-block partials.
- events_cohen_kappa: Cohen's kappa agreement between the morning
  and evening error indicators over (user, day) blocks (the wave-114
  McNemar table read as two raters): po = (n11+n00)/N and the
  chance-agreement pe from the marginals — all exact integer ratios,
  kappa = (po - pe) / (1 - pe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def _daily_err_counts(sf_dir: str):
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "day": pa.array([], type=pa.int64()),
            "errs": pa.array([], type=pa.int64()),
        })
        if "ts" not in t.column_names or t.num_rows == 0:
            return empty
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = tus // 86_400_000_000
        et = np.asarray(t.column("event_type").to_pylist())
        is_err = (et == "error").astype(np.int64)
        uk, inv = np.unique(day, return_inverse=True)
        errs = np.bincount(inv, weights=is_err).astype(np.int64)
        return pa.table({
            "day": pa.array(uk, type=pa.int64()),
            "errs": pa.array(errs),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("errs", "sum")])
        return pa.table({
            "day": g.column("day").cast(pa.int64()),
            "errs": g.column("errs_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, merge).to_pandas()


# ------------------------------------------------- events_jonckheere_weekly
def _jonckheere_query():
    def q(sf_dir: str):
        a = _daily_err_counts(sf_dir).sort_values("day")
        d0 = int(a["day"].min())
        week = (a["day"].to_numpy(np.int64) - d0) // 7
        x = a["errs"].to_numpy(np.int64)
        jt2 = 0
        n = x.size
        for i in range(n):
            for j in range(n):
                if week[i] < week[j]:
                    if x[i] < x[j]:
                        jt2 += 2
                    elif x[i] == x[j]:
                        jt2 += 1
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "n_weeks": pa.array([int(week.max()) + 1],
                                type=pa.int64()),
            "jt2": pa.array([jt2], type=pa.int64()),
        })

    sql = """
    WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CASE WHEN event_type = 'error'
                             THEN 1 ELSE 0 END) AS BIGINT) AS errs
        FROM events GROUP BY day
    ),
    w AS (
        SELECT day, errs,
               (day - (SELECT min(day) FROM d)) // 7 AS week
        FROM d
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           (SELECT CAST(max(week) + 1 AS BIGINT) FROM w) AS n_weeks,
           CAST(sum(CASE WHEN a.errs < b.errs THEN 2
                         WHEN a.errs = b.errs THEN 1
                         ELSE 0 END) AS BIGINT) AS jt2
    FROM w a JOIN w b ON a.week < b.week
    """
    return q, sql


# ------------------------------------------------------- events_cohen_kappa
def _kappa_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "am": pa.array([], type=pa.int64()),
                "pm": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            is_pm = ((tus // 3_600_000_000) % 24) >= 12
            uid = t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            et = np.asarray(t.column("event_type").to_pylist())
            is_err = et == "error"
            key = uid * np.int64(1 << 24) + day
            uk, inv = np.unique(key, return_inverse=True)
            am = np.zeros(uk.size, dtype=np.int64)
            pm = np.zeros(uk.size, dtype=np.int64)
            np.maximum.at(am, inv[is_err & ~is_pm], 1)
            np.maximum.at(pm, inv[is_err & is_pm], 1)
            return pa.table({
                "key": pa.array(uk),
                "am": pa.array(am),
                "pm": pa.array(pm),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate(
                [("am", "max"), ("pm", "max")])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                "am": g.column("am_max").cast(pa.int64()),
                "pm": g.column("pm_max").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        am = a["am"].to_numpy(np.int64)
        pm = a["pm"].to_numpy(np.int64)
        n = len(a)
        n11 = int(((am == 1) & (pm == 1)).sum())
        n10 = int(((am == 1) & (pm == 0)).sum())
        n01 = int(((am == 0) & (pm == 1)).sum())
        n00 = n - n11 - n10 - n01
        po = float(n11 + n00) / float(n)
        pe = (float((n11 + n10) * (n11 + n01))
              + float((n01 + n00) * (n10 + n00))) / float(n * n)
        kappa = (po - pe) / (1.0 - pe)
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "po": pa.array([po], type=pa.float64()),
            "pe": pa.array([pe], type=pa.float64()),
            "kappa": pa.array([kappa], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // 86400000000 AS day,
               CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
                    THEN 1 ELSE 0 END AS pm,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    u AS (
        SELECT user_id, day,
               max(CASE WHEN ise = 1 AND pm = 0
                        THEN 1 ELSE 0 END) AS am,
               max(CASE WHEN ise = 1 AND pm = 1
                        THEN 1 ELSE 0 END) AS pmv
        FROM e GROUP BY user_id, day
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN am = 1 AND pmv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n11,
               CAST(sum(CASE WHEN am = 1 AND pmv = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(sum(CASE WHEN am = 0 AND pmv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(sum(CASE WHEN am = 0 AND pmv = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM u
    )
    SELECT n,
           CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
            + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
               / CAST(n * n AS DOUBLE) AS pe,
           ((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
               + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
                  / CAST(n * n AS DOUBLE))
           / (1.0e0
              - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                 + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
                    / CAST(n * n AS DOUBLE)) AS kappa
    FROM c
    """
    return q, sql


def build_wave121_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_jonckheere_weekly",) + _jonckheere_query()))
    add(*(("events_cohen_kappa",) + _kappa_query()))
    return queries, oracles
