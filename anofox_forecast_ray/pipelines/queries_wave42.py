"""Wave-42 queries: Kaplan-Meier survival, Pareto-80 concentration, and
the Theil inequality index.

- events_km_survival: Kaplan-Meier estimator of days-until-first-
  purchase with right censoring at each user's last observed event —
  the survival-analysis primitive. Per-user (first_event, first_
  purchase, last_event) collapse to bounded per-day (deaths, censored)
  counts; S(t) is a PRODUCT fold over event days in ascending order,
  each factor 1 - d/n a single f64 division of exact ints, replayed by
  a multiplicative list_reduce.
- lineitem_pareto80: how many parts cover 80% of extended-price
  revenue — the concentration planning number. Per-part cents sums are
  bounded partials; the cumulative threshold scan is driver math on
  exact integers (cum * 5 >= total * 4 avoids floats entirely).
- source_theil_index: Theil T inequality of doc lengths per source
  from the bounded histogram — term c * (v/mu) * ln(v/mu) with scalar
  math.log per distinct value, ascending fold == ORDER BY v
  list_reduce.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

DAY_US = 86_400_000_000


# ------------------------------------------------------ events_km_survival
def _km_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "first_ts": pa.array([], type=pa.int64()),
                 "last_ts": pa.array([], type=pa.int64()),
                 "first_p": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            df = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "tus": t.column("ts").cast(pa.int64()),
                 "is_p": pa.array((et == "purchase").astype(np.int8),
                                  type=pa.int8())}
            ).to_pandas()
            BIG = np.int64(1) << 62
            df["first_p"] = np.where(df["is_p"] == 1, df["tus"], BIG)
            a = (df.groupby("user_id")
                 .agg(first_ts=("tus", "min"),
                      last_ts=("tus", "max"),
                      first_p=("first_p", "min")).reset_index())
            return pa.Table.from_pandas(a, preserve_index=False)

        def merge_bucket(g: pa.Table) -> pa.Table:
            a = g.group_by("user_id").aggregate(
                [("first_ts", "min"), ("last_ts", "max"),
                 ("first_p", "min")]
            )
            BIG = np.int64(1) << 62
            first = a.column("first_ts_min").to_numpy(
                zero_copy_only=False)
            last = a.column("last_ts_max").to_numpy(
                zero_copy_only=False)
            fp = a.column("first_p_min").to_numpy(
                zero_copy_only=False)
            event = fp < BIG
            # day of event (death) or censoring, relative to first obs
            t_day = np.where(
                event, (fp - first) // DAY_US,
                (last - first) // DAY_US,
            ).astype(np.int64)
            tab = pa.table(
                {"day": pa.array(t_day),
                 "d": pa.array(event.astype(np.int64)),
                 "c": pa.array((~event).astype(np.int64))}
            )
            g2 = tab.group_by("day").aggregate(
                [("d", "sum"), ("c", "sum")]
            )
            return pa.table(
                {"day": g2.column("day"),
                 "d": g2.column("d_sum").cast(pa.int64()),
                 "c": g2.column("c_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate(
                [("d", "sum"), ("c", "sum")]
            )
            return pa.table(
                {"day": g.column("day"),
                 "d": g.column("d_sum").cast(pa.int64()),
                 "c": g.column("c_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "day"
        )
        days = a["day"].to_numpy(np.int64)
        d = a["d"].to_numpy(np.int64)
        c = a["c"].to_numpy(np.int64)
        n_total = int((d + c).sum())
        removed = np.concatenate(
            ([0], np.cumsum(d + c)[:-1])
        )
        at_risk = n_total - removed
        rows = {"day": [], "n_risk": [], "d": [], "s": []}
        s = 1.0  # ascending-day product fold
        for i in range(days.size):
            if d[i] > 0:
                s = s * (1.0 - float(int(d[i]))
                         / float(int(at_risk[i])))
                rows["day"].append(int(days[i]))
                rows["n_risk"].append(int(at_risk[i]))
                rows["d"].append(int(d[i]))
                rows["s"].append(s)
        return pa.table(
            {"day": pa.array(rows["day"], type=pa.int64()),
             "n_risk": pa.array(rows["n_risk"], type=pa.int64()),
             "d": pa.array(rows["d"], type=pa.int64()),
             "s": pa.array(rows["s"], type=pa.float64())}
        )

    sql = f"""
    WITH u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS first_ts,
               max(epoch_us(ts)) AS last_ts,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS first_p
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT CASE WHEN first_p IS NOT NULL
                    THEN (first_p - first_ts) // {DAY_US}
                    ELSE (last_ts - first_ts) // {DAY_US}
               END AS day,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS d
        FROM u
    ),
    byday AS (
        SELECT day, CAST(sum(d) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS removed
        FROM obs GROUP BY day
    ),
    risk AS (
        SELECT day, d,
               CAST((SELECT count(*) FROM obs) AS BIGINT)
                   - CAST(COALESCE(sum(removed) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_risk
        FROM byday
    ),
    ev AS (SELECT * FROM risk WHERE d > 0)
    SELECT CAST(e.day AS BIGINT) AS day, e.n_risk, e.d,
           (SELECT list_reduce(
                       list_prepend(CAST(1.0 AS DOUBLE),
                           list(1.0 - CAST(e2.d AS DOUBLE)
                                      / CAST(e2.n_risk AS DOUBLE)
                                ORDER BY e2.day)),
                       (a, b) -> a * b)
            FROM ev e2 WHERE e2.day <= e.day) AS s
    FROM ev e
    """
    return q, sql


# -------------------------------------------------------- lineitem_pareto80
def _pareto_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "l_partkey" not in t.column_names:
                return pa.table(
                    {"part": pa.array([], type=pa.int64()),
                     "cents": pa.array([], type=pa.int64())}
                )
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            g = pa.table(
                {"part": t.column("l_partkey").cast(pa.int64()),
                 "cents": pa.array(cents)}
            ).group_by("part").aggregate([("cents", "sum")])
            return pa.table(
                {"part": g.column("part"),
                 "cents": g.column("cents_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("part").aggregate([("cents", "sum")])
            return pa.table(
                {"part": g.column("part"),
                 "cents": g.column("cents_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["cents", "part"],
                          ascending=[False, True])
        cents = a["cents"].to_numpy(np.int64)
        total = int(cents.sum())
        cum = np.cumsum(cents)
        # first rank where cum * 5 >= total * 4  (cum/total >= 0.8)
        k = int(np.searchsorted(cum * 5, total * 4, side="left")) + 1
        return pa.table(
            {"n_parts": pa.array([int(len(a))], type=pa.int64()),
             "n_parts_80": pa.array([k], type=pa.int64()),
             "total_cents": pa.array([total], type=pa.int64()),
             "cents_at_k": pa.array([int(cum[k - 1])],
                                    type=pa.int64())}
        )

    sql = """
    WITH p AS (
        SELECT l_partkey AS part,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    r AS (
        SELECT part, cents,
               sum(cents) OVER (ORDER BY cents DESC, part
                                ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cents) OVER () AS total,
               row_number() OVER (ORDER BY cents DESC, part) AS rk
        FROM p
    )
    SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_parts,
           CAST(min(rk) AS BIGINT) AS n_parts_80,
           CAST(max(total) AS BIGINT) AS total_cents,
           CAST(min(cum) AS BIGINT) AS cents_at_k
    FROM r WHERE cum * 5 >= total * 4
    """
    return q, sql


# --------------------------------------------------------- source_theil_index
def _theil_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "v": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            g = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            ).group_by(["source", "v"]).aggregate([("v", "count")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("v_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "v"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"source": g.column("source"), "v": g.column("v"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        rows = {"source": [], "n": [], "theil": []}
        for src, g in hp.groupby("source"):
            g = g[g["v"] > 0].sort_values("v")
            n = int(g["cnt"].sum())
            s = int((g["v"].to_numpy(np.int64)
                     * g["cnt"].to_numpy(np.int64)).sum())
            mu = float(np.float64(s) / np.float64(n))
            t_sum = 0.0  # ascending-value fold
            for r in g.itertuples():
                ratio = float(int(r.v)) / mu
                t_sum = t_sum + (float(int(r.cnt)) * ratio
                                 * math.log(ratio))
            rows["source"].append(str(src))
            rows["n"].append(n)
            rows["theil"].append(t_sum / float(n))
        return pa.table(
            {"source": pa.array(rows["source"], type=pa.string()),
             "n": pa.array(rows["n"], type=pa.int64()),
             "theil": pa.array(rows["theil"], type=pa.float64())}
        )

    sql = """
    WITH h AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents WHERE n_chars > 0
        GROUP BY source, n_chars
    ),
    stats AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(v * cnt) AS BIGINT) AS s
        FROM h GROUP BY source
    ),
    terms AS (
        SELECT h.source, h.v, st.n,
               CAST(h.cnt AS DOUBLE)
               * (CAST(h.v AS DOUBLE)
                  / (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
               * ln(CAST(h.v AS DOUBLE)
                    / (CAST(st.s AS DOUBLE)
                       / CAST(st.n AS DOUBLE))) AS term
        FROM h JOIN stats st ON st.source = h.source
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list(term ORDER BY v)),
               (a, b) -> a + b) / CAST(max(n) AS DOUBLE) AS theil
    FROM terms GROUP BY source
    """
    return q, sql


def build_wave42_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_km_survival",) + _km_query()))
    add(*(("lineitem_pareto80",) + _pareto_query()))
    add(*(("source_theil_index",) + _theil_query()))
    return queries, oracles
