"""Wave-36 queries: sweep-line peak concurrency, skip-gram pair counts,
chi-square cohort drift, and histogram geometric means.

- events_peak_sessions: maximum number of simultaneously-open 30-min
  sessions — the classic interval sweep-line, DISTRIBUTED: sessions
  come from the user-bucket kernel, their +-1 boundary points are
  bucketed BY DAY, each day kernel computes its own max running sum,
  and the cross-day carry is the bounded per-day delta-total prefix —
  no global sort. Tie rule everywhere: at equal ts the -1 sorts first
  (end-exclusive sessions), replayed in SQL as ORDER BY ts, delta.
- corpus_skipgram_topk: top unordered token pairs co-occurring within
  distance <= 3 (skip-grams) — three shifted vectorized passes over
  the flat buffer into bounded (pair) partials.
- events_cohort_chi2: chi-square statistic for event-type distribution
  drift between the event_id-parity cohorts. Bounded (cohort, type)
  cells; every expected value is a single f64 division of exact int64
  products and the cell fold is sequential in (type) order, replayed
  by list_reduce.
- source_geomean_length: geometric mean doc length per source — from
  the bounded (source, length) histogram, sum c_v * ln(v) accumulates
  with SCALAR math.log in ascending value order (numpy's SIMD log on
  arrays does NOT bit-match libm; the scalar path does), replayed by
  an ORDER BY v list_reduce fold.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

GAP_US = 1_800_000_000
DAY_US = 86_400_000_000
SKIP_D = 3
TOPK_PAIRS = 20


# ---------------------------------------------------- events_peak_sessions
def _peak_sessions_query(gap_us: int = GAP_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.groupfill import sessionize_multi
        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64())}
            )

        def boundaries(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            chg = np.r_[
                True,
                (users[1:] != users[:-1]) | (sid[1:] != sid[:-1]),
            ]
            starts = np.flatnonzero(chg)
            ends = np.r_[starts[1:], users.size] - 1
            s_ts = tus[starts]
            e_ts = tus[ends]
            ts = np.concatenate((s_ts, e_ts))
            delta = np.concatenate(
                (np.ones(s_ts.size, dtype=np.int64),
                 -np.ones(e_ts.size, dtype=np.int64))
            )
            return pa.table(
                {"day": pa.array(ts // DAY_US),
                 "ts": pa.array(ts),
                 "delta": pa.array(delta)}
            )

        def day_sweep(g: pa.Table) -> pa.Table:
            g = g.sort_by([("ts", "ascending"),
                           ("delta", "ascending")])  # -1 first on ties
            delta = g.column("delta").to_numpy(zero_copy_only=False)
            run = np.cumsum(delta)
            return pa.table(
                {"day": pa.array(
                     [int(g.column("day")[0].as_py())],
                     type=pa.int64()),
                 "max_run": pa.array([int(run.max())],
                                     type=pa.int64()),
                 "total": pa.array([int(run[-1])], type=pa.int64()),
                 "n_starts": pa.array([int((delta == 1).sum())],
                                      type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return t

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(boundaries, batch_format="pyarrow")
            .groupby("day")
            .map_groups(day_sweep, batch_format="pyarrow")
            .to_arrow_refs()
        )
        days = tree_reduce_tables(refs, merge).to_pandas()
        days = days.sort_values("day")
        carry = np.concatenate(
            ([0], np.cumsum(days["total"].to_numpy(np.int64))[:-1])
        )
        peak = int((carry + days["max_run"].to_numpy(np.int64)).max())
        n_sessions = int(days["n_starts"].sum())
        return pa.table(
            {"peak": pa.array([peak], type=pa.int64()),
             "n_sessions": pa.array([n_sessions], type=pa.int64())}
        )

    sql = f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    flags AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS sid,
               tus
        FROM flags
    ),
    iv AS (
        SELECT min(tus) AS s_ts, max(tus) AS e_ts
        FROM sess GROUP BY user_id, sid
    ),
    b AS (
        SELECT s_ts AS ts, 1 AS delta FROM iv
        UNION ALL
        SELECT e_ts AS ts, -1 AS delta FROM iv
    ),
    r AS (
        SELECT sum(delta) OVER (ORDER BY ts, delta
                                ROWS UNBOUNDED PRECEDING) AS c
        FROM b
    )
    SELECT CAST((SELECT max(c) FROM r) AS BIGINT) AS peak,
           CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_sessions
    """
    return q, sql


# --------------------------------------------------- corpus_skipgram_topk
def _skipgram_query(d: int = SKIP_D, topk: int = TOPK_PAIRS):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables
        from .queries import corpus_ds

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            seg = np.repeat(
                np.arange(lengths.size, dtype=np.int64),
                lengths.astype(np.int64),
            )
            keys = []
            for off in range(1, d + 1):
                if v.size <= off:
                    break
                ok = seg[off:] == seg[:-off]
                x, y = v[:-off][ok], v[off:][ok]
                lo = np.minimum(x, y)
                hi = np.maximum(x, y)
                keys.append(lo * (1 << 21) + hi)
            if not keys:
                return empty
            uk, uc = np.unique(np.concatenate(keys),
                               return_counts=True)
            return pa.table(
                {"a": pa.array(uk >> 21),
                 "b": pa.array(uk & ((1 << 21) - 1)),
                 "cnt": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["a", "b"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"a": g.column("a"), "b": g.column("b"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        hp = hp.sort_values(
            ["cnt", "a", "b"], ascending=[False, True, True]
        ).head(topk).reset_index(drop=True)
        hp["rk"] = np.arange(1, len(hp) + 1, dtype=np.int64)
        return pa.table(
            {"rk": pa.array(hp["rk"].to_numpy(np.int64)),
             "a": pa.array(hp["a"].to_numpy(np.int64)),
             "b": pa.array(hp["b"].to_numpy(np.int64)),
             "cnt": pa.array(hp["cnt"].to_numpy(np.int64))}
        )

    offs = ", ".join(str(i) for i in range(1, d + 1))
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pairs AS (
        SELECT t.doc_id,
               least(t.token, u.token) AS a,
               greatest(t.token, u.token) AS b
        FROM tok t
        JOIN tok u ON u.doc_id = t.doc_id
                  AND u.pos - t.pos IN ({offs})
    ),
    c AS (
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY a, b
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, a, b)
                AS BIGINT) AS rk, a, b, cnt
    FROM c ORDER BY cnt DESC, a, b LIMIT {topk}
    """
    return q, sql


# ----------------------------------------------------- events_cohort_chi2
def _cohort_chi2_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "event_id" not in t.column_names:
                return pa.table(
                    {"cohort": pa.array([], type=pa.int64()),
                     "event_type": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            ids = t.column("event_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tab = pa.table(
                {"cohort": pa.array(ids % 2),
                 "event_type": t.column("event_type")}
            )
            g = tab.group_by(["cohort", "event_type"]).aggregate(
                [("cohort", "count")]
            )
            return pa.table(
                {"cohort": g.column("cohort"),
                 "event_type": g.column("event_type"),
                 "cnt": g.column("cohort_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["cohort", "event_type"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"cohort": g.column("cohort"),
                 "event_type": g.column("event_type"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["event_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        n = int(cells["cnt"].sum())
        row = cells.groupby("cohort")["cnt"].sum().to_dict()
        col = cells.groupby("event_type")["cnt"].sum().to_dict()
        # chi2 over ALL (cohort, type) combos incl. zero cells,
        # sequential fold ordered by (cohort, type)
        chi2 = 0.0
        obs = {(int(r.cohort), r.event_type): int(r.cnt)
               for r in cells.itertuples()}
        for cohort in sorted(row):
            for et in sorted(col):
                o = obs.get((int(cohort), et), 0)
                e = (float(row[cohort] * col[et]) / float(n))
                term = (float(o) - e) * (float(o) - e) / e
                chi2 = chi2 + term
        return pa.table(
            {"n_events": pa.array([n], type=pa.int64()),
             "chi2": pa.array([chi2], type=pa.float64())}
        )

    sql = """
    WITH cells AS (
        SELECT CAST(event_id % 2 AS BIGINT) AS cohort, event_type,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
    rows_m AS (
        SELECT cohort, CAST(sum(cnt) AS BIGINT) AS r FROM cells
        GROUP BY cohort
    ),
    cols_m AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS c FROM cells
        GROUP BY event_type
    ),
    grid AS (
        SELECT rm.cohort, cm.event_type, rm.r, cm.c
        FROM rows_m rm CROSS JOIN cols_m cm
    ),
    terms AS (
        SELECT g.cohort, g.event_type,
               (CAST(COALESCE(ce.cnt, 0) AS DOUBLE)
                - CAST(g.r * g.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * (CAST(COALESCE(ce.cnt, 0) AS DOUBLE)
                  - CAST(g.r * g.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
               / (CAST(g.r * g.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                   AS term
        FROM grid g
        LEFT JOIN cells ce ON ce.cohort = g.cohort
                          AND ce.event_type = g.event_type
        CROSS JOIN tot
    ),
    folded AS (
        SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY cohort, event_type)),
                   (a, b) -> a + b) AS chi2
        FROM terms
    )
    SELECT tot.n AS n_events, folded.chi2 AS chi2
    FROM tot, folded
    """
    return q, sql


# -------------------------------------------------- source_geomean_length
def _geomean_query():
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
            tab = pa.table(
                {"source": t.column("source"),
                 "v": t.column("n_chars").cast(pa.int64())}
            )
            g = tab.group_by(["source", "v"]).aggregate(
                [("v", "count")]
            )
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
        rows = {"source": [], "n": [], "sum_ln": [], "geomean": []}
        for src, g in hp.groupby("source"):
            g = g[g["v"] > 0].sort_values("v")
            n = int(g["cnt"].sum())
            s = 0.0  # sequential fold in ascending value order
            for r in g.itertuples():
                s = s + float(r.cnt) * math.log(float(r.v))
            rows["source"].append(str(src))
            rows["n"].append(n)
            rows["sum_ln"].append(s)
            rows["geomean"].append(math.exp(s / float(n)))
        return pa.table(
            {"source": pa.array(rows["source"], type=pa.string()),
             "n": pa.array(rows["n"], type=pa.int64()),
             "sum_ln": pa.array(rows["sum_ln"], type=pa.float64()),
             "geomean": pa.array(rows["geomean"],
                                 type=pa.float64())}
        )

    sql = """
    WITH h AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents WHERE n_chars > 0
        GROUP BY source, n_chars
    ),
    folded AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(CAST(cnt AS DOUBLE)
                            * ln(CAST(v AS DOUBLE)) ORDER BY v)),
                   (a, b) -> a + b) AS sum_ln
        FROM h GROUP BY source
    )
    SELECT source, n, sum_ln,
           exp(sum_ln / CAST(n AS DOUBLE)) AS geomean
    FROM folded
    """
    return q, sql


def build_wave36_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_peak_sessions",) + _peak_sessions_query()))
    add(*(("corpus_skipgram_topk",) + _skipgram_query()))
    add(*(("events_cohort_chi2",) + _cohort_chi2_query()))
    add(*(("source_geomean_length",) + _geomean_query()))
    return queries, oracles
