"""Wave-84 queries: Teager-Kaiser energy, user-activity Gini, and
order-2 Markov entropy.

- doc_teager_energy: mean Teager-Kaiser energy operator psi(y)_t =
  y_t^2 - y_(t-1)*y_(t+1) over interior points — the instantaneous
  energy/AM-FM demodulation operator. psi is a pure int64 per point;
  the mean is one division of exact sums.
- events_user_gini: Gini coefficient of per-user event counts (the
  activity-inequality number next to source_gini's token version):
  sorted-position weighted sum over the bounded per-user count
  table, exact int64 numerator, one division.
- events_markov2_entropy: conditional entropy H(X_t | X_(t-1),
  X_(t-2)) of the per-user event-type chain — the memory test one
  order above events_markov_entropy (compare the two: a drop means
  genuine order-2 structure). Bounded (f2, f1, t) trigram counts
  from the per-user bucketed kernel; entropy folds in ascending
  (f2, f1, t) order with scalar logs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------------------ doc_teager_energy
def _teager_query():
    def q(sf_dir: str):
        def teager(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "sum_psi": pa.array([], type=pa.int64()),
                "mean_psi": pa.array([], type=pa.float64()),
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
            keep = lens >= 3
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            tot = int((dlens - 2).sum())
            g = np.repeat(np.arange(nd), dlens - 2)
            j = (np.arange(tot)
                 - np.repeat(np.cumsum(dlens - 2)
                             - (dlens - 2), dlens - 2))
            pos = starts[g] + j + 1
            psi = (flat[pos] * flat[pos]
                   - flat[pos - 1] * flat[pos + 1])
            s = np.bincount(g, weights=psi,
                            minlength=nd).astype(np.int64)
            mean = (s.astype(np.float64)
                    / (dlens - 2).astype(np.float64))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "sum_psi": pa.array(s),
                "mean_psi": pa.array(mean, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            teager, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "sum_psi": pa.int64(),
            "mean_psi": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lagged AS (
        SELECT doc_id, token,
               lag(token) OVER w AS a,
               lead(token) OVER w AS c
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a IS NOT NULL AND c IS NOT NULL
                        THEN token * token - a * c END) AS BIGINT)
                   AS s,
               CAST(sum(CASE WHEN a IS NOT NULL AND c IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS ni
        FROM lagged GROUP BY doc_id HAVING count(*) >= 3
    )
    SELECT doc_id, n AS n_tok, s AS sum_psi,
           CAST(s AS DOUBLE) / CAST(ni AS DOUBLE) AS mean_psi
    FROM agg
    """
    return q, sql


# --------------------------------------------------------------- events_user_gini
def _user_gini_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uk, cnt = np.unique(uid, return_counts=True)
            return pa.table({
                "user_id": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("user_id").aggregate([("cnt", "sum")])
            return pa.table({
                "user_id": g.column("user_id").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        c = np.sort(a["cnt"].to_numpy(np.int64))
        n = int(c.size)
        s = int(c.sum())
        # G = (2 * sum_i i*c_(i) - (n+1)*S) / (n*S), i = 1..n asc
        w = int((np.arange(1, n + 1, dtype=np.int64) * c).sum())
        gini = (float(2 * w - (n + 1) * s)
                / (float(n) * float(s)))
        return pa.table({
            "n_users": pa.array([n], type=pa.int64()),
            "total": pa.array([s], type=pa.int64()),
            "gini": pa.array([gini], type=pa.float64()),
        })

    sql = """
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT c,
               row_number() OVER (ORDER BY c, user_id) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n,
               CAST(sum(c) OVER () AS BIGINT) AS s
        FROM u
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(s) AS BIGINT) AS total,
           CAST(2 * sum(i * c) - (max(n) + 1) * max(s) AS DOUBLE)
               / (CAST(max(n) AS DOUBLE)
                  * CAST(max(s) AS DOUBLE)) AS gini
    FROM r
    """
    return q, sql


# --------------------------------------------------------- events_markov2_entropy
def _markov2_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def trigrams(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            same2 = (users[2:] == users[1:-1]) & (
                users[1:-1] == users[:-2])
            f2 = et[:-2][same2]
            f1 = et[1:-1][same2]
            tt = et[2:][same2]
            if f2.size == 0:
                return pa.table(
                    {"k": pa.array([""], type=pa.string()),
                     "cnt": pa.array([0], type=pa.int64())})
            key = np.char.add(np.char.add(np.char.add(
                np.char.add(f2.astype(str), "|"),
                f1.astype(str)), "|"), tt.astype(str))
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"k": pa.array(list(uk) + [""],
                               type=pa.string()),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate([("cnt", "sum")])
            return pa.table(
                {"k": g.column("k"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())})

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id",
                         "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(trigrams, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[(a["k"] != "") & (a["cnt"] > 0)]
        rows = []
        for r in a.itertuples():
            f2, f1, tt = r.k.split("|")
            rows.append((f2, f1, tt, int(r.cnt)))
        rows.sort()
        ctx = {}
        for f2, f1, tt, c in rows:
            ctx[(f2, f1)] = ctx.get((f2, f1), 0) + c
        n = sum(c for *_k, c in rows)
        h = 0.0  # fold ordered by (f2, f1, t)
        for f2, f1, tt, c in rows:
            pij = float(c) / float(ctx[(f2, f1)])
            pi = float(ctx[(f2, f1)]) / float(n)
            h = h + pi * pij * math.log(pij)
        return pa.table({
            "n_trigrams": pa.array([n], type=pa.int64()),
            "n_contexts": pa.array([len(ctx)], type=pa.int64()),
            "entropy2": pa.array([-h], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    tr AS (
        SELECT lag(event_type, 2) OVER w AS f2,
               lag(event_type, 1) OVER w AS f1,
               event_type AS t
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY tus, event_id)
    ),
    c AS (
        SELECT f2, f1, t, CAST(count(*) AS BIGINT) AS cnt
        FROM tr WHERE f2 IS NOT NULL GROUP BY f2, f1, t
    ),
    ctx AS (
        SELECT f2, f1, CAST(sum(cnt) AS BIGINT) AS r
        FROM c GROUP BY f2, f1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
    terms AS (
        SELECT c.f2, c.f1, c.t,
               (CAST(ctx.r AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * (CAST(c.cnt AS DOUBLE) / CAST(ctx.r AS DOUBLE))
               * ln(CAST(c.cnt AS DOUBLE) / CAST(ctx.r AS DOUBLE))
                   AS term
        FROM c JOIN ctx ON ctx.f2 = c.f2 AND ctx.f1 = c.f1
        CROSS JOIN tot
    )
    SELECT tot.n AS n_trigrams,
           CAST((SELECT count(*) FROM ctx) AS BIGINT)
               AS n_contexts,
           -list_reduce(
               list_prepend(0.0e0,
                   list(term ORDER BY f2, f1, t)),
               (a, b) -> a + b) AS entropy2
    FROM terms CROSS JOIN tot
    GROUP BY tot.n
    """
    return q, sql


def build_wave84_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_teager_energy",) + _teager_query()))
    add(*(("events_user_gini",) + _user_gini_query()))
    add(*(("events_markov2_entropy",) + _markov2_query()))
    return queries, oracles
