"""Wave-105 queries: surprisal variance (UID) and per-type gap
burstiness.

- doc_uid_variance: variance of per-bigram surprisal (-log P) under
  the corpus add-one bigram LM — the Uniform Information Density
  score (low variance = evenly-distributed information; spikes mean
  surprising junctures). The per-type log table is the proven
  wave-19 precompute; per-doc folds are ascending-(a, b) cumsums of
  the gathered terms and their squares; the variance is the spelled
  moment expression.
- events_type_burstiness: per event type, the coefficient of
  variation of SAME-TYPE inter-event gaps within each user (is the
  'error' process bursty while 'view' is steady?): integer gap
  moments over the bucketed per-user kernel; CV = sqrt(var)/mean
  with the spelled expressions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------------------ doc_uid_variance
def _uid_query():
    def q(sf_dir: str):
        import ray

        from ..extras.lm import SHIFT, train_bigram_model
        from ..stages.rollup import _flat_tokens

        model = train_bigram_model(corpus_ds(sf_dir))
        keys, _c2, _ak, _c1, _v, ltab = model
        tref = ray.put((keys, ltab))

        class UIDStage:
            def __init__(self, tref):
                self.keys, self.ltab = ray.get(tref)

            def __call__(self, t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "doc_id": pa.array([], type=pa.string()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "mean_surprisal": pa.array(
                        [], type=pa.float64()),
                    "uid_variance": pa.array(
                        [], type=pa.float64()),
                })
                if ("tokens" not in t.column_names
                        or t.num_rows == 0):
                    return empty
                values, lengths = _flat_tokens(t)
                ids = t.column("doc_id").to_pylist()
                nd = len(ids)
                n_out = np.zeros(nd, dtype=np.int64)
                m_out = np.zeros(nd, dtype=np.float64)
                v_out = np.zeros(nd, dtype=np.float64)
                off = 0
                for i, ln_ in enumerate(lengths):
                    seg = values[off: off + ln_]
                    off += int(ln_)
                    if ln_ < 2:
                        continue
                    v64 = seg.astype(np.int64)
                    dkeys = v64[:-1] * SHIFT + v64[1:]
                    uk, n_ab = np.unique(dkeys,
                                         return_counts=True)
                    s = -self.ltab[
                        np.searchsorted(self.keys, uk)]
                    w = n_ab.astype(np.float64)
                    s1 = float(np.cumsum(w * s)[-1])
                    s2 = float(np.cumsum(w * (s * s))[-1])
                    nb = float(int(ln_ - 1))
                    mean = s1 / nb
                    var = s2 / nb - mean * mean
                    n_out[i] = int(ln_ - 1)
                    m_out[i] = mean
                    v_out[i] = var
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_bigrams": pa.array(n_out),
                    "mean_surprisal": pa.array(
                        m_out, type=pa.float64()),
                    "uid_variance": pa.array(
                        v_out, type=pa.float64()),
                })

        out = corpus_ds(sf_dir).map_batches(
            UIDStage, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(tref,),
        )
        return _cast(out, {
            "doc_id": pa.string(),
            "n_bigrams": pa.int64(),
            "mean_surprisal": pa.float64(),
            "uid_variance": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.doc_id, t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY a, b),
    c1 AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY a),
    vv AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v FROM pr),
    dterm AS (
        SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY doc_id, a, b
    ),
    terms AS (
        SELECT d.doc_id, d.a, d.b, d.n,
               -ln((CAST(c2.c AS DOUBLE) + 1.0)
                   / (CAST(c1.c AS DOUBLE) + vv.v)) AS s
        FROM dterm d
        JOIN c2 ON c2.a = d.a AND c2.b = d.b
        JOIN c1 ON c1.a = d.a
        CROSS JOIN vv
    ),
    folded AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS nb,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE) * s ORDER BY a, b)),
                   (x, y) -> x + y) AS s1,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE) * (s * s)
                        ORDER BY a, b)),
                   (x, y) -> x + y) AS s2
        FROM terms GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(f.nb, 0) AS n_bigrams,
           CASE WHEN COALESCE(f.nb, 0) > 0
                THEN f.s1 / CAST(f.nb AS DOUBLE)
                ELSE 0.0e0 END AS mean_surprisal,
           CASE WHEN COALESCE(f.nb, 0) > 0
                THEN f.s2 / CAST(f.nb AS DOUBLE)
                     - (f.s1 / CAST(f.nb AS DOUBLE))
                       * (f.s1 / CAST(f.nb AS DOUBLE))
                ELSE 0.0e0 END AS uid_variance
    FROM documents d LEFT JOIN folded f
      ON f.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# ----------------------------------------------------- events_type_burstiness
def _type_burstiness_query():
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

        def gaps(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("event_type", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            same = (users[1:] == users[:-1]) & (et[1:] == et[:-1])
            gp = (tus[1:] - tus[:-1])[same]
            gt = et[1:][same]
            names, inv = np.unique(gt, return_inverse=True)
            n = np.bincount(inv, minlength=names.size).astype(
                np.int64)
            s = np.zeros(names.size, dtype=np.int64)
            ss = np.zeros(names.size, dtype=np.int64)
            np.add.at(s, inv, gp)
            np.add.at(ss, inv, (gp // 1_000_000) * (gp // 1_000_000))
            return pa.table({
                "event_type": pa.array(
                    list(names) + [""], type=pa.string()),
                "n": pa.array(np.r_[n, np.int64(0)]),
                "s": pa.array(np.r_[s, np.int64(0)]),
                "ss_s": pa.array(np.r_[ss, np.int64(0)]),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("event_type").aggregate(
                [("n", "sum"), ("s", "sum"), ("ss_s", "sum")])
            return pa.table({
                "event_type": g.column("event_type"),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "ss_s": g.column("ss_s_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id",
                         "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[(a["event_type"] != "") & (a["n"] >= 2)]
        a = a.sort_values("event_type").reset_index(drop=True)
        rows = []
        for r in a.itertuples():
            nf = float(int(r.n))
            # gaps quantized to SECONDS for the square sums
            # (ms^2 sums can overflow int64 at the 30-day envelope)
            mean_s = (float(int(r.s)) / nf) / 1000000.0
            var_s = (float(int(r.ss_s)) / nf
                     - (float(int(r.s)) / nf / 1000000.0)
                     * (float(int(r.s)) / nf / 1000000.0))
            cv = (math.sqrt(var_s) / mean_s
                  if var_s > 0 and mean_s > 0 else 0.0)
            rows.append((r.event_type, int(r.n), cv))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows],
                                   type=pa.string()),
            "n_gaps": pa.array([r[1] for r in rows],
                               type=pa.int64()),
            "cv": pa.array([r[2] for r in rows],
                           type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id, event_type
                         ORDER BY epoch_us(ts), event_id) AS gap
        FROM events
    ),
    agg AS (
        SELECT event_type,
               CAST(count(gap) AS BIGINT) AS n,
               CAST(sum(gap) AS BIGINT) AS s,
               CAST(sum((gap // 1000000) * (gap // 1000000))
                    AS BIGINT) AS ss_s
        FROM g WHERE gap IS NOT NULL
        GROUP BY event_type HAVING count(gap) >= 2
    )
    SELECT event_type, n AS n_gaps,
           CASE WHEN CAST(ss_s AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        / 1000000.0e0)
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                          / 1000000.0e0) > 0
                 AND CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                     / 1000000.0e0 > 0
                THEN sqrt(CAST(ss_s AS DOUBLE)
                          / CAST(n AS DOUBLE)
                          - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                             / 1000000.0e0)
                            * (CAST(s AS DOUBLE)
                               / CAST(n AS DOUBLE) / 1000000.0e0))
                     / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        / 1000000.0e0)
                ELSE 0.0e0 END AS cv
    FROM agg
    """
    return q, sql


def build_wave105_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_uid_variance",) + _uid_query()))
    add(*(("events_type_burstiness",) + _type_burstiness_query()))
    return queries, oracles
