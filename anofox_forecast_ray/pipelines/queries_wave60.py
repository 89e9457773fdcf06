"""Wave-60 queries: Kneser-Ney bigram LM scoring, one-way ANOVA
across sources, and absorbing-Markov expected steps to purchase.

- doc_kneser_ney: interpolated Kneser-Ney (D=0.75) char-bigram
  log-score per doc (Chen & Goodman 1998) — the principled upgrade of
  the add-one CCNet filter (extras/lm.py). Same two-pass shape:
  tree-reduced global (key, cnt) bigram table -> per-type KN log term
  precomputed once (alphabet^2-bounded) -> broadcast via ray.put ->
  actor-pool gather + ascending-(a,b) cumsum fold per doc. The DuckDB
  oracle recomputes N1+ type counts with GROUP BYs and replays the
  same fold with list_reduce; ln == math.log (shared libm).
- source_anova_f: one-way ANOVA F of per-doc token counts across
  sources. Per-source (n, sum, sumsq) int64 partials tree-reduce
  (bounded cardinality — the source_rollup discipline); the driver
  folds k<=5 groups in ascending source order with the explicit
  SS decomposition ssb = sum s_g^2/n_g - S^2/N, ssw = sum(ss_g -
  s_g^2/n_g); the oracle replays the identical fold with a LIST
  accumulator (struct accumulators are buggy in DuckDB 1.0).
- events_markov_steps: expected number of steps to reach 'purchase'
  from each transient event type, treating per-user ordered event
  sequences as an absorbing Markov chain. Transition counts reuse the
  wave-49 bucketed per-user machinery (only (user, ts, type) triples
  shuffle); the 4x4 transient submatrix Q solves t = 1 + Q t by a
  FIXED 64-step Jacobi iteration on the driver — both sides run the
  exact same finite recursion (not a linear solve), so the match is
  bitwise by construction. rho(Q) ~ 0.8 on this corpus => the
  iterate is ~1e-6 from the fixed point, and it is pinned exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

KN_DISCOUNT = 0.75
MARKOV_ITERS = 64
MARKOV_STATES = ("click", "error", "signup", "view")
MARKOV_ABSORB = "purchase"


# --------------------------------------------------------- doc_kneser_ney
def _kneser_ney_query(discount: float = KN_DISCOUNT):
    def q(sf_dir: str):
        import ray

        from ..extras.lm import (KNScoreStage, kn_log_tables,
                                 train_bigram_model)

        model = train_bigram_model(corpus_ds(sf_dir))
        tables_ref = ray.put(kn_log_tables(model, discount))
        out = corpus_ds(sf_dir).map_batches(
            KNScoreStage,
            batch_format="pyarrow",
            concurrency=2,
            fn_constructor_args=(tables_ref,),
        )
        return _cast(out, {
            "doc_id": pa.string(),
            "n_bigrams": pa.int64(),
            "logprob": pa.float64(),
            "mean_logprob": pa.float64(),
        })

    d = f"{discount}e0"
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.doc_id, t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY a, b),
    c1 AS (SELECT a, CAST(sum(c) AS BIGINT) AS c,
                  CAST(count(*) AS BIGINT) AS n1a
           FROM c2 GROUP BY a),
    cb AS (SELECT b, CAST(count(*) AS BIGINT) AS n1b
           FROM c2 GROUP BY b),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM c2),
    dterm AS (
        SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY doc_id, a, b
    ),
    terms AS (
        SELECT d.doc_id, d.a, d.b, d.n,
               CAST(d.n AS DOUBLE) *
               ln(GREATEST(CAST(c2.c AS DOUBLE) - {d}, 0.0e0)
                      / CAST(c1.c AS DOUBLE)
                  + ({d} * CAST(c1.n1a AS DOUBLE)
                         / CAST(c1.c AS DOUBLE))
                    * (CAST(cb.n1b AS DOUBLE) / nt.nt)) AS term
        FROM dterm d
        JOIN c2 ON c2.a = d.a AND c2.b = d.b
        JOIN c1 ON c1.a = d.a
        JOIN cb ON cb.b = d.b
        CROSS JOIN nt
    ),
    folded AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               list_reduce(
                   list_prepend(0.0, list(term ORDER BY a, b)),
                   (acc, x) -> acc + x) AS logprob
        FROM terms GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(f.n_bigrams, 0) AS n_bigrams,
           COALESCE(f.logprob, 0.0) AS logprob,
           CASE WHEN COALESCE(f.n_bigrams, 0) > 0
                THEN f.logprob / f.n_bigrams ELSE 0.0 END
               AS mean_logprob
    FROM documents d LEFT JOIN folded f
      ON f.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# --------------------------------------------------------- source_anova_f
def _anova_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "ss": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _values, lengths = _flat_tokens(t)
            y = np.asarray(lengths, dtype=np.int64)
            src = np.asarray(t.column("source").to_pylist())
            uk, inv = np.unique(src, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size).astype(np.int64)
            s = np.bincount(
                inv, weights=y, minlength=uk.size).astype(np.int64)
            ss = np.bincount(
                inv, weights=y * y, minlength=uk.size).astype(np.int64)
            return pa.table({
                "source": pa.array(uk, type=pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
                "ss": pa.array(ss),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("n", "sum"), ("s", "sum"), ("ss", "sum")])
            return pa.table({
                "source": g.column("source"),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "ss": g.column("ss_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("source").reset_index(drop=True)
        k = len(a)
        # sequential fold in ascending source order (oracle replays it)
        ssb_acc = 0.0
        ssw_acc = 0.0
        gn = 0.0
        gs = 0.0
        for r in a.itertuples():
            nf, sf, ssf = float(r.n), float(r.s), float(r.ss)
            cg = sf * sf / nf
            ssb_acc = ssb_acc + cg
            ssw_acc = ssw_acc + (ssf - cg)
            gn = gn + nf
            gs = gs + sf
        ssb = ssb_acc - gs * gs / gn
        ssw = ssw_acc
        df1 = float(k - 1)
        df2 = gn - float(k)
        f_stat = (ssb / df1) / (ssw / df2)
        return pa.table({
            "source": pa.array(a["source"], type=pa.string()),
            "n": pa.array(a["n"].to_numpy(np.int64)),
            "sum_ntok": pa.array(a["s"].to_numpy(np.int64)),
            "sumsq_ntok": pa.array(a["ss"].to_numpy(np.int64)),
            "ssb": pa.array(np.full(k, ssb), type=pa.float64()),
            "ssw": pa.array(np.full(k, ssw), type=pa.float64()),
            "f_stat": pa.array(np.full(k, f_stat),
                               type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
               d.source,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM len GROUP BY source
    ),
    fold AS (
        SELECT list_reduce(
            list_prepend(
                [0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([CAST(n AS DOUBLE), CAST(s AS DOUBLE),
                      CAST(ss AS DOUBLE)] ORDER BY source)),
            (acc, e) -> [
                acc[1] + e[2] * e[2] / e[1],
                acc[2] + (e[3] - e[2] * e[2] / e[1]),
                acc[3] + e[1],
                acc[4] + e[2]]) AS f,
            CAST(count(*) AS BIGINT) AS k
        FROM g
    )
    SELECT g.source, g.n,
           g.s AS sum_ntok,
           g.ss AS sumsq_ntok,
           fold.f[1] - fold.f[4] * fold.f[4] / fold.f[3] AS ssb,
           fold.f[2] AS ssw,
           ((fold.f[1] - fold.f[4] * fold.f[4] / fold.f[3])
                / CAST(fold.k - 1 AS DOUBLE))
           / (fold.f[2] / (fold.f[3] - CAST(fold.k AS DOUBLE)))
               AS f_stat
    FROM g CROSS JOIN fold
    """
    return q, sql


# ----------------------------------------------------- events_markov_steps
def _markov_steps_query(iters: int = MARKOV_ITERS):
    states = MARKOV_STATES
    absorb = MARKOV_ABSORB

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

        def transitions(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            same = users[1:] == users[:-1]
            src = et[:-1][same]
            dst = et[1:][same]
            if src.size == 0:
                return pa.table(
                    {"f": pa.array([""], type=pa.string()),
                     "t": pa.array([""], type=pa.string()),
                     "cnt": pa.array([0], type=pa.int64())}
                )
            key = np.char.add(np.char.add(
                src.astype(str), "|"), dst.astype(str))
            uk, uc = np.unique(key, return_counts=True)
            parts = np.char.partition(uk, "|")
            return pa.table(
                {"f": pa.array(list(parts[:, 0]) + [""],
                               type=pa.string()),
                 "t": pa.array(list(parts[:, 2]) + [""],
                               type=pa.string()),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["f", "t"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"f": g.column("f"), "t": g.column("t"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(transitions, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[(a["f"] != "") & (a["cnt"] > 0)]
        cnt = {(r.f, r.t): int(r.cnt) for r in a.itertuples()}
        ns = len(states)
        rowsum = [
            sum(cnt.get((f, t), 0)
                for t in list(states) + [absorb])
            for f in states
        ]
        qmat = [
            [
                (float(cnt.get((states[i], states[j]), 0))
                 / float(rowsum[i])) if rowsum[i] > 0 else 0.0
                for j in range(ns)
            ]
            for i in range(ns)
        ]
        # fixed-step Jacobi: t <- 1 + Q t, left-associated sum
        tvec = [0.0] * ns
        for _ in range(iters):
            tvec = [
                1.0
                + qmat[i][0] * tvec[0] + qmat[i][1] * tvec[1]
                + qmat[i][2] * tvec[2] + qmat[i][3] * tvec[3]
                for i in range(ns)
            ]
        n_purchase = [cnt.get((f, absorb), 0) for f in states]
        return pa.table({
            "state": pa.array(list(states), type=pa.string()),
            "n_out": pa.array(rowsum, type=pa.int64()),
            "n_to_purchase": pa.array(n_purchase, type=pa.int64()),
            "expected_steps": pa.array(tvec, type=pa.float64()),
        })

    st = states
    qcols = ",\n               ".join(
        f"COALESCE(max(CASE WHEN f = '{a}' AND t = '{b}' "
        f"THEN CAST(cnt AS DOUBLE) END), 0.0e0) "
        f"/ CAST(max(CASE WHEN f = '{a}' THEN r END) AS DOUBLE) "
        f"AS q{i}{j}"
        for i, a in enumerate(st) for j, b in enumerate(st)
    )
    rcols = ",\n               ".join(
        f"CAST(max(CASE WHEN f = '{a}' THEN r END) AS BIGINT) "
        f"AS r{i}"
        for i, a in enumerate(st)
    )
    pcols = ",\n               ".join(
        f"COALESCE(max(CASE WHEN f = '{a}' AND t = '{absorb}' "
        f"THEN cnt END), 0) AS p{i}"
        for i, a in enumerate(st)
    )
    steps = ",\n                    ".join(
        f"1.0e0 + qm.q{i}0 * acc[1] + qm.q{i}1 * acc[2] "
        f"+ qm.q{i}2 * acc[3] + qm.q{i}3 * acc[4]"
        for i in range(len(st))
    )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS state, {i + 1} AS idx"
        for i, a in enumerate(st)
    )
    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    tr AS (
        SELECT event_type AS f,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY tus, event_id) AS t
        FROM e
    ),
    c AS (
        SELECT f, t, CAST(count(*) AS BIGINT) AS cnt FROM tr
        WHERE t IS NOT NULL AND f <> '{absorb}' GROUP BY f, t
    ),
    rowm AS (
        SELECT f, CAST(sum(cnt) AS BIGINT) AS r FROM c GROUP BY f
    ),
    qm AS (
        SELECT {qcols},
               {rcols},
               {pcols}
        FROM c JOIN rowm USING (f)
    ),
    solved AS (
        SELECT qm.*,
               list_reduce(
                   list_prepend(
                       [0.0e0, 0.0e0, 0.0e0, 0.0e0],
                       list_transform(
                           generate_series(1, {iters}),
                           i -> [CAST(i AS DOUBLE)])),
                   (acc, i) -> [{steps}]) AS tvec
        FROM qm
    ),
    names AS ({rows})
    SELECT names.state,
           CASE names.idx WHEN 1 THEN solved.r0 WHEN 2 THEN solved.r1
                WHEN 3 THEN solved.r2 ELSE solved.r3 END AS n_out,
           CASE names.idx WHEN 1 THEN solved.p0 WHEN 2 THEN solved.p1
                WHEN 3 THEN solved.p2 ELSE solved.p3 END
               AS n_to_purchase,
           solved.tvec[names.idx] AS expected_steps
    FROM names CROSS JOIN solved
    """
    return q, sql


def build_wave60_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_kneser_ney",) + _kneser_ney_query()))
    add(*(("source_anova_f",) + _anova_query()))
    add(*(("events_markov_steps",) + _markov_steps_query()))
    return queries, oracles
