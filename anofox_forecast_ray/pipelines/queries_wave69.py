"""Wave-69 queries: held-out cross-perplexity, TPC-H Q19 disjunctive
revenue, and Wilson confidence intervals.

- corpus_heldout_ppl: generalization check for the char-bigram LM —
  train on EVEN doc_ids, score the ODD docs with the unseen-safe
  smoothed scorer (extras/lm.model_score_tables: seen pair ->
  ln((c2+1)/(c1+V)); seen context only -> ln(1/(c1+V)); unseen
  context -> ln(1/V)); the DuckDB oracle is the same three-way
  COALESCE. The held-out mean logprob is the quality number CCNet
  actually uses (self-perplexity over-fits).
- lineitem_q19_disjunct: TPC-H Q19 reshaped to the synthetic schema
  — revenue over a disjunction of three (brand, size-range,
  qty-range) predicate arms. Exercises OR-of-conjunction pushdown
  with the part attributes broadcast once (ray.put + searchsorted);
  revenue in exact integer cents x basis points; per-arm line counts
  emitted so each arm is independently pinned.
- events_wilson_ci: per event type, the share of HEAVY users (>= 15
  events of that type; every user fires every type at least once on
  this corpus, so the ever-fired rate is a degenerate 1.0) with
  Wilson score interval bounds (z = 1.96) — the correct small-n
  confidence interval for rates dashboards. Per-(type, user) counts
  reduce per block before any shuffle; bounds are one scalar
  expression of exact ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

Q19_ARMS = (
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 1, 25, 10, 20),
    ("Brand#3", 1, 35, 20, 30),
)
WILSON_Z = 1.96
WILSON_MIN_EVENTS = 15


# ------------------------------------------------------ corpus_heldout_ppl
def _heldout_ppl_query():
    def q(sf_dir: str):
        import ray

        from ..extras.lm import (model_score_tables, _score_rows,
                                 train_bigram_model)
        from ..stages.rollup import _flat_tokens

        def even_only(t: pa.Table) -> pa.Table:
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64)
            return t.filter(pa.array(ids % 2 == 0))

        train = corpus_ds(sf_dir).map_batches(
            even_only, batch_format="pyarrow")
        tables = model_score_tables(train_bigram_model(train))
        tref = ray.put(tables)

        class HeldoutScore:
            def __init__(self, tref):
                self.tables = ray.get(tref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ids = np.asarray(
                    [int(d)
                     for d in t.column("doc_id").to_pylist()],
                    dtype=np.int64)
                t = t.filter(pa.array(ids % 2 == 1))
                if t.num_rows == 0:
                    return pa.table({
                        "doc_id": pa.array([], type=pa.string()),
                        "n_bigrams": pa.array([],
                                              type=pa.int64()),
                        "logprob": pa.array([],
                                            type=pa.float64()),
                        "mean_logprob": pa.array(
                            [], type=pa.float64()),
                    })
                values, lengths = _flat_tokens(t)
                n, lp = _score_rows(
                    self.tables, values,
                    np.asarray(lengths, dtype=np.int64))
                mean = np.where(n > 0, lp / np.maximum(n, 1), 0.0)
                return pa.table({
                    "doc_id": t.column("doc_id").cast(pa.string()),
                    "n_bigrams": pa.array(n),
                    "logprob": pa.array(lp, type=pa.float64()),
                    "mean_logprob": pa.array(mean,
                                             type=pa.float64()),
                })

        def score(t: pa.Table, _ref=tref) -> pa.Table:
            # plain TASK pool (see extras/lm.py): ray.get is a zero-copy
            # plasma read per task, parallelism tracks CPUs instead of a
            # capped actor pool (which also pays ~1 s spin-up per query)
            return HeldoutScore(_ref)(t)

        out = corpus_ds(sf_dir).map_batches(
            score, batch_format="pyarrow",
        )
        return _cast(out, {
            "doc_id": pa.string(),
            "n_bigrams": pa.int64(),
            "logprob": pa.float64(),
            "mean_logprob": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.doc_id, CAST(t1.doc_id AS BIGINT) % 2 AS odd,
               t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
           FROM pr WHERE odd = 0 GROUP BY a, b),
    c1 AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY a),
    vv AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS v
           FROM pr WHERE odd = 0),
    dterm AS (
        SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        FROM pr WHERE odd = 1 GROUP BY doc_id, a, b
    ),
    terms AS (
        SELECT d.doc_id, d.a, d.b, d.n,
               CAST(d.n AS DOUBLE) *
               ln((CAST(COALESCE(c2.c, 0) AS DOUBLE) + 1.0)
                  / (CAST(COALESCE(c1.c, 0) AS DOUBLE) + vv.v))
                   AS term
        FROM dterm d
        LEFT JOIN c2 ON c2.a = d.a AND c2.b = d.b
        LEFT JOIN c1 ON c1.a = d.a
        CROSS JOIN vv
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
    WHERE CAST(d.doc_id AS BIGINT) % 2 = 1
    """
    return q, sql


# ---------------------------------------------------- lineitem_q19_disjunct
def _q19_query(arms: tuple = Q19_ARMS):
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        part = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"])
        pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk = pk[order]
        brand = np.asarray(part.column("p_brand").to_pylist())[order]
        size = part.column("p_size").to_numpy(
            zero_copy_only=False)[order]
        bref = ray.put((pk, brand, size))
        nargs = len(arms)

        class Partial:
            def __init__(self, bref):
                self.pk, self.brand, self.size = ray.get(bref)

            def __call__(self, t: pa.Table) -> pa.Table:
                cols = {f"n{i}": [0] for i in range(nargs)}
                cols["rev"] = [0]
                if "l_partkey" not in t.column_names:
                    return pa.table({
                        k: pa.array(v, type=pa.int64())
                        for k, v in cols.items()})
                lpk = t.column("l_partkey").to_numpy(
                    zero_copy_only=False)
                qty = np.round(
                    t.column("l_quantity").to_numpy(
                        zero_copy_only=False)).astype(np.int64)
                price = np.round(
                    t.column("l_extendedprice").to_numpy(
                        zero_copy_only=False) * 100.0
                ).astype(np.int64)
                disc = np.round(
                    t.column("l_discount").to_numpy(
                        zero_copy_only=False) * 10000.0
                ).astype(np.int64)
                idx = np.searchsorted(self.pk, lpk)
                b = self.brand[idx]
                s = self.size[idx]
                keep = np.zeros(len(lpk), dtype=bool)
                for i, (bn, slo, shi, qlo, qhi) in enumerate(arms):
                    arm = ((b == bn) & (s >= slo) & (s <= shi)
                           & (qty >= qlo) & (qty <= qhi))
                    cols[f"n{i}"] = [int(arm.sum())]
                    keep |= arm
                rev = price[keep] * (10000 - disc[keep])
                cols["rev"] = [int(rev.sum())]
                return pa.table({
                    k: pa.array(v, type=pa.int64())
                    for k, v in cols.items()})

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in t.column_names
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_quantity",
                         "l_extendedprice", "l_discount"])
            .map_batches(Partial, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_args=(bref,))
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        out = {c: pa.array([int(a.column(c)[0].as_py())],
                           type=pa.int64())
               for c in a.column_names}
        rev = int(a.column("rev")[0].as_py())
        out["revenue"] = pa.array(
            [float(np.float64(rev) / 1_000_000.0)],
            type=pa.float64())
        return pa.table(out)

    arm_sql = " OR ".join(
        f"""(p.p_brand = '{bn}' AND p.p_size BETWEEN {slo} AND {shi}
          AND CAST(round_even(l.l_quantity, 0) AS BIGINT)
              BETWEEN {qlo} AND {qhi})"""
        for bn, slo, shi, qlo, qhi in arms)
    n_cols = ",\n           ".join(
        f"""CAST(COALESCE(sum(CASE WHEN p.p_brand = '{bn}'
              AND p.p_size BETWEEN {slo} AND {shi}
              AND CAST(round_even(l.l_quantity, 0) AS BIGINT)
                  BETWEEN {qlo} AND {qhi}
              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n{i}"""
        for i, (bn, slo, shi, qlo, qhi) in enumerate(arms))
    sql = f"""
    SELECT
           {n_cols},
           CAST(COALESCE(sum(CASE WHEN {arm_sql}
               THEN CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))
               ELSE 0 END), 0) AS BIGINT) AS rev,
           CAST(COALESCE(sum(CASE WHEN {arm_sql}
               THEN CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))
               ELSE 0 END), 0) AS DOUBLE) / 1000000.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """
    return q, sql


# --------------------------------------------------------- events_wilson_ci
def _wilson_query(z: float = WILSON_Z,
                  min_events: int = WILSON_MIN_EVENTS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "event_type": pa.array([], type=pa.string()),
                    "user_id": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            key = np.char.add(np.char.add(
                et, "|"), uid.astype(str))
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=uk.size).astype(
                np.int64)
            parts = np.char.partition(uk, "|")
            return pa.table({
                "event_type": pa.array(list(parts[:, 0]),
                                       type=pa.string()),
                "user_id": pa.array(
                    parts[:, 2].astype(np.int64)),
                "cnt": pa.array(cnt),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "user_id"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "event_type": g.column("event_type"),
                "user_id": g.column("user_id").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        n_users = int(a["user_id"].nunique())
        heavy = a[a["cnt"] >= min_events]
        cnt = heavy.groupby("event_type")["user_id"].nunique()
        types = sorted(a["event_type"].unique())
        cnt = cnt.reindex(types, fill_value=0)
        zz = z * z
        rows = []
        for et in types:
            x = int(cnt[et])
            nf = float(n_users)
            p = float(x) / nf
            center = (p + zz / (2.0 * nf)) / (1.0 + zz / nf)
            import math
            half = (z * math.sqrt(
                p * (1.0 - p) / nf + zz / (4.0 * nf * nf))
                / (1.0 + zz / nf))
            rows.append((et, x, p, center - half, center + half))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows],
                                   type=pa.string()),
            "n_users_with": pa.array([r[1] for r in rows],
                                     type=pa.int64()),
            "share": pa.array([r[2] for r in rows],
                              type=pa.float64()),
            "wilson_lo": pa.array([r[3] for r in rows],
                                  type=pa.float64()),
            "wilson_hi": pa.array([r[4] for r in rows],
                                  type=pa.float64()),
        })

    zs = f"{z}e0"
    sql = f"""
    WITH n AS (
        SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS nf
        FROM events
    ),
    uc AS (
        SELECT event_type, user_id, count(*) AS cnt
        FROM events GROUP BY event_type, user_id
    ),
    c AS (
        SELECT event_type,
               CAST(sum(CASE WHEN cnt >= {WILSON_MIN_EVENTS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM uc GROUP BY event_type
    ),
    p AS (
        SELECT c.event_type, c.x, n.nf,
               CAST(c.x AS DOUBLE) / n.nf AS p,
               {zs} * {zs} AS zz
        FROM c CROSS JOIN n
    )
    SELECT event_type,
           x AS n_users_with,
           p AS share,
           (p + zz / (2.0e0 * nf)) / (1.0e0 + zz / nf)
           - ({zs} * sqrt(p * (1.0e0 - p) / nf
                          + zz / (4.0e0 * nf * nf))
              / (1.0e0 + zz / nf)) AS wilson_lo,
           (p + zz / (2.0e0 * nf)) / (1.0e0 + zz / nf)
           + ({zs} * sqrt(p * (1.0e0 - p) / nf
                          + zz / (4.0e0 * nf * nf))
              / (1.0e0 + zz / nf)) AS wilson_hi
    FROM p
    """
    return q, sql


def build_wave69_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_heldout_ppl",) + _heldout_ppl_query()))
    add(*(("lineitem_q19_disjunct",) + _q19_query()))
    add(*(("events_wilson_ci",) + _wilson_query()))
    return queries, oracles
