"""Wave-171 queries: UMass topic coherence, Condorcet ranking.

- doc_topic_coherence: the UMass coherence score of the corpus'
  top-10 tokens (the "topic" LDA/NMF evals score) —
  C = sum over ordered pairs (i < j by frequency rank) of
  ln((D(wi, wj) + 1) / D(wj)), with document co-occurrence counts
  D(.,.) exact integers from per-row token sets and one scalar ln
  per pair, folded in (i, j) rank order.
- supplier_condorcet: social-choice ranking of the top suppliers —
  each month "votes" by revenue; supplier a beats b if a out-earns
  b in a strict majority of months both were active; the Copeland
  score counts pairwise wins, and the query reports the Copeland
  ranking (score desc, suppkey) with the Condorcet-winner flag
  (beats every opponent). All integer counts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

COH_K = 10
CND_TOP = 8  # rank the top-8 suppliers by total revenue


# ------------------------------------------------------- doc_topic_coherence
def _coherence_query(k: int = COH_K):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "kind": pa.array([], type=pa.int8()),
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            # global token counts (kind 0) + per-doc distinct
            # pair co-occurrence (kind 1) + doc freq (kind 2)
            import collections
            tot = collections.Counter()
            df = collections.Counter()
            co = collections.Counter()
            off = 0
            for ln in lengths.tolist():
                toks = sorted(set(
                    int(v) for v in values[off:off + ln]))
                off += ln
                for t1 in toks:
                    df[t1] += 1
                for i in range(len(toks)):
                    for j in range(i + 1, len(toks)):
                        co[(toks[i], toks[j])] += 1
            for v in values.tolist():
                tot[int(v)] += 1
            rows_k, rows_a, rows_b, rows_c = [], [], [], []
            for t1, c in sorted(tot.items()):
                rows_k.append(0)
                rows_a.append(t1)
                rows_b.append(0)
                rows_c.append(c)
            for t1, c in sorted(df.items()):
                rows_k.append(2)
                rows_a.append(t1)
                rows_b.append(0)
                rows_c.append(c)
            for (t1, t2), c in sorted(co.items()):
                rows_k.append(1)
                rows_a.append(t1)
                rows_b.append(t2)
                rows_c.append(c)
            return pa.table({
                "kind": pa.array(rows_k, type=pa.int8()),
                "a": pa.array(rows_a, type=pa.int64()),
                "b": pa.array(rows_b, type=pa.int64()),
                "c": pa.array(rows_c, type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["kind", "a", "b"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "kind": g.column("kind").cast(pa.int8()),
                "a": g.column("a").cast(pa.int64()),
                "b": g.column("b").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        tot = {int(r["a"]): int(r["c"])
               for _, r in m[m["kind"] == 0].iterrows()}
        df = {int(r["a"]): int(r["c"])
              for _, r in m[m["kind"] == 2].iterrows()}
        co = {(int(r["a"]), int(r["b"])): int(r["c"])
              for _, r in m[m["kind"] == 1].iterrows()}

        top = sorted(tot.items(),
                     key=lambda kv: (-kv[1], kv[0]))[:k]
        toks = [t for t, _c in top]
        coh = 0.0
        n_pairs = 0
        for i in range(k):
            for j in range(i + 1, k):
                t1, t2 = toks[i], toks[j]
                key = (t1, t2) if t1 < t2 else (t2, t1)
                d12 = co.get(key, 0)
                coh = coh + math.log(
                    (float(d12) + 1.0)
                    / float(df[toks[j]]))
                n_pairs += 1
        return pa.table({
            "k_tokens": pa.array([k], type=pa.int64()),
            "n_pairs": pa.array([n_pairs],
                                type=pa.int64()),
            "umass_coherence": pa.array([coh],
                                        type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tot AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY token
    ),
    top AS (
        SELECT token,
               CAST(row_number() OVER (
                   ORDER BY c DESC, token ASC) AS BIGINT)
                   AS rk
        FROM tot
        QUALIFY rk <= {k}
    ),
    dt AS (
        SELECT DISTINCT doc_id, token FROM tok
        WHERE token IN (SELECT token FROM top)
    ),
    df AS (
        SELECT token, CAST(count(*) AS BIGINT) AS d
        FROM dt GROUP BY token
    ),
    pairs AS (
        SELECT a.rk AS ri, b.rk AS rj,
               a.token AS ti, b.token AS tj
        FROM top a JOIN top b ON b.rk > a.rk
    ),
    co AS (
        SELECT p.ri, p.rj,
               (SELECT CAST(count(*) AS BIGINT)
                FROM dt x JOIN dt y
                  ON y.doc_id = x.doc_id
                WHERE x.token = p.ti AND y.token = p.tj)
                   AS d12,
               (SELECT d FROM df WHERE token = p.tj) AS dj
        FROM pairs p
    ),
    fold AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(ln((CAST(d12 AS DOUBLE) + 1.0e0)
                           / CAST(dj AS DOUBLE))
                        ORDER BY ri, rj)),
                   (x, y) -> x + y) AS coh,
               CAST(count(*) AS BIGINT) AS np_
        FROM co
    )
    SELECT CAST({k} AS BIGINT) AS k_tokens,
           np_ AS n_pairs,
           coh AS umass_coherence
    FROM fold
    """
    return q, sql


# -------------------------------------------------------- supplier_condorcet
def _condorcet_query(top_n: int = CND_TOP):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "skey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "rev": pa.array([], type=pa.int64()),
            })
            if "l_suppkey" not in t.column_names:
                return empty
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            key = skey * np.int64(1 << 16) + month
            uk, inv = np.unique(key, return_inverse=True)
            rv = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "skey": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "rev": pa.array(rv),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["skey", "month"]).aggregate(
                [("rev", "sum")])
            return pa.table({
                "skey": g.column("skey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                         "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        tot = cells.groupby("skey")["rev"].sum()
        top = sorted(
            zip(tot.to_numpy(np.int64),
                tot.index.to_numpy(np.int64)),
            key=lambda r: (-int(r[0]), int(r[1])))[:top_n]
        sup = [int(s) for _r, s in top]

        # month -> {skey: rev} for the top suppliers
        sub = cells[cells["skey"].isin(set(sup))]
        by_m = {}
        for _, r in sub.iterrows():
            by_m.setdefault(int(r["month"]), {})[
                int(r["skey"])] = int(r["rev"])

        wins = {s: 0 for s in sup}
        beats = {s: set() for s in sup}
        for i in range(len(sup)):
            for j in range(i + 1, len(sup)):
                a, b = sup[i], sup[j]
                wa = wb = 0
                for _m, d in by_m.items():
                    if a in d and b in d:
                        if d[a] > d[b]:
                            wa += 1
                        elif d[b] > d[a]:
                            wb += 1
                if wa > wb:
                    wins[a] += 1
                    beats[a].add(b)
                elif wb > wa:
                    wins[b] += 1
                    beats[b].add(a)

        rows = sorted(((wins[s], s) for s in sup),
                      key=lambda r: (-r[0], r[1]))
        return pa.table({
            "s_suppkey": pa.array([s for _w, s in rows],
                                  type=pa.int64()),
            "copeland": pa.array([w for w, _s in rows],
                                 type=pa.int64()),
            "condorcet_winner": pa.array(
                [1 if len(beats[s]) == len(sup) - 1 else 0
                 for _w, s in rows], type=pa.int64()),
        })

    sql = f"""
    WITH rev AS (
        SELECT l_suppkey AS skey,
               year(l_shipdate) * 12 + month(l_shipdate)
                   AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1, 2
    ),
    top AS (
        SELECT skey FROM (
            SELECT skey, sum(r) AS tr FROM rev GROUP BY skey
            ORDER BY tr DESC, skey ASC LIMIT {top_n})
    ),
    duels AS (
        SELECT a.skey AS sa, b.skey AS sb,
               CAST(sum(CASE WHEN ra.r > rb.r
                        THEN 1 ELSE 0 END) AS BIGINT) AS wa,
               CAST(sum(CASE WHEN rb.r > ra.r
                        THEN 1 ELSE 0 END) AS BIGINT) AS wb
        FROM top a JOIN top b ON b.skey > a.skey
        JOIN rev ra ON ra.skey = a.skey
        JOIN rev rb ON rb.skey = b.skey
                   AND rb.month = ra.month
        GROUP BY 1, 2
    ),
    wins AS (
        SELECT skey,
               CAST(COALESCE(sum(w), 0) AS BIGINT) AS cop
        FROM (
            SELECT sa AS skey,
                   CASE WHEN wa > wb THEN 1 ELSE 0 END AS w
            FROM duels
            UNION ALL
            SELECT sb, CASE WHEN wb > wa THEN 1 ELSE 0 END
            FROM duels
        ) GROUP BY skey
    ),
    full_ AS (
        SELECT top.skey, COALESCE(wins.cop, 0) AS cop
        FROM top LEFT JOIN wins ON wins.skey = top.skey
    )
    SELECT skey AS s_suppkey,
           cop AS copeland,
           CAST(CASE WHEN cop = {top_n - 1} THEN 1 ELSE 0 END
                AS BIGINT) AS condorcet_winner
    FROM full_
    ORDER BY cop DESC, skey ASC
    """
    return q, sql


def build_wave171_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_topic_coherence",) + _coherence_query()))
    add(*(("supplier_condorcet",) + _condorcet_query()))
    return queries, oracles
