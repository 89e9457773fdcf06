"""Wave-81 queries: Chao1 richness / Good-Turing mass, and the
bigram G-squared independence test.

- source_chao1_goodturing: unseen-vocabulary estimation per source —
  Chao1 richness S_hat = S + f1*(f1-1)/(2*(f2+1)) (bias-corrected
  form, defined even when f2 = 0) and the Good-Turing unseen mass
  P0 = f1/N, where f1/f2 are singleton/doubleton token-type counts.
  Everything except the two final divisions is an exact int64 from
  the bounded (source x alphabet) histogram.
- corpus_bigram_g2: the G-squared likelihood-ratio test of bigram
  independence (is the corpus Markov of order >= 1?): G2 = 2 * sum
  c_ab * ln(c_ab * N / (c_a * c_b)) over observed bigram types —
  integer counts, one scalar log per bounded type, (a, b)-ordered
  fold. Degrees of freedom (|A|-1)(|B|-1) emitted as exact ints.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


# ---------------------------------------------------- source_chao1_goodturing
def _chao1_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            shift = np.int64(1 << 21)
            names, inv = np.unique(src, return_inverse=True)
            keys = (np.repeat(inv, lengths).astype(np.int64)
                    * shift + values.astype(np.int64))
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "token": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        rows = []
        for src, grp in h.groupby("source", sort=True):
            c = grp["cnt"].to_numpy(np.int64)
            s_types = int(c.size)
            n = int(c.sum())
            f1 = int((c == 1).sum())
            f2 = int((c == 2).sum())
            chao1 = (float(s_types)
                     + float(f1) * float(f1 - 1)
                     / (2.0 * (float(f2) + 1.0)))
            p0 = float(f1) / float(n)
            rows.append((src, s_types, n, f1, f2, chao1, p0))
        return pa.table({
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "s_types": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "n_tok": pa.array([r[2] for r in rows],
                              type=pa.int64()),
            "f1": pa.array([r[3] for r in rows], type=pa.int64()),
            "f2": pa.array([r[4] for r in rows], type=pa.int64()),
            "chao1": pa.array([r[5] for r in rows],
                              type=pa.float64()),
            "gt_p0": pa.array([r[6] for r in rows],
                              type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS s_types,
           CAST(sum(cnt) AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS f1,
           CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS f2,
           CAST(count(*) AS DOUBLE)
           + CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE)
             * CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) - 1
                    AS DOUBLE)
             / (2.0e0 * (CAST(sum(CASE WHEN cnt = 2 THEN 1
                                  ELSE 0 END) AS DOUBLE)
                         + 1.0e0)) AS chao1,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                AS DOUBLE)
               / CAST(sum(cnt) AS DOUBLE) AS gt_p0
    FROM c GROUP BY source
    """
    return q, sql


# ------------------------------------------------------------ corpus_bigram_g2
def _bigram_g2_query():
    def q(sf_dir: str):
        from ..extras.lm import train_bigram_model, SHIFT

        model = train_bigram_model(corpus_ds(sf_dir))
        keys, c2, a_keys, c1, _v, _ltab = model
        a = keys // SHIFT
        b = keys % SHIFT
        # right-marginal counts
        b_keys, b_inv = np.unique(b, return_inverse=True)
        cb = np.zeros(b_keys.size, dtype=np.int64)
        np.add.at(cb, b_inv, c2)
        c1k = c1[np.searchsorted(a_keys, a)]
        cbk = cb[b_inv]
        n = int(c2.sum())
        g2 = 0.0
        order = np.argsort(keys)  # keys already sorted, kept explicit
        for i in order:
            cab = float(int(c2[i]))
            term = cab * math.log(
                float(int(c2[i])) * float(n)
                / (float(int(c1k[i])) * float(int(cbk[i]))))
            g2 = g2 + term
        g2 = 2.0 * g2
        df = (int(a_keys.size) - 1) * (int(b_keys.size) - 1)
        return pa.table({
            "n_pairs": pa.array([n], type=pa.int64()),
            "n_types": pa.array([int(keys.size)],
                                type=pa.int64()),
            "dof": pa.array([df], type=pa.int64()),
            "g2": pa.array([g2], type=pa.float64()),
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
    ca AS (SELECT a, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY a),
    cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS c FROM c2 GROUP BY b),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2),
    terms AS (
        SELECT c2.a, c2.b,
               CAST(c2.c AS DOUBLE)
               * ln(CAST(c2.c AS DOUBLE) * CAST(nn.n AS DOUBLE)
                    / (CAST(ca.c AS DOUBLE)
                       * CAST(cb.c AS DOUBLE))) AS term
        FROM c2
        JOIN ca ON ca.a = c2.a
        JOIN cb ON cb.b = c2.b
        CROSS JOIN nn
    )
    SELECT (SELECT n FROM nn) AS n_pairs,
           CAST((SELECT count(*) FROM c2) AS BIGINT) AS n_types,
           CAST(((SELECT count(*) FROM ca) - 1)
                * ((SELECT count(*) FROM cb) - 1) AS BIGINT)
               AS dof,
           2.0e0 * list_reduce(list_prepend(0.0e0,
               list(term ORDER BY a, b)), (x, y) -> x + y) AS g2
    FROM terms LIMIT 1
    """
    return q, sql


def build_wave81_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_chao1_goodturing",) + _chao1_query()))
    add(*(("corpus_bigram_g2",) + _bigram_g2_query()))
    return queries, oracles
