"""Wave-281 query: bigram LM transfer matrix.

source_lm_transfer_matrix: the 5×5 cross-entropy matrix of add-one
smoothed bigram language models between sources src0..src4 —
H(s→t) = −(1/N_s)·Σ_ab n^s_ab·ln((n^t_ab+1)/(n^t_a·+V)) with V the
global corpus alphabet.  Counts are bounded integer histograms; each
matrix cell folds the evaluated source's bigrams in (a, b) order.
The self-model diagonal is minimal in every row (checked in the
verify harness) — the corpus-level analogue of the Burrows-delta /
keyness stylometry rows, in proper perplexity units.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

LM_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def lm_transfer(bi_by_src, vocab):
    """25 rows (s, t, H) from per-source {(a,b): n} and global V."""
    fv = float(vocab)
    marg = {}
    for s, bi in bi_by_src.items():
        m = {}
        for (a, _b), n in bi.items():
            m[a] = m.get(a, 0) + n
        marg[s] = m
    rows = []
    for s in LM_SOURCES:
        bi_s = bi_by_src[s]
        n_s = sum(bi_s.values())
        for t in LM_SOURCES:
            bi_t = bi_by_src[t]
            m_t = marg[t]
            h = 0.0
            for key in sorted(bi_s):
                a, b = key
                n_ab = bi_s[key]
                q = (float(bi_t.get(key, 0) + 1)
                     / (float(m_t.get(a, 0)) + fv))
                h = h + (-(float(n_ab) * math.log(q)))
            rows.append((s, t, h / float(n_s)))
    return rows


def _lm_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "src": pa.array([], type=pa.string()),
                "key": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
                "tok": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            row = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            v = values.astype(np.int64)
            # global alphabet contribution (all sources)
            utok = np.unique(v)
            keep_row = np.isin(src, LM_SOURCES)
            ok = (row[:-1] == row[1:]) & keep_row[row[:-1]]
            key = (v[:-1][ok] << 21) | v[1:][ok]
            ssel = src[row[:-1][ok]]
            out_src, out_key, out_cnt = [], [], []
            for s in np.unique(ssel):
                m = ssel == s
                uk, cnt = np.unique(key[m], return_counts=True)
                out_src.extend([str(s)] * uk.size)
                out_key.extend(int(x) for x in uk)
                out_cnt.extend(int(x) for x in cnt)
            # "__tok__" rows carry the GLOBAL alphabet (distinct keys
            # survive the merge; their summed cnt is irrelevant)
            return pa.table({
                "src": pa.array(out_src + ["__tok__"] * utok.size,
                                type=pa.string()),
                "key": pa.array(out_key + [int(x) for x in utok],
                                type=pa.int64()),
                "cnt": pa.array(out_cnt + [1] * utok.size,
                                type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["src", "key"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "src": g.column("src"),
                "key": g.column("key").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        mask = (1 << 21) - 1
        vocab = int((h["src"] == "__tok__").sum())
        bi_by_src = {s: {} for s in LM_SOURCES}
        for s, kk, nn in zip(h["src"], h["key"].astype(int),
                             h["cnt"].astype(int)):
            if s in bi_by_src:
                bi_by_src[s][(kk >> 21, kk & mask)] = int(nn)
        rows = lm_transfer(bi_by_src, vocab)
        return pa.table({
            "s": pa.array([r[0] for r in rows],
                          type=pa.string()),
            "t": pa.array([r[1] for r in rows],
                          type=pa.string()),
            "cross_entropy": pa.array([r[2] for r in rows],
                                      type=pa.float64()),
        })

    from .queries import SQL_TOK

    srcs = ", ".join(f"'{s}'" for s in LM_SOURCES)
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    vocab AS (
        SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
        FROM tok
    ),
    bi AS (
        SELECT source AS src, token AS a,
               lead(token) OVER (PARTITION BY doc_id
                                 ORDER BY pos) AS b
        FROM tok WHERE source IN ({srcs})
    ),
    h AS (
        SELECT src, a, b, CAST(count(*) AS BIGINT) AS n
        FROM bi WHERE b IS NOT NULL GROUP BY src, a, b
    ),
    marg AS (
        SELECT src, a, CAST(sum(n) AS BIGINT) AS na
        FROM h GROUP BY src, a
    ),
    ns AS (
        SELECT src, CAST(sum(n) AS BIGINT) AS n_s
        FROM h GROUP BY src
    ),
    pairs AS (
        SELECT s.src AS s, t.src AS t
        FROM ns s CROSS JOIN ns t
    ),
    terms AS (
        SELECT p.s, p.t, hs.a, hs.b, hs.n,
               -(CAST(hs.n AS DOUBLE)
                 * ln(CAST(coalesce(ht.n, 0) + 1 AS DOUBLE)
                      / (CAST(coalesce(mt.na, 0) AS DOUBLE)
                         + CAST((SELECT v FROM vocab)
                                AS DOUBLE)))) AS term
        FROM pairs p
        JOIN h hs ON hs.src = p.s
        LEFT JOIN h ht ON ht.src = p.t AND ht.a = hs.a
                      AND ht.b = hs.b
        LEFT JOIN marg mt ON mt.src = p.t AND mt.a = hs.a
    )
    SELECT terms.s, terms.t,
           list_reduce(list_prepend(0.0e0,
               list(term ORDER BY a, b)), (x, y) -> x + y)
           / CAST(ns.n_s AS DOUBLE) AS cross_entropy
    FROM terms JOIN ns ON ns.src = terms.s
    GROUP BY terms.s, terms.t, ns.n_s
    ORDER BY terms.s, terms.t
    """
    return q, sql


def build_wave281_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_lm_transfer_matrix",) + _lm_query()))
    return queries, oracles
