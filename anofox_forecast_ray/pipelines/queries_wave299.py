"""Wave-299 query: per-source divergence from the corpus.

source_jsd_to_corpus: the Jensen-Shannon divergence of each source's
unigram (codepoint) distribution from the WHOLE-CORPUS distribution
— the per-source drift score that the pairwise source_jsd_matrix
does not expose directly.  Bounded integer histograms; each source's
JSD folds −p·ln(p/m) + −q·ln(q/m) halves in token order with the
0·ln0 convention mirrored; 20 rows ordered by source.

Round 3: the per-source folds run as Ray tasks over a broadcast
corpus histogram (the driver previously looped the whole vocab per
source — bounded here, but the hotspot the r2 verdict flagged); the
fold itself stays token-ascending sequential for bitwise oracle
parity.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def jsd_to_corpus_arrays(src_tok, src_cnt, corpus_tok, corpus_cnt):
    """JSD(src ‖ corpus) — token-ascending ordered fold over aligned
    int64 arrays (corpus_tok sorted ascending; src histogram gathered
    onto it via searchsorted)."""
    f1 = float(src_cnt.sum())
    f2 = float(corpus_cnt.sum())
    idx = np.searchsorted(corpus_tok, src_tok)
    aligned = np.zeros(corpus_tok.size, dtype=np.int64)
    aligned[idx] = src_cnt
    j = 0.0
    for sp, sq in zip(aligned.tolist(), corpus_cnt.tolist()):
        p = float(sp) / f1
        q = float(sq) / f2
        m = 0.5 * (p + q)
        term = 0.0
        if p > 0.0:
            term = term + 0.5 * (p * math.log(p / m))
        if q > 0.0:
            term = term + 0.5 * (q * math.log(q / m))
        j = j + term
    return j


def _jsd_corpus_query():
    def q(sf_dir: str):
        import ray

        from .queries_wave247 import _src_token_hist

        h = _src_token_hist(sf_dir)
        src = np.asarray(h["source"], dtype=object)
        tok = h["token"].to_numpy().astype(np.int64)
        cnt = h["cnt"].to_numpy().astype(np.int64)
        # corpus histogram: vectorized integer combine, token-ascending
        corpus_tok, start = np.unique(tok, return_index=True)
        order = np.argsort(tok, kind="stable")
        corpus_cnt = np.add.reduceat(cnt[order], np.searchsorted(
            tok[order], corpus_tok))
        corpus_ref = ray.put((corpus_tok, corpus_cnt))

        @ray.remote(num_cpus=1)
        def jsd_task(stok, scnt, cref):
            ct, cc = cref
            return jsd_to_corpus_arrays(stok, scnt, ct, cc)

        sources = sorted(set(src.tolist()))
        futs = []
        for name in sources:
            m = src == name
            futs.append(jsd_task.remote(tok[m], cnt[m], corpus_ref))
        vals = ray.get(futs)
        return pa.table({
            "source": pa.array(sources, type=pa.string()),
            "jsd_to_corpus": pa.array(vals, type=pa.float64()),
        })

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    h AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    corpus AS (
        SELECT token, CAST(sum(cnt) AS BIGINT) AS c
        FROM h GROUP BY token
    ),
    nn AS (
        SELECT (SELECT CAST(sum(c) AS BIGINT) FROM corpus) AS n2
    ),
    ns AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n1
        FROM h GROUP BY source
    ),
    terms AS (
        SELECT ns.source, corpus.token,
               CASE WHEN coalesce(hh.cnt, 0) > 0 THEN
                   0.5e0 * ((CAST(hh.cnt AS DOUBLE)
                             / CAST(ns.n1 AS DOUBLE))
                       * ln((CAST(hh.cnt AS DOUBLE)
                             / CAST(ns.n1 AS DOUBLE))
                            / (0.5e0 * (CAST(coalesce(hh.cnt, 0)
                                             AS DOUBLE)
                                        / CAST(ns.n1 AS DOUBLE)
                                        + CAST(corpus.c AS DOUBLE)
                                          / CAST(nn.n2
                                                 AS DOUBLE)))))
               ELSE 0.0e0 END
               + 0.5e0 * ((CAST(corpus.c AS DOUBLE)
                           / CAST(nn.n2 AS DOUBLE))
                   * ln((CAST(corpus.c AS DOUBLE)
                         / CAST(nn.n2 AS DOUBLE))
                        / (0.5e0 * (CAST(coalesce(hh.cnt, 0)
                                         AS DOUBLE)
                                    / CAST(ns.n1 AS DOUBLE)
                                    + CAST(corpus.c AS DOUBLE)
                                      / CAST(nn.n2 AS DOUBLE)))))
                   AS term
        FROM ns CROSS JOIN corpus CROSS JOIN nn
        LEFT JOIN h hh ON hh.source = ns.source
                      AND hh.token = corpus.token
    )
    SELECT source,
           list_reduce(list_prepend(0.0e0,
               list(term ORDER BY token)), (a, b) -> a + b)
               AS jsd_to_corpus
    FROM terms
    GROUP BY source
    ORDER BY source
    """
    return q, sql


def build_wave299_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_jsd_to_corpus",) + _jsd_corpus_query()))
    return queries, oracles
