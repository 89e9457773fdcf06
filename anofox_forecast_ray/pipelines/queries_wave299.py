"""Wave-299 query: per-source divergence from the corpus.

source_jsd_to_corpus: the Jensen-Shannon divergence of each source's
unigram (codepoint) distribution from the WHOLE-CORPUS distribution
— the per-source drift score that the pairwise source_jsd_matrix
does not expose directly.  Bounded integer histograms; each source's
JSD folds −p·ln(p/m) + −q·ln(q/m) halves in token order with the
0·ln0 convention mirrored; 20 rows ordered by source.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def jsd_to_corpus(src_hist, corpus_hist):
    """JSD(src ‖ corpus) — token-ascending ordered fold."""
    n1 = sum(src_hist.values())
    n2 = sum(corpus_hist.values())
    f1 = float(n1)
    f2 = float(n2)
    j = 0.0
    for tok in sorted(corpus_hist):
        p = float(src_hist.get(tok, 0)) / f1
        q = float(corpus_hist[tok]) / f2
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
        from .queries_wave247 import _src_token_hist

        h = _src_token_hist(sf_dir)
        corpus = {}
        per_src = {}
        for src, tok, cnt in zip(h["source"],
                                 h["token"].astype(int),
                                 h["cnt"].astype(int)):
            corpus[int(tok)] = corpus.get(int(tok), 0) + int(cnt)
            per_src.setdefault(src, {})[int(tok)] = int(cnt)
        out = {"source": [], "jsd": []}
        for src in sorted(per_src):
            out["source"].append(src)
            out["jsd"].append(jsd_to_corpus(per_src[src], corpus))
        return pa.table({
            "source": pa.array(out["source"], type=pa.string()),
            "jsd_to_corpus": pa.array(out["jsd"],
                                      type=pa.float64()),
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
