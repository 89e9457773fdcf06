"""Wave-104 query: document boundary-token statistics.

- corpus_boundary_entropy: entropies of the FIRST-token and
  LAST-token distributions across docs, plus the JSD between them —
  the document-boundary signal (templated corpora open/close with
  low-entropy boilerplate; symmetric distributions mean no
  open/close asymmetry). Bounded alphabet histograms; token-ordered
  scalar-log folds on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


def _boundary_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "token": pa.array([], type=pa.int64()),
                "first_cnt": pa.array([], type=pa.int64()),
                "last_cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            lens = np.asarray(lengths, dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                return empty
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            firsts = values.astype(np.int64)[starts[keep]]
            ends = np.cumsum(lens) - 1
            lasts = values.astype(np.int64)[ends[keep]]
            uk = np.unique(np.r_[firsts, lasts])
            fc = np.zeros(uk.size, dtype=np.int64)
            lc = np.zeros(uk.size, dtype=np.int64)
            np.add.at(fc, np.searchsorted(uk, firsts), 1)
            np.add.at(lc, np.searchsorted(uk, lasts), 1)
            return pa.table({
                "token": pa.array(uk),
                "first_cnt": pa.array(fc),
                "last_cnt": pa.array(lc),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate(
                [("first_cnt", "sum"), ("last_cnt", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "first_cnt": g.column("first_cnt_sum").cast(
                    pa.int64()),
                "last_cnt": g.column("last_cnt_sum").cast(
                    pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("token").reset_index(drop=True)
        nf = float(int(h["first_cnt"].sum()))
        nl = float(int(h["last_cnt"].sum()))
        hf = hl = jsd = 0.0
        for r in h.itertuples():  # ascending token fold
            p = float(int(r.first_cnt)) / nf
            qq = float(int(r.last_cnt)) / nl
            if p > 0:
                hf = hf - p * math.log(p)
            if qq > 0:
                hl = hl - qq * math.log(qq)
            mm = 0.5 * (p + qq)
            term = 0.0
            if p > 0:
                term = term + 0.5 * (p * math.log(p / mm))
            if qq > 0:
                term = term + 0.5 * (qq * math.log(qq / mm))
            jsd = jsd + term
        return pa.table({
            "n_docs": pa.array([int(nf)], type=pa.int64()),
            "first_entropy": pa.array([hf], type=pa.float64()),
            "last_entropy": pa.array([hl], type=pa.float64()),
            "boundary_jsd": pa.array([jsd], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id HAVING count(*) > 0
    ),
    fl AS (
        SELECT t.token,
               CAST(sum(CASE WHEN t.pos = 0
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS first_cnt,
               CAST(sum(CASE WHEN t.pos = tl.n - 1
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS last_cnt
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
        WHERE t.pos = 0 OR t.pos = tl.n - 1
        GROUP BY t.token
    ),
    nn AS (
        SELECT CAST(sum(first_cnt) AS DOUBLE) AS nf,
               CAST(sum(last_cnt) AS DOUBLE) AS nl
        FROM fl
    ),
    terms AS (
        SELECT fl.token,
               CASE WHEN fl.first_cnt > 0
                    THEN -(CAST(fl.first_cnt AS DOUBLE) / nn.nf)
                         * ln(CAST(fl.first_cnt AS DOUBLE)
                              / nn.nf)
                    ELSE 0.0e0 END AS hf_term,
               CASE WHEN fl.last_cnt > 0
                    THEN -(CAST(fl.last_cnt AS DOUBLE) / nn.nl)
                         * ln(CAST(fl.last_cnt AS DOUBLE)
                              / nn.nl)
                    ELSE 0.0e0 END AS hl_term,
               (CASE WHEN fl.first_cnt > 0
                     THEN 0.5e0
                          * ((CAST(fl.first_cnt AS DOUBLE)
                              / nn.nf)
                          * ln((CAST(fl.first_cnt AS DOUBLE)
                                / nn.nf)
                               / (0.5e0
                                  * (CAST(fl.first_cnt AS DOUBLE)
                                     / nn.nf
                                     + CAST(fl.last_cnt
                                            AS DOUBLE)
                                       / nn.nl))))
                     ELSE 0.0e0 END)
               + (CASE WHEN fl.last_cnt > 0
                     THEN 0.5e0
                          * ((CAST(fl.last_cnt AS DOUBLE)
                              / nn.nl)
                          * ln((CAST(fl.last_cnt AS DOUBLE)
                                / nn.nl)
                               / (0.5e0
                                  * (CAST(fl.first_cnt AS DOUBLE)
                                     / nn.nf
                                     + CAST(fl.last_cnt
                                            AS DOUBLE)
                                       / nn.nl))))
                     ELSE 0.0e0 END) AS jsd_term
        FROM fl CROSS JOIN nn
    )
    SELECT CAST((SELECT nf FROM nn) AS BIGINT) AS n_docs,
           list_reduce(list_prepend(0.0e0,
               list(hf_term ORDER BY token)), (a, b) -> a + b)
               AS first_entropy,
           list_reduce(list_prepend(0.0e0,
               list(hl_term ORDER BY token)), (a, b) -> a + b)
               AS last_entropy,
           list_reduce(list_prepend(0.0e0,
               list(jsd_term ORDER BY token)), (a, b) -> a + b)
               AS boundary_jsd
    FROM terms
    """
    return q, sql


def build_wave104_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_boundary_entropy",) + _boundary_query()))
    return queries, oracles
