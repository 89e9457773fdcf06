"""Wave-98 query: ingestion-order stability KS.

- corpus_length_ks_halves: two-sample KS distance between the doc-
  length distributions of the first and second half of the corpus in
  doc_id order — the generator/ingestion drift check (companion of
  corpus_length_drift_r1's lag-1 view). The sup statistic stays in
  cross-multiplied integers (|cum1*n2 - cum2*n1| over the bounded
  length histogram), one final division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


def _ks_halves_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc": pa.array([], type=pa.int64()),
                "y": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _v, lengths = _flat_tokens(t)
            return pa.table({
                "doc": pa.array(
                    [int(d)
                     for d in t.column("doc_id").to_pylist()],
                    type=pa.int64()),
                "y": pa.array(np.asarray(lengths,
                                         dtype=np.int64)),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(
            refs, lambda t: t).to_pandas().drop_duplicates("doc")
        a = a.sort_values("doc").reset_index(drop=True)
        n = len(a)
        half = n // 2
        y1 = np.sort(a["y"].to_numpy(np.int64)[:half])
        y2 = np.sort(a["y"].to_numpy(np.int64)[half:])
        n1, n2 = y1.size, y2.size
        vals = np.unique(np.r_[y1, y2])
        c1 = np.searchsorted(y1, vals, side="right")
        c2 = np.searchsorted(y2, vals, side="right")
        num = np.abs(c1 * n2 - c2 * n1)
        sup = int(num.max())
        d = float(sup) / (float(n1) * float(n2))
        return pa.table({
            "n1": pa.array([n1], type=pa.int64()),
            "n2": pa.array([n2], type=pa.int64()),
            "sup_num": pa.array([sup], type=pa.int64()),
            "d_stat": pa.array([d], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    lab AS (
        SELECT y,
               CASE WHEN row_number() OVER (ORDER BY doc)
                         <= (SELECT count(*) // 2 FROM len)
                    THEN 1 ELSE 2 END AS half
        FROM len
    ),
    nn AS (
        SELECT CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2
        FROM lab
    ),
    vals AS (SELECT DISTINCT y FROM lab),
    cums AS (
        SELECT v.y,
               CAST((SELECT count(*) FROM lab
                     WHERE half = 1 AND lab.y <= v.y)
                    AS BIGINT) AS c1,
               CAST((SELECT count(*) FROM lab
                     WHERE half = 2 AND lab.y <= v.y)
                    AS BIGINT) AS c2
        FROM vals v
    )
    SELECT nn.n1, nn.n2,
           CAST((SELECT max(abs(c1 * nn.n2 - c2 * nn.n1))
                 FROM cums) AS BIGINT) AS sup_num,
           CAST((SELECT max(abs(c1 * nn.n2 - c2 * nn.n1))
                 FROM cums) AS DOUBLE)
               / (CAST(nn.n1 AS DOUBLE)
                  * CAST(nn.n2 AS DOUBLE)) AS d_stat
    FROM nn
    """
    return q, sql


def build_wave98_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_length_ks_halves",) + _ks_halves_query()))
    return queries, oracles
