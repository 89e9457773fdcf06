"""Wave-107 queries: line structure and line-number revenue.

- doc_line_stats: newline-delimited line structure per doc (n_lines,
  mean and max line length in tokens) — the text-layout profile
  (code/tables vs prose). All integer; lines are the segments
  between newline tokens (codepoint 10), with the trailing segment
  counted.
- lineitem_position_revenue: average revenue by line number within
  the order (do first lines carry bigger items?) — bounded
  l_linenumber cells, exact integer cents x bp, one division per
  cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

NL = 10


# ---------------------------------------------------------------- doc_line_stats
def _line_stats_query():
    def q(sf_dir: str):
        def lines(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_lines": pa.array([], type=pa.int64()),
                "mean_len": pa.array([], type=pa.float64()),
                "max_len": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            ids = t.column("doc_id").to_pylist()
            out_n, out_m, out_x = [], [], []
            for di in range(len(ids)):
                seg = flat[offs[di]: offs[di + 1]]
                if seg.size == 0:
                    out_n.append(0)
                    out_m.append(0.0)
                    out_x.append(0)
                    continue
                nl_pos = np.flatnonzero(seg == NL)
                bounds = np.r_[np.int64(-1), nl_pos,
                               np.int64(seg.size)]
                ll = np.diff(bounds) - 1
                # the final sentinel segment only exists if the doc
                # does not end with a newline; if it does, the last
                # diff is 0-length and still counts as a line per
                # the "segments between newlines" definition
                n_lines = ll.size
                out_n.append(int(n_lines))
                out_m.append(float(int(ll.sum()))
                             / float(n_lines))
                out_x.append(int(ll.max()))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_lines": pa.array(out_n, type=pa.int64()),
                "mean_len": pa.array(out_m, type=pa.float64()),
                "max_len": pa.array(out_x, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            lines, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_lines": pa.int64(),
            "mean_len": pa.float64(),
            "max_len": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    marks AS (
        SELECT doc_id, pos,
               CAST(sum(CASE WHEN token = {NL} THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS line_id,
               token
        FROM tok
    ),
    ll AS (
        SELECT doc_id, line_id,
               CAST(sum(CASE WHEN token = {NL} THEN 0 ELSE 1 END)
                    AS BIGINT) AS len
        FROM marks GROUP BY doc_id, line_id
    ),
    tl AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS ntok,
               CAST(sum(CASE WHEN token = {NL} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nl,
               CAST(max(CASE WHEN pos = 0 THEN 1 END) AS BIGINT)
                   AS one
        FROM tok GROUP BY doc_id
    ),
    agg AS (
        SELECT ll.doc_id,
               CAST(tl.n_nl + 1 AS BIGINT) AS n_lines,
               CAST(tl.ntok - tl.n_nl AS DOUBLE)
                   / CAST(tl.n_nl + 1 AS DOUBLE) AS mean_len,
               CAST(max(ll.len) AS BIGINT) AS max_len
        FROM ll JOIN tl ON tl.doc_id = ll.doc_id
        GROUP BY ll.doc_id, tl.n_nl, tl.ntok
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(agg.n_lines, 0) AS n_lines,
           COALESCE(agg.mean_len, 0.0e0) AS mean_len,
           COALESCE(agg.max_len, 0) AS max_len
    FROM documents d LEFT JOIN agg
      ON agg.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# ------------------------------------------------- lineitem_position_revenue
def _position_revenue_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if ("l_linenumber" not in t.column_names
                    or t.num_rows == 0):
                return pa.table({
                    "linenumber": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                })
            ln = t.column("l_linenumber").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False) * 10000.0
            ).astype(np.int64)
            rev = cents * (10000 - bp)
            uk, inv = np.unique(ln, return_inverse=True)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, rev)
            return pa.table({
                "linenumber": pa.array(uk),
                "n": pa.array(np.bincount(
                    inv, minlength=uk.size).astype(np.int64)),
                "rev": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("linenumber").aggregate(
                [("n", "sum"), ("rev", "sum")])
            return pa.table({
                "linenumber": g.column("linenumber").cast(
                    pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_linenumber", "l_extendedprice",
                         "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("linenumber").reset_index(drop=True)
        return pa.table({
            "linenumber": pa.array(
                a["linenumber"].to_numpy(np.int64)),
            "n": pa.array(a["n"].to_numpy(np.int64)),
            "avg_rev_units": pa.array(
                a["rev"].to_numpy(np.int64).astype(np.float64)
                / a["n"].to_numpy(np.int64).astype(np.float64),
                type=pa.float64()),
        })

    sql = """
    SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l_discount * 10000,
                                               0) AS BIGINT)))
                AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS avg_rev_units
    FROM lineitem GROUP BY l_linenumber
    """
    return q, sql


def build_wave107_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_line_stats",) + _line_stats_query()))
    add(*(("lineitem_position_revenue",)
          + _position_revenue_query()))
    return queries, oracles
