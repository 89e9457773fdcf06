"""Wave-78 queries: running revenue totals, token-gap Fano factor,
and Renyi-2 collision entropy.

- orders_cum_revenue: cumulative month-over-month revenue per market
  segment (the finance running-total window): bounded (segment,
  month) integer cent cells tree-reduce; the running sum is an
  integer prefix (order-free on both sides — DuckDB windowed SUM
  over BIGINT is exact).
- doc_space_gap_fano: Fano factor (variance-to-mean) of the gaps
  between space tokens per doc — token-level burstiness (the
  word-length clumping signal): gap lengths are integers, so n/s/ss
  are exact and the dispersion is the one float expression
  (n*ss - s*s) / (s * (n-1)).
- source_renyi2: Renyi collision entropy H2 = -ln(sum c_i^2 / n^2)
  per source — the diversity number behind dedup collision rates:
  sum of squared counts is a pure int64 (bounded alphabet histogram
  tree-reduce); ONE scalar log at the end.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

SPACE = 32


# --------------------------------------------------------- orders_cum_revenue
def _cum_revenue_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if ("o_orderdate" not in t.column_names
                    or t.num_rows == 0):
                return pa.table({
                    "segment": pa.array([], type=pa.string()),
                    "month": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                })
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            seg = np.asarray(
                t.column("o_orderpriority").to_pylist())
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            key = np.char.add(np.char.add(
                seg, "|"), month.astype(str))
            uk, inv = np.unique(key, return_inverse=True)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, cents)
            parts = np.char.partition(uk, "|")
            return pa.table({
                "segment": pa.array(list(parts[:, 0]),
                                    type=pa.string()),
                "month": pa.array(parts[:, 2].astype(np.int64)),
                "cents": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["segment", "month"]).aggregate(
                [("cents", "sum")])
            return pa.table({
                "segment": g.column("segment"),
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                         "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["segment", "month"]).reset_index(
            drop=True)
        a["cum_cents"] = a.groupby("segment")["cents"].cumsum()
        # month index relative to the global min month
        m0 = int(a["month"].min())
        return pa.table({
            "segment": pa.array(a["segment"], type=pa.string()),
            "month_idx": pa.array(
                a["month"].to_numpy(np.int64) - m0),
            "cents": pa.array(a["cents"].to_numpy(np.int64)),
            "cum_cents": pa.array(
                a["cum_cents"].to_numpy(np.int64)),
        })

    sql = """
    WITH m AS (
        SELECT o_orderpriority AS segment,
               date_trunc('month', o_orderdate) AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY segment, month
    ),
    g AS (
        SELECT segment, month, cents,
               CAST(sum(cents) OVER (PARTITION BY segment
                                     ORDER BY month
                                     ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_cents,
               datediff('month', (SELECT min(month) FROM m),
                        month) AS month_idx
        FROM m
    )
    SELECT segment, CAST(month_idx AS BIGINT) AS month_idx,
           cents, cum_cents
    FROM g
    """
    return q, sql


# -------------------------------------------------------- doc_space_gap_fano
def _space_fano_query(target: int = SPACE):
    def q(sf_dir: str):
        def fano(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_gaps": pa.array([], type=pa.int64()),
                "sum_gap": pa.array([], type=pa.int64()),
                "fano": pa.array([], type=pa.float64()),
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
            nd = len(ids)
            tot = int(lens.sum())
            if tot == 0:
                return empty
            g = np.repeat(np.arange(nd), lens)
            is_sp = flat == target
            sp_doc = g[is_sp]
            sp_pos = np.flatnonzero(is_sp)
            same = np.r_[False, sp_doc[1:] == sp_doc[:-1]]
            gaps = np.r_[np.int64(0), np.diff(sp_pos)][same]
            gd = sp_doc[same]
            n = np.bincount(gd, minlength=nd).astype(np.int64)
            s = np.bincount(gd, weights=gaps,
                            minlength=nd).astype(np.int64)
            ss = np.bincount(gd, weights=gaps * gaps,
                             minlength=nd).astype(np.int64)
            fo = np.zeros(nd, dtype=np.float64)
            ok = (n >= 2) & (s > 0)
            nf = n.astype(np.float64)
            fo[ok] = ((nf[ok] * ss[ok].astype(np.float64)
                       - s[ok].astype(np.float64)
                       * s[ok].astype(np.float64))
                      / (s[ok].astype(np.float64)
                         * (nf[ok] - 1.0)))
            keep = n >= 2
            return pa.table({
                "doc_id": pa.array(
                    [d for d, k in zip(ids, keep) if k],
                    type=pa.string()),
                "n_gaps": pa.array(n[keep]),
                "sum_gap": pa.array(s[keep]),
                "fano": pa.array(fo[keep], type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            fano, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_gaps": pa.int64(),
            "sum_gap": pa.int64(),
            "fano": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    sp AS (
        SELECT doc_id, pos,
               pos - lag(pos) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS gap
        FROM tok WHERE token = {target}
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(gap) AS BIGINT) AS n,
               CAST(sum(gap) AS BIGINT) AS s,
               CAST(sum(gap * gap) AS BIGINT) AS ss
        FROM sp GROUP BY doc_id HAVING count(gap) >= 2
    )
    SELECT doc_id, n AS n_gaps, s AS sum_gap,
           CASE WHEN s > 0
                THEN (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(s AS DOUBLE)
                        * (CAST(n AS DOUBLE) - 1.0e0))
                ELSE 0.0e0 END AS fano
    FROM agg
    """
    return q, sql


# --------------------------------------------------------------- source_renyi2
def _renyi2_query():
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
            n = int(c.sum())
            c2 = int((c * c).sum())
            h2 = -(math.log(float(c2)) - math.log(
                float(n) * float(n)))
            rows.append((src, n, c2, h2))
        return pa.table({
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "n_tok": pa.array([r[1] for r in rows],
                              type=pa.int64()),
            "collision_num": pa.array([r[2] for r in rows],
                                      type=pa.int64()),
            "renyi2": pa.array([r[3] for r in rows],
                               type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tok,
           CAST(sum(cnt * cnt) AS BIGINT) AS collision_num,
           -(ln(CAST(sum(cnt * cnt) AS DOUBLE))
             - ln(CAST(sum(cnt) AS DOUBLE)
                  * CAST(sum(cnt) AS DOUBLE))) AS renyi2
    FROM c GROUP BY source
    """
    return q, sql


def build_wave78_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_cum_revenue",) + _cum_revenue_query()))
    add(*(("doc_space_gap_fano",) + _space_fano_query()))
    add(*(("source_renyi2",) + _renyi2_query()))
    return queries, oracles
