"""Wave-80 queries: token keyness and discount elasticity.

- source_token_keyness: corpus-linguistics keyness — for each
  source, the top-5 tokens by |log-odds ratio| against the rest of
  the corpus, with the Haldane-Anscombe 0.5 correction: LOR =
  ln((a+0.5)(d+0.5)) - ln((b+0.5)(c+0.5)) with a = in-source count,
  b = rest count, c/d the complements. All four cells are exact
  int64 from the bounded (source x alphabet) histogram; one scalar
  log subtraction per cell; top-5 selection tie-breaks (|LOR| desc,
  token asc) identically on both sides.
- lineitem_discount_elasticity: OLS of ln(quantity) on the discount
  rate — the demand-elasticity regression — folded over the BOUNDED
  (qty, discount-bp) contingency cells (qty has 50 levels, discount
  11), so the float moment sums are (cell, cell)-ordered folds of
  count-weighted scalar-log terms, never a row-order-dependent sum
  over the unbounded fact table.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

KEY_TOPK = 5


# -------------------------------------------------------- source_token_keyness
def _keyness_query(topk: int = KEY_TOPK):
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
        tok_tot = h.groupby("token")["cnt"].sum()
        src_tot = h.groupby("source")["cnt"].sum()
        grand = int(h["cnt"].sum())
        out = {"source": [], "token": [], "a": [],
               "log_odds": []}
        for src, grp in h.groupby("source", sort=True):
            ns = int(src_tot[src])
            cands = []
            for r in grp.itertuples():
                a = int(r.cnt)
                b = int(tok_tot[r.token]) - a
                c = ns - a
                d = grand - ns - b
                lor = (math.log((float(a) + 0.5)
                                * (float(d) + 0.5))
                       - math.log((float(b) + 0.5)
                                  * (float(c) + 0.5)))
                cands.append((abs(lor), -int(r.token), lor, a,
                              int(r.token)))
            cands.sort(reverse=True)
            for _al, _nt, lor, a, tok in cands[:topk]:
                out["source"].append(src)
                out["token"].append(tok)
                out["a"].append(a)
                out["log_odds"].append(lor)
        return pa.table({
            "source": pa.array(out["source"], type=pa.string()),
            "token": pa.array(out["token"], type=pa.int64()),
            "in_cnt": pa.array(out["a"], type=pa.int64()),
            "log_odds": pa.array(out["log_odds"],
                                 type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    tt AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS t
           FROM c GROUP BY token),
    st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS s
           FROM c GROUP BY source),
    g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
    lor AS (
        SELECT c.source, c.token, c.cnt AS a,
               ln((CAST(c.cnt AS DOUBLE) + 0.5e0)
                  * (CAST(g.n - st.s - (tt.t - c.cnt) AS DOUBLE)
                     + 0.5e0))
               - ln((CAST(tt.t - c.cnt AS DOUBLE) + 0.5e0)
                    * (CAST(st.s - c.cnt AS DOUBLE) + 0.5e0))
                   AS lo
        FROM c
        JOIN tt ON tt.token = c.token
        JOIN st ON st.source = c.source
        CROSS JOIN g
    )
    SELECT source, CAST(token AS BIGINT) AS token,
           a AS in_cnt, lo AS log_odds
    FROM (
        SELECT source, token, a, lo,
               row_number() OVER (PARTITION BY source
                                  ORDER BY abs(lo) DESC,
                                           token ASC) AS rn
        FROM lor)
    WHERE rn <= {topk}
    """
    return q, sql


# ---------------------------------------------- lineitem_discount_elasticity
def _elasticity_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "l_quantity" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "qty": pa.array([], type=pa.int64()),
                    "bp": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            qty = np.round(
                t.column("l_quantity").to_numpy(
                    zero_copy_only=False)).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False) * 10000.0
            ).astype(np.int64)
            keys = qty * 100000 + bp
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "qty": pa.array(uk // 100000),
                "bp": pa.array(uk % 100000),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["qty", "bp"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "qty": g.column("qty").cast(pa.int64()),
                "bp": g.column("bp").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["qty", "bp"]).reset_index(drop=True)
        # (qty, bp)-ordered fold of count-weighted moment terms
        n = sx = sy = sxx = sxy = 0.0
        for r in a.itertuples():
            cf = float(int(r.cnt))
            x = float(int(r.bp)) / 10000.0
            y = math.log(float(int(r.qty)))
            n = n + cf
            sx = sx + cf * x
            sy = sy + cf * y
            sxx = sxx + cf * (x * x)
            sxy = sxy + cf * (x * y)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        return pa.table({
            "n_items": pa.array([int(n)], type=pa.int64()),
            "elasticity": pa.array([slope], type=pa.float64()),
            "intercept": pa.array([intercept],
                                  type=pa.float64()),
        })

    sql = """
    WITH cell AS (
        SELECT CAST(round_even(l_quantity, 0) AS BIGINT) AS qty,
               CAST(round_even(l_discount * 10000, 0) AS BIGINT)
                   AS bp,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY qty, bp
    ),
    f AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([CAST(cnt AS DOUBLE),
                      CAST(bp AS DOUBLE) / 10000.0e0,
                      ln(CAST(qty AS DOUBLE))]
                     ORDER BY qty, bp)),
            (acc, e) -> [
                acc[1] + e[1],
                acc[2] + e[1] * e[2],
                acc[3] + e[1] * e[3],
                acc[4] + e[1] * (e[2] * e[2]),
                acc[5] + e[1] * (e[2] * e[3])]) AS m
        FROM cell
    )
    SELECT CAST(m[1] AS BIGINT) AS n_items,
           (m[1] * m[5] - m[2] * m[3])
               / (m[1] * m[4] - m[2] * m[2]) AS elasticity,
           (m[3] - (m[1] * m[5] - m[2] * m[3])
                   / (m[1] * m[4] - m[2] * m[2]) * m[2]) / m[1]
               AS intercept
    FROM f
    """
    return q, sql


def build_wave80_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_token_keyness",) + _keyness_query()))
    add(*(("lineitem_discount_elasticity",) + _elasticity_query()))
    return queries, oracles
