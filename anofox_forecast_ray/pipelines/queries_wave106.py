"""Wave-106 queries: lexical cohesion and Zipf goodness of fit.

- doc_repeat_distance: mean positional distance between successive
  occurrences of the SAME token within a doc (lexical cohesion /
  vocabulary recycling rate: low = tight repetition). Distances are
  exact int64 (lag over (doc, token) position order); one division.
- corpus_zipf_gof: chi-squared goodness of fit of the top-16 token
  frequencies against the fitted Zipf law f(r) = C / r^s with s =
  the corpus zipf slope re-fitted here (ln-ln Cramer over the top-16
  ranks, rank-ordered folds) and C chosen so the fitted masses sum
  to the observed top-16 total. pow/ln are shared libm; counts are
  exact ints; ranks tie-break by token ascending on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds

ZIPF_TOPK = 16


# -------------------------------------------------------- doc_repeat_distance
def _repeat_distance_query():
    def q(sf_dir: str):
        def rep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_repeats": pa.array([], type=pa.int64()),
                "mean_dist": pa.array([], type=pa.float64()),
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
            if flat.size == 0:
                z = np.zeros(nd, dtype=np.int64)
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_repeats": pa.array(z),
                    "mean_dist": pa.array(
                        np.zeros(nd), type=pa.float64()),
                })
            g = np.repeat(np.arange(nd), lens)
            pos = (np.arange(int(lens.sum()))
                   - np.repeat(np.cumsum(lens) - lens, lens))
            order = np.lexsort((pos, flat, g))
            gs = g[order]
            ts_ = flat[order]
            ps = pos[order]
            same = np.r_[False, (gs[1:] == gs[:-1])
                         & (ts_[1:] == ts_[:-1])]
            dist = np.r_[np.int64(0), ps[1:] - ps[:-1]]
            dist[~same] = 0
            n_rep = np.bincount(
                gs, weights=same, minlength=nd).astype(np.int64)
            s_d = np.bincount(
                gs, weights=dist, minlength=nd).astype(np.int64)
            mean = np.where(
                n_rep > 0,
                s_d.astype(np.float64)
                / np.maximum(n_rep, 1).astype(np.float64), 0.0)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_repeats": pa.array(n_rep),
                "mean_dist": pa.array(mean, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            rep, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_repeats": pa.int64(),
            "mean_dist": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id,
               pos - lag(pos) OVER (PARTITION BY doc_id, token
                                    ORDER BY pos) AS dist
        FROM tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(dist) AS BIGINT) AS n_repeats,
               CAST(COALESCE(sum(dist), 0) AS BIGINT) AS s
        FROM d GROUP BY doc_id
    )
    SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id,
           COALESCE(agg.n_repeats, 0) AS n_repeats,
           CASE WHEN COALESCE(agg.n_repeats, 0) > 0
                THEN CAST(agg.s AS DOUBLE)
                     / CAST(agg.n_repeats AS DOUBLE)
                ELSE 0.0e0 END AS mean_dist
    FROM documents doc LEFT JOIN agg
      ON agg.doc_id = CAST(doc.doc_id AS VARCHAR)
    """
    return q, sql


# ------------------------------------------------------------- corpus_zipf_gof
def _zipf_gof_query(topk: int = ZIPF_TOPK):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "tokens" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "token": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            values, _l = _flat_tokens(t)
            uk, cnt = np.unique(
                values.astype(np.int64), return_counts=True)
            return pa.table({
                "token": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("token").aggregate([("cnt", "sum")])
            return pa.table({
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values(["cnt", "token"],
                          ascending=[False, True]).head(topk)
        cnts = [int(v) for v in h["cnt"]]
        k = len(cnts)
        # ln-ln OLS of ln cnt on ln rank (ranks 1..k)
        n = sx = sy = sxx = sxy = 0.0
        for r, c in enumerate(cnts, 1):
            x = math.log(float(r))
            y = math.log(float(c))
            n = n + 1.0
            sx = sx + x
            sy = sy + y
            sxx = sxx + x * x
            sxy = sxy + x * y
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        # expected masses, normalized to the observed top-k total
        total = float(sum(cnts))
        raw = [math.exp(intercept
                        + slope * math.log(float(r)))
               for r in range(1, k + 1)]
        raw_sum = 0.0
        for v in raw:
            raw_sum = raw_sum + v
        chi2 = 0.0
        for c, v in zip(cnts, raw):
            e = v * (total / raw_sum)
            chi2 = chi2 + (float(c) - e) * (float(c) - e) / e
        return pa.table({
            "k": pa.array([k], type=pa.int64()),
            "zipf_slope": pa.array([slope], type=pa.float64()),
            "chi2": pa.array([chi2], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY token
    ),
    top AS (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token ASC)
                   AS r
        FROM c
        ORDER BY cnt DESC, token ASC LIMIT {topk}
    ),
    fit AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([ln(CAST(r AS DOUBLE)),
                      ln(CAST(cnt AS DOUBLE))] ORDER BY r)),
            (acc, e) -> [
                acc[1] + 1.0e0,
                acc[2] + e[1],
                acc[3] + e[2],
                acc[4] + e[1] * e[1],
                acc[5] + e[1] * e[2]]) AS v,
            CAST(sum(cnt) AS DOUBLE) AS total
        FROM top
    ),
    params AS (
        SELECT (v[1] * v[5] - v[2] * v[3])
                   / (v[1] * v[4] - v[2] * v[2]) AS slope,
               (v[3] - (v[1] * v[5] - v[2] * v[3])
                       / (v[1] * v[4] - v[2] * v[2]) * v[2])
                   / v[1] AS intercept,
               total, CAST(v[1] AS BIGINT) AS k
        FROM fit
    ),
    raws AS (
        SELECT p.k, p.slope, p.total,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(exp(p.intercept + p.slope
                                    * ln(CAST(r AS DOUBLE)))
                           ORDER BY r) FROM top)),
                   (a, b) -> a + b) AS raw_sum,
               p.intercept
        FROM params p
    )
    SELECT raws.k, raws.slope AS zipf_slope,
           list_reduce(list_prepend(0.0e0,
               (SELECT list(
                   (CAST(t.cnt AS DOUBLE)
                    - exp(raws.intercept + raws.slope
                          * ln(CAST(t.r AS DOUBLE)))
                      * (raws.total / raws.raw_sum))
                   * (CAST(t.cnt AS DOUBLE)
                      - exp(raws.intercept + raws.slope
                            * ln(CAST(t.r AS DOUBLE)))
                        * (raws.total / raws.raw_sum))
                   / (exp(raws.intercept + raws.slope
                          * ln(CAST(t.r AS DOUBLE)))
                      * (raws.total / raws.raw_sum))
                   ORDER BY t.r) FROM top t)),
               (a, b) -> a + b) AS chi2
    FROM raws
    """
    return q, sql


def build_wave106_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_repeat_distance",) + _repeat_distance_query()))
    add(*(("corpus_zipf_gof",) + _zipf_gof_query()))
    return queries, oracles
