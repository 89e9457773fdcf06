"""Wave-89 queries: recurrence quantification and AOV trend.

- doc_rqa_w8: recurrence quantification over the w8 window-sum
  series (nonlinear-dynamics screen; Webber & Zbilut): recurrence
  rate RR = #{i<j : |s_i - s_j| <= eps} / C(m,2) with eps = width
  (integer threshold on integer sums — pure int comparisons via the
  wave-59 pair expansion), and a determinism-lite DET1 = fraction of
  recurrent (i, j) pairs whose diagonal successor (i+1, j+1) is also
  recurrent — structure vs isolated recurrences.
- orders_aov_trend: average order value per month plus the OLS
  slope of AOV against the month index — bounded month cells;
  the per-month AOV is one division of exact cents, and the trend
  folds (month-ordered) over ~80 cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

RQA_EPS = 8


# ---------------------------------------------------------------- doc_rqa_w8
def _rqa_query(width: int = 8, eps: int = RQA_EPS):
    def q(sf_dir: str):
        def rqa(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "n_rec": pa.array([], type=pa.int64()),
                "rr": pa.array([], type=pa.float64()),
                "det1": pa.array([], type=pa.float64()),
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
            kt = lens > 0
            if not kt.any():
                return empty
            starts_a = offs[:-1][kt]
            ends_a = offs[1:][kt]
            nw_a = (ends_a - starts_a + width - 1) // width
            tot_a = int(nw_a.sum())
            grp_a = np.repeat(np.arange(int(kt.sum())), nw_a)
            wid_a = (np.arange(tot_a)
                     - np.repeat(np.cumsum(nw_a) - nw_a, nw_a))
            ws_a = np.add.reduceat(
                flat, starts_a[grp_a] + wid_a * width)
            dkeep = nw_a >= 3
            if not dkeep.any():
                return empty
            ids_all = [d for d, k in zip(
                t.column("doc_id").to_pylist(), kt) if k]
            ids = [d for d, k in zip(ids_all, dkeep) if k]
            nw = nw_a[dkeep]
            newidx = np.cumsum(dkeep) - 1
            rkeep = dkeep[grp_a]
            grp = newidx[grp_a[rkeep]]
            ws = ws_a[rkeep]
            nd = len(ids)
            bounds = np.cumsum(nw) - nw
            sq = nw * nw
            tot2 = int(sq.sum())
            g2 = np.repeat(np.arange(nd), sq)
            within = (np.arange(tot2)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = nw[g2]
            ii = within // c
            jj = within % c
            mask = ii < jj
            g2m = g2[mask]
            iim = ii[mask]
            jjm = jj[mask]
            si = ws[bounds[g2m] + iim]
            sj = ws[bounds[g2m] + jjm]
            rec = np.abs(si - sj) <= eps
            n_rec = np.bincount(
                g2m, weights=rec, minlength=nd).astype(np.int64)
            npair = (nw * (nw - 1) // 2).astype(np.int64)
            rr = (n_rec.astype(np.float64)
                  / npair.astype(np.float64))
            # DET1: recurrent pairs with both successors in range
            # whose (i+1, j+1) pair is also recurrent
            succ_ok = (rec & (jjm + 1 < nw[g2m]))
            si1 = np.where(succ_ok,
                           ws[np.minimum(bounds[g2m] + iim + 1,
                                         ws.size - 1)], 0)
            sj1 = np.where(succ_ok,
                           ws[np.minimum(bounds[g2m] + jjm + 1,
                                         ws.size - 1)], 0)
            rec1 = succ_ok & (np.abs(si1 - sj1) <= eps)
            n_det = np.bincount(
                g2m, weights=rec1, minlength=nd).astype(np.int64)
            det1 = np.where(
                n_rec > 0,
                n_det.astype(np.float64)
                / np.maximum(n_rec, 1).astype(np.float64),
                0.0)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw, type=pa.int64()),
                "n_rec": pa.array(n_rec),
                "rr": pa.array(rr, type=pa.float64()),
                "det1": pa.array(det1, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            rqa, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "n_rec": pa.int64(),
            "rr": pa.float64(),
            "det1": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    mm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM w GROUP BY doc_id HAVING count(*) >= 3
    ),
    pairs AS (
        SELECT a.doc_id, a.wid AS i, b.wid AS j,
               (abs(a.s - b.s) <= {eps}) AS rec
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.wid < b.wid
    ),
    det AS (
        SELECT p.doc_id,
               CAST(sum(CASE WHEN p.rec THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rec,
               CAST(sum(CASE WHEN p.rec AND q.rec
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_det
        FROM pairs p
        LEFT JOIN pairs q ON q.doc_id = p.doc_id
                         AND q.i = p.i + 1 AND q.j = p.j + 1
        GROUP BY p.doc_id
    )
    SELECT mm.doc_id, mm.m,
           det.n_rec,
           CAST(det.n_rec AS DOUBLE)
               / CAST(mm.m * (mm.m - 1) // 2 AS DOUBLE) AS rr,
           CASE WHEN det.n_rec > 0
                THEN CAST(det.n_det AS DOUBLE)
                     / CAST(det.n_rec AS DOUBLE)
                ELSE 0.0e0 END AS det1
    FROM mm JOIN det ON det.doc_id = mm.doc_id
    """
    return q, sql


# --------------------------------------------------------------- orders_aov_trend
def _aov_trend_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if ("o_orderdate" not in t.column_names
                    or t.num_rows == 0):
                return pa.table({
                    "month": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                })
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, cents)
            return pa.table({
                "month": pa.array(uk),
                "n": pa.array(np.bincount(
                    inv, minlength=uk.size).astype(np.int64)),
                "cents": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("n", "sum"), ("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("month").reset_index(drop=True)
        m0 = int(a["month"].min())
        # month-ordered fold of OLS moments over AOV values
        n = sx = sy = sxx = sxy = 0.0
        for r in a.itertuples():
            x = float(int(r.month) - m0)
            y = float(int(r.cents)) / float(int(r.n))
            n = n + 1.0
            sx = sx + x
            sy = sy + y
            sxx = sxx + x * x
            sxy = sxy + x * y
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({
            "n_months": pa.array([int(n)], type=pa.int64()),
            "aov_slope_cents": pa.array([slope],
                                        type=pa.float64()),
            "aov_intercept_cents": pa.array([intercept],
                                            type=pa.float64()),
        })

    sql = """
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY month
    ),
    pts AS (
        SELECT CAST(datediff('month',
                    (SELECT min(month) FROM m), month)
                    AS DOUBLE) AS x,
               CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS y,
               month
        FROM m
    ),
    f AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([x, y] ORDER BY month)),
            (acc, e) -> [
                acc[1] + 1.0e0,
                acc[2] + e[1],
                acc[3] + e[2],
                acc[4] + e[1] * e[1],
                acc[5] + e[1] * e[2]]) AS v
        FROM pts
    )
    SELECT CAST(v[1] AS BIGINT) AS n_months,
           (v[1] * v[5] - v[2] * v[3])
               / (v[1] * v[4] - v[2] * v[2]) AS aov_slope_cents,
           (v[3] - (v[1] * v[5] - v[2] * v[3])
                   / (v[1] * v[4] - v[2] * v[2]) * v[2]) / v[1]
               AS aov_intercept_cents
    FROM f
    """
    return q, sql


def build_wave89_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_rqa_w8",) + _rqa_query()))
    add(*(("orders_aov_trend",) + _aov_trend_query()))
    return queries, oracles
