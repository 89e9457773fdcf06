"""Wave-74 queries: TPC-H Q15 top supplier, Siegel repeated-medians
slope, and Anderson-Darling goodness of fit.

- lineitem_q15_top_supplier: TPC-H Q15 — per-supplier revenue over a
  quarter, emitting every supplier tied at the maximum. Revenue in
  exact integer cents x basis points; suppkey cardinality is bounded
  by the supplier table, so partials tree-reduce (no shuffle); the
  max + tie filter is integer.
- doc_siegel_slope_w8: Siegel repeated-medians slope over the w8
  window-sum series — the breakdown-point-1/2 robust cousin of
  doc_theil_sen_w8 (and the same estimator MFLES's robust mode
  uses, kernels/mfles.py): per anchor i take the LOWER median of
  pairwise slopes to all j != i, then the LOWER median over
  anchors. Slopes are exact int ratios; both medians are discrete
  value selections — tie-proof on both sides.
- doc_anderson_darling: Anderson-Darling A^2 of each doc's tokens
  against the CORPUS distribution — the tail-sensitive companion of
  doc_ks_uniform. Uses the midpoint CDF F(v) = (2*cum_less + c_v)
  / (2N) so no log argument can hit 0 or 1; the per-VALUE log
  tables are precomputed with scalar math.log over the bounded
  alphabet (broadcast once), and the per-doc sum folds ascending
  rank i with terms (2i-1)(ln F(x_(i)) + ln(1-F(x_(n+1-i)))).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

Q15_LO = "1996-01-01"
Q15_HI = "1996-04-01"


# -------------------------------------------------- lineitem_q15_top_supplier
def _q15_query(lo: str = Q15_LO, hi: str = Q15_HI):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        lo_us = int(np.datetime64(lo).astype("datetime64[us]")
                    .astype(np.int64))
        hi_us = int(np.datetime64(hi).astype("datetime64[us]")
                    .astype(np.int64))

        def partial(t: pa.Table) -> pa.Table:
            if "l_suppkey" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "suppkey": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                })
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = (ship >= lo_us) & (ship < hi_us)
            sk = t.column("l_suppkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            rev = cents * (10000 - bp)
            uk, inv = np.unique(sk, return_inverse=True)
            # np.add.at keeps int64 exactness (bincount weights are
            # float64 and would round 1e13-scale revenue units)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, rev)
            return pa.table({
                "suppkey": pa.array(uk),
                "rev": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("suppkey").aggregate([("rev", "sum")])
            return pa.table({
                "suppkey": g.column("suppkey").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        mx = int(a["rev"].max())
        top = a[a["rev"] == mx].sort_values("suppkey")
        return pa.table({
            "s_suppkey": pa.array(
                top["suppkey"].to_numpy(np.int64)),
            "total_rev_units": pa.array(
                top["rev"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)
                        * (10000 - CAST(round_even(
                              l_discount * 10000, 0) AS BIGINT)))
                    AS BIGINT) AS r
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{lo}'
          AND l_shipdate < TIMESTAMP '{hi}'
        GROUP BY l_suppkey
    )
    SELECT l_suppkey AS s_suppkey, r AS total_rev_units
    FROM rev WHERE r = (SELECT max(r) FROM rev)
    ORDER BY s_suppkey
    """
    return q, sql


# ------------------------------------------------------- doc_siegel_slope_w8
def _siegel_query(width: int = 8):
    def q(sf_dir: str):
        def siegel(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "slope": pa.array([], type=pa.float64()),
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
            dkeep = nw_a >= 2
            if not dkeep.any():
                return empty
            ids_all = [d for d, k in zip(
                t.column("doc_id").to_pylist(), kt) if k]
            ids = [d for d, k in zip(ids_all, dkeep) if k]
            nw = nw_a[dkeep]
            newidx = np.cumsum(dkeep) - 1
            rkeep = dkeep[grp_a]
            grp = newidx[grp_a[rkeep]]
            wid = wid_a[rkeep]
            ws = ws_a[rkeep]
            nd = len(ids)
            bounds = np.cumsum(nw) - nw
            # full i != j slope matrix per doc, vectorized
            sq = nw * nw
            tot2 = int(sq.sum())
            g2 = np.repeat(np.arange(nd), sq)
            within = (np.arange(tot2)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = nw[g2]
            ii = within // c
            jj = within % c
            mask = ii != jj
            g2m = g2[mask]
            iim = ii[mask]
            dy = (ws[bounds[g2m] + jj[mask]]
                  - ws[bounds[g2m] + iim]).astype(np.float64)
            dx = (jj[mask] - iim).astype(np.float64)
            # + 0.0 canonicalizes -0.0 (0/negative-dx) so the median
            # tie-pick cannot differ from the oracle bitwise
            sl = dy / dx + 0.0
            # lower median per (doc, anchor i): sort by value inside
            # each (doc, i) run of length nw-1
            akey = g2m * int(nw.max()) + iim
            order = np.lexsort((sl, akey))
            sls = sl[order]
            # runs are contiguous: per (doc, i) block of nw[d]-1
            nrun = int(nw.sum())  # one run per (doc, anchor)
            run_sizes = np.repeat(nw - 1, nw)
            rb = np.cumsum(run_sizes) - run_sizes
            med_i = sls[rb + (run_sizes - 1) // 2]
            # lower median over anchors per doc
            doc_of_run = np.repeat(np.arange(nd), nw)
            order2 = np.lexsort((med_i, doc_of_run))
            ms = med_i[order2]
            db = np.cumsum(nw) - nw
            slope = ms[db + (nw - 1) // 2]
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw, type=pa.int64()),
                "slope": pa.array(slope, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            siegel, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "slope": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    sl AS (
        SELECT a.doc_id, a.wid AS i,
               (CAST(b.s AS DOUBLE) - CAST(a.s AS DOUBLE))
               / (CAST(b.wid AS DOUBLE) - CAST(a.wid AS DOUBLE))
               + 0.0e0 AS slope
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.wid <> b.wid
    ),
    medi AS (
        SELECT doc_id, i, slope AS med FROM (
            SELECT doc_id, i, slope,
                   row_number() OVER (PARTITION BY doc_id, i
                                      ORDER BY slope) AS rn,
                   count(*) OVER (PARTITION BY doc_id, i) AS nc
            FROM sl)
        WHERE rn = (nc - 1) // 2 + 1
    ),
    fin AS (
        SELECT doc_id, med FROM (
            SELECT doc_id, med,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY med) AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS nc
            FROM medi)
        WHERE rn = (nc - 1) // 2 + 1
    ),
    mm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM w GROUP BY doc_id HAVING count(*) >= 2
    )
    SELECT mm.doc_id, mm.m, fin.med AS slope
    FROM mm JOIN fin ON fin.doc_id = mm.doc_id
    """
    return q, sql


# ------------------------------------------------------ doc_anderson_darling
def _anderson_query():
    def q(sf_dir: str):
        import ray

        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def hist_partial(t: pa.Table) -> pa.Table:
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
            .map_batches(hist_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hist = tree_reduce_tables(refs, merge).to_pandas()
        hist = hist.sort_values("token").reset_index(drop=True)
        vals = hist["token"].to_numpy(np.int64)
        cnts = hist["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        big_n = int(cum[-1])
        cum_less = cum - cnts
        # midpoint-CDF log tables: one scalar log per alphabet value
        lf = np.fromiter(
            (math.log(float(int(2 * cl + cv)))
             - math.log(float(2 * big_n))
             for cl, cv in zip(cum_less, cnts)),
            np.float64, vals.size)
        lr = np.fromiter(
            (math.log(float(int(2 * big_n - 2 * cl - cv)))
             - math.log(float(2 * big_n))
             for cl, cv in zip(cum_less, cnts)),
            np.float64, vals.size)
        bref = ray.put((vals, lf, lr))

        class ADStage:
            def __init__(self, bref):
                self.vals, self.lf, self.lr = ray.get(bref)

            def __call__(self, t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "doc_id": pa.array([], type=pa.string()),
                    "n_tok": pa.array([], type=pa.int64()),
                    "a2": pa.array([], type=pa.float64()),
                })
                if ("tokens" not in t.column_names
                        or t.num_rows == 0):
                    return empty
                values, lengths = _flat_tokens(t)
                lens = np.asarray(lengths, dtype=np.int64)
                ids = t.column("doc_id").to_pylist()
                nd = len(ids)
                v64 = values.astype(np.int64)
                a2 = np.full(nd, np.nan)
                off = 0
                for i in range(nd):
                    n = int(lens[i])
                    seg = np.sort(v64[off: off + n])
                    off += n
                    if n == 0:
                        continue
                    idx = np.searchsorted(self.vals, seg)
                    lfi = self.lf[idx]
                    lri = self.lr[idx[::-1]]
                    w = (2.0 * np.arange(1, n + 1,
                                         dtype=np.float64)
                         - 1.0)
                    terms = w * (lfi + lri)
                    s = float(np.cumsum(terms)[-1])
                    a2[i] = -float(n) - s / float(n)
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_tok": pa.array(lens),
                    "a2": pa.array(a2, type=pa.float64()),
                })

        out = corpus_ds(sf_dir).map_batches(
            ADStage, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(bref,),
        )
        return _cast(out, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "a2": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    corp AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY token
    ),
    cc AS (
        SELECT token, c,
               CAST(sum(c) OVER (ORDER BY token) - c AS BIGINT)
                   AS cl,
               CAST((SELECT sum(c) FROM corp) AS BIGINT) AS n
        FROM corp
    ),
    tabs AS (
        SELECT token,
               ln(CAST(2 * cl + c AS DOUBLE))
                   - ln(CAST(2 * n AS DOUBLE)) AS lf,
               ln(CAST(2 * n - 2 * cl - c AS DOUBLE))
                   - ln(CAST(2 * n AS DOUBLE)) AS lr
        FROM cc
    ),
    ranked AS (
        SELECT t.doc_id, t.token,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY t.token, t.pos) AS i,
               count(*) OVER (PARTITION BY t.doc_id) AS n
        FROM tok t
    ),
    paired AS (
        SELECT a.doc_id, a.i, a.n,
               ta.lf AS lf, tb.lr AS lr
        FROM ranked a
        JOIN ranked b ON b.doc_id = a.doc_id
                     AND b.i = a.n + 1 - a.i
        JOIN tabs ta ON ta.token = a.token
        JOIN tabs tb ON tb.token = b.token
    ),
    folded AS (
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(2 * i - 1 AS DOUBLE) * (lf + lr)
                        ORDER BY i)),
                   (a, b) -> a + b) AS s
        FROM paired GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(f.n, 0) AS n_tok,
           CASE WHEN f.doc_id IS NULL THEN 'nan'::DOUBLE
                ELSE -CAST(f.n AS DOUBLE)
                     - f.s / CAST(f.n AS DOUBLE) END AS a2
    FROM documents d LEFT JOIN folded f
      ON f.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


def build_wave74_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_q15_top_supplier",) + _q15_query()))
    add(*(("doc_siegel_slope_w8",) + _siegel_query()))
    add(*(("doc_anderson_darling",) + _anderson_query()))
    return queries, oracles
