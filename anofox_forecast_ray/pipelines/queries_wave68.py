"""Wave-68 queries: Heaps' law vocabulary growth, Poisson dispersion
test, and adjacent-window Jaccard self-similarity.

- source_heaps_law: Heaps/Herdan vocabulary-growth exponent per
  source — V(N) ~ K N^beta fitted in ln-ln space over doc-count
  checkpoints d = 2/4/8/16. Distribution-friendly formulation: a
  token's vocab-entry time is its MIN doc_id within the source
  (a (source, token) -> min tree-reduce over bounded alphabet keys;
  never a sequential scan), V(d) = # tokens whose min-doc rank <= d,
  N(d) = tokens in the first d docs — all integers; the Cramer slope
  over 4 ln points is the only float. Doc rank = row_number over
  doc_id within source on both sides.
- events_dispersion_chi2: index-of-dispersion (variance-to-mean)
  test of the dense hourly event counts against Poisson: D =
  s^2/mean, chi2 = (n-1) D = (n*sum(x^2) - S^2)/S — ONE float
  division of exact int64s (overdispersion monitoring, the standard
  pre-check before any Poisson-based alerting).
- doc_window_jaccard_w8: token-SET Jaccard similarity of each
  adjacent w8 window pair, averaged per doc — the windowed
  self-similarity profile (template/boilerplate detector). inter =
  dA + dB - dUnion with all three distinct counts integer; the
  per-doc mean folds in pair order via the zero-padded cumsum
  (NOTES.md: reduceat is pairwise).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

HEAPS_CHECKPOINTS = (2, 4, 8, 16)


# ------------------------------------------------------------ source_heaps_law
def _heaps_query(checkpoints: tuple = HEAPS_CHECKPOINTS):
    cps = tuple(checkpoints)

    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.int64()),
                "min_doc": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            did = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64)
            src = np.asarray(t.column("source").to_pylist())
            shift = np.int64(1 << 21)  # codepoints < 2^21
            src_names, src_inv = np.unique(src, return_inverse=True)
            keys = (np.repeat(src_inv, lengths).astype(np.int64)
                    * shift + values.astype(np.int64))
            grp_doc = np.repeat(did, lengths)
            order = np.lexsort((grp_doc, keys))
            ks = keys[order]
            ds_ = grp_doc[order]
            first = np.r_[True, ks[1:] != ks[:-1]]
            uk = ks[first]
            md = ds_[first]
            return pa.table({
                "source": pa.array(src_names[uk // shift],
                                   type=pa.string()),
                "token": pa.array(uk % shift, type=pa.int64()),
                "min_doc": pa.array(md, type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("min_doc", "min")])
            return pa.table({
                "source": g.column("source"),
                "token": g.column("token").cast(pa.int64()),
                "min_doc": g.column("min_doc_min").cast(pa.int64()),
            })

        def doc_partial(t: pa.Table) -> pa.Table:
            if "tokens" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "source": pa.array([], type=pa.string()),
                    "doc": pa.array([], type=pa.int64()),
                    "n_tok": pa.array([], type=pa.int64()),
                })
            _v, lengths = _flat_tokens(t)
            return pa.table({
                "source": t.column("source").cast(pa.string()),
                "doc": pa.array(
                    [int(d)
                     for d in t.column("doc_id").to_pylist()],
                    type=pa.int64()),
                "n_tok": pa.array(
                    np.asarray(lengths, dtype=np.int64)),
            })

        ds = corpus_ds(sf_dir)
        refs = list(ds.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs())
        vocab = tree_reduce_tables(refs, merge).to_pandas()
        refs2 = list(ds.map_batches(
            doc_partial, batch_format="pyarrow").to_arrow_refs())
        docs = tree_reduce_tables(refs2, lambda t: t).to_pandas()
        docs = docs.drop_duplicates(["source", "doc"]).sort_values(
            ["source", "doc"]).reset_index(drop=True)
        out = {"source": [], "beta": [], "k_const": []}
        vcols = {d: [] for d in cps}
        ncols = {d: [] for d in cps}
        for src, dgrp in docs.groupby("source", sort=True):
            dids = dgrp["doc"].to_numpy(np.int64)
            ntoks = dgrp["n_tok"].to_numpy(np.int64)
            if len(dids) < max(cps):
                continue
            v = vocab[vocab["source"] == src]
            md = v["min_doc"].to_numpy(np.int64)
            lx, ly = [], []
            for d in cps:
                thresh = dids[d - 1]
                vd = int((md <= thresh).sum())
                nd_ = int(ntoks[:d].sum())
                vcols[d].append(vd)
                ncols[d].append(nd_)
                lx.append(math.log(float(nd_)))
                ly.append(math.log(float(vd)))
            kf = float(len(cps))
            sx = lx[0] + lx[1] + lx[2] + lx[3]
            sy = ly[0] + ly[1] + ly[2] + ly[3]
            sxx = (lx[0] * lx[0] + lx[1] * lx[1]
                   + lx[2] * lx[2] + lx[3] * lx[3])
            sxy = (lx[0] * ly[0] + lx[1] * ly[1]
                   + lx[2] * ly[2] + lx[3] * ly[3])
            beta = (kf * sxy - sx * sy) / (kf * sxx - sx * sx)
            kconst = (sy - beta * sx) / kf
            out["source"].append(src)
            out["beta"].append(beta)
            out["k_const"].append(kconst)
        tbl = {"source": pa.array(out["source"], type=pa.string())}
        for d in cps:
            tbl[f"v{d}"] = pa.array(vcols[d], type=pa.int64())
            tbl[f"n{d}"] = pa.array(ncols[d], type=pa.int64())
        tbl["beta"] = pa.array(out["beta"], type=pa.float64())
        tbl["k_const"] = pa.array(out["k_const"],
                                  type=pa.float64())
        return pa.table(tbl)

    cp_cols = ",\n           ".join(
        f"""CAST(sum(CASE WHEN min_rank <= {d} THEN 1 ELSE 0 END)
             AS BIGINT) AS v{d}""" for d in cps)
    n_cols = ",\n           ".join(
        f"""CAST(sum(CASE WHEN rnk <= {d} THEN n_tok ELSE 0 END)
             AS BIGINT) AS n{d}""" for d in cps)
    k = len(cps)
    lxs = [f"ln(CAST(n{d} AS DOUBLE))" for d in cps]
    lys = [f"ln(CAST(v{d} AS DOUBLE))" for d in cps]
    sx = "(" + " + ".join(lxs) + ")"
    sy = "(" + " + ".join(lys) + ")"
    sxx = "(" + " + ".join(f"{x} * {x}" for x in lxs) + ")"
    sxy = "(" + " + ".join(
        f"{x} * {y}" for x, y in zip(lxs, lys)) + ")"
    beta = (f"({k}.0e0 * {sxy} - {sx} * {sy})"
            f" / ({k}.0e0 * {sxx} - {sx} * {sx})")
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    dr AS (
        SELECT source, CAST(doc_id AS BIGINT) AS doc,
               row_number() OVER (PARTITION BY source
                                  ORDER BY CAST(doc_id AS BIGINT))
                   AS rnk,
               count(*) OVER (PARTITION BY source) AS ndocs
        FROM documents
    ),
    tokr AS (
        SELECT t.source, t.token, dr.rnk
        FROM tok t JOIN dr ON dr.doc = CAST(t.doc_id AS BIGINT)
    ),
    minr AS (
        SELECT source, token,
               CAST(min(rnk) AS BIGINT) AS min_rank
        FROM tokr GROUP BY source, token
    ),
    vs AS (
        SELECT source,
           {cp_cols}
        FROM minr GROUP BY source
    ),
    lens AS (
        SELECT dr.source,
           {n_cols}
        FROM dr JOIN (SELECT doc_id, count(*) AS n_tok
                      FROM tok GROUP BY doc_id) tl
          ON CAST(tl.doc_id AS BIGINT) = dr.doc
        WHERE dr.ndocs >= {max(cps)}
        GROUP BY dr.source
    )
    SELECT vs.source,
           {", ".join(f"vs.v{d}, lens.n{d}" for d in cps)},
           {beta} AS beta,
           ({sy} - ({beta}) * {sx}) / {k}.0e0 AS k_const
    FROM vs JOIN lens ON lens.source = vs.source
    """
    return q, sql


# ------------------------------------------------- events_dispersion_chi2
def _dispersion_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            uk, cnt = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        dense = np.zeros(span, dtype=np.int64)
        dense[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        n = span
        s = int(dense.sum())
        ss = int((dense * dense).sum())
        chi2 = float(n * ss - s * s) / float(s)
        disp = chi2 / float(n - 1)
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "total": pa.array([s], type=pa.int64()),
            "sumsq": pa.array([ss], type=pa.int64()),
            "dispersion": pa.array([disp], type=pa.float64()),
            "chi2": pa.array([chi2], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    )
    SELECT CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(x) AS BIGINT) AS total,
           CAST(sum(x * x) AS BIGINT) AS sumsq,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
               / CAST(sum(x) AS DOUBLE)
               / CAST(count(*) - 1 AS DOUBLE) AS dispersion,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
               / CAST(sum(x) AS DOUBLE) AS chi2
    FROM dense
    """
    return q, sql


# ---------------------------------------------------- doc_window_jaccard_w8
def _window_jaccard_query(width: int = 8):
    def q(sf_dir: str):
        def jac(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_pairs": pa.array([], type=pa.int64()),
                "mean_jaccard": pa.array([], type=pa.float64()),
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
            kt = lens > width  # need >= 2 windows
            if not kt.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), kt) if k]
            starts = offs[:-1][kt]
            dlens = lens[kt]
            nd = len(ids)
            nw = (dlens + width - 1) // width
            npair = nw - 1
            # per-window distinct counts
            tot = int(dlens.sum())
            g = np.repeat(np.arange(nd), dlens)
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            win = pos // width
            tokv = flat[np.repeat(starts, dlens)
                        + pos]
            wkey = g * (int(nw.max()) + 1) + win
            order = np.lexsort((tokv, wkey))
            kk = wkey[order]
            vv = tokv[order]
            fu = np.r_[True, (kk[1:] != kk[:-1])
                       | (vv[1:] != vv[:-1])]
            dwin = np.bincount(
                kk[fu], minlength=nd * (int(nw.max()) + 1)
            ).astype(np.int64)
            # per-pair union distinct: tokens of windows p and p+1
            # (duplicate each position into pairs win and win-1)
            pair_a = win          # position joins pair index win
            pair_b = win - 1      # and pair index win-1
            gg = np.r_[g, g]
            pp = np.r_[pair_b, pair_a]
            tv = np.r_[tokv, tokv]
            ok = (pp >= 0) & (pp < (nw - 1)[gg])
            gg, pp, tv = gg[ok], pp[ok], tv[ok]
            pkey = gg * (int(nw.max()) + 1) + pp
            order2 = np.lexsort((tv, pkey))
            k2 = pkey[order2]
            v2 = tv[order2]
            fu2 = np.r_[True, (k2[1:] != k2[:-1])
                        | (v2[1:] != v2[:-1])]
            duni = np.bincount(
                k2[fu2], minlength=nd * (int(nw.max()) + 1)
            ).astype(np.int64)
            # jaccard per (doc, pair p): (dA + dB - U) / U
            W = int(nw.max()) + 1
            maxp = int(npair.max())
            mat = np.zeros((nd, maxp), dtype=np.float64)
            for_doc = np.repeat(np.arange(nd), npair)
            pidx = (np.arange(int(npair.sum()))
                    - np.repeat(np.cumsum(npair) - npair, npair))
            da = dwin[for_doc * W + pidx]
            db = dwin[for_doc * W + pidx + 1]
            u = duni[for_doc * W + pidx]
            jv = (da + db - u).astype(np.float64) / u.astype(
                np.float64)
            mat[for_doc, pidx] = jv
            sums = np.cumsum(mat, axis=1)[:, -1]
            mean = sums / npair.astype(np.float64)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_pairs": pa.array(npair, type=pa.int64()),
                "mean_jaccard": pa.array(mean, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            jac, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_pairs": pa.int64(),
            "mean_jaccard": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (SELECT doc_id, pos // {width} AS win, token FROM tok),
    nw AS (
        SELECT doc_id, CAST(max(win) + 1 AS BIGINT) AS nw
        FROM w GROUP BY doc_id HAVING max(win) >= 1
    ),
    dwin AS (
        SELECT doc_id, win,
               CAST(count(DISTINCT token) AS BIGINT) AS d
        FROM w GROUP BY doc_id, win
    ),
    uni AS (
        SELECT doc_id, p, CAST(count(DISTINCT token) AS BIGINT)
               AS u
        FROM (
            SELECT doc_id, win AS p, token FROM w
            UNION ALL
            SELECT doc_id, win - 1 AS p, token FROM w
        ) s
        JOIN nw USING (doc_id)
        WHERE p >= 0 AND p < nw.nw - 1
        GROUP BY doc_id, p
    ),
    jac AS (
        SELECT u.doc_id, u.p,
               CAST(a.d + b.d - u.u AS DOUBLE)
               / CAST(u.u AS DOUBLE) AS j
        FROM uni u
        JOIN dwin a ON a.doc_id = u.doc_id AND a.win = u.p
        JOIN dwin b ON b.doc_id = u.doc_id AND b.win = u.p + 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           list_reduce(list_prepend(0.0e0, list(j ORDER BY p)),
                       (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS mean_jaccard
    FROM jac GROUP BY doc_id
    """
    return q, sql


def build_wave68_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_heaps_law",) + _heaps_query()))
    add(*(("events_dispersion_chi2",) + _dispersion_query()))
    add(*(("doc_window_jaccard_w8",) + _window_jaccard_query()))
    return queries, oracles
