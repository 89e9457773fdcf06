"""Wave-77 queries: matrix profile, Freedman-Diaconis binning, and
positional token entropy.

- doc_matrix_profile_w8: the matrix profile (Yeh et al. 2016, here
  the exact all-pairs variant over NON-overlapping w8 window
  vectors): for each full window, the minimum squared L2 distance to
  any other window of the same doc and the index of that nearest
  neighbor (motif discovery / novelty detection). Window components
  are raw int tokens, so every distance is an EXACT int64 (8-term
  integer sums — order-free) and argmin tie-breaks to the earliest
  neighbor via the encoded-key max (the doc_max_jump discipline).
  m windows per doc stay batch-local: O(m^2 * 8) int ops,
  vectorized.
- doc_fd_bins: Freedman-Diaconis histogram bin rule per doc:
  h = 2*IQR/n^(1/3), bins = ceil((max-min)/h). q25/q75 are quarter
  quantiles over integer tokens — np.quantile linear interpolation
  == quantile_cont bit-exactly (NOTES.md); cbrt/ceil are shared
  libm scalars.
- corpus_position_entropy: Shannon entropy of the token distribution
  at each position-mod-8 class (packing/positional-bias detector):
  bounded (8 x alphabet) integer counts tree-reduce; per-class
  entropy folds in ascending token order with scalar logs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds


# ----------------------------------------------------- doc_matrix_profile_w8
def _matrix_profile_query(width: int = 8):
    def q(sf_dir: str):
        def mp(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "window_id": pa.array([], type=pa.int64()),
                "nn_dist": pa.array([], type=pa.int64()),
                "nn_idx": pa.array([], type=pa.int64()),
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
            nfull = lens // width
            keep = nfull >= 2
            if not keep.any():
                return empty
            ids_all = t.column("doc_id").to_pylist()
            out_doc, out_w, out_d, out_j = [], [], [], []
            for di in np.flatnonzero(keep):
                m = int(nfull[di])
                seg = flat[offs[di]: offs[di] + m * width]
                w = seg.reshape(m, width)
                diff = w[:, None, :] - w[None, :, :]
                d2 = (diff * diff).sum(axis=2)  # exact int64
                np.fill_diagonal(d2, np.iinfo(np.int64).max)
                # earliest-neighbor argmin
                nn = d2.argmin(axis=1)
                nd = d2[np.arange(m), nn]
                out_doc += [ids_all[di]] * m
                out_w += list(range(m))
                out_d += [int(v) for v in nd]
                out_j += [int(v) for v in nn]
            return pa.table({
                "doc_id": pa.array(out_doc, type=pa.string()),
                "window_id": pa.array(out_w, type=pa.int64()),
                "nn_dist": pa.array(out_d, type=pa.int64()),
                "nn_idx": pa.array(out_j, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            mp, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "window_id": pa.int64(),
            "nn_dist": pa.int64(),
            "nn_idx": pa.int64(),
        })

    dist_terms = " + ".join(
        f"(a.t{i} - b.t{i}) * (a.t{i} - b.t{i})"
        for i in range(width))
    tok_cols = ",\n               ".join(
        f"max(CASE WHEN pos % {width} = {i} THEN token END) AS t{i}"
        for i in range(width))
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    nf AS (
        SELECT doc_id, CAST(count(*) // {width} AS BIGINT)
                   AS nfull
        FROM tok GROUP BY doc_id
        HAVING count(*) // {width} >= 2
    ),
    w AS (
        SELECT t.doc_id, t.pos // {width} AS wid,
               {tok_cols}
        FROM tok t JOIN nf ON nf.doc_id = t.doc_id
        WHERE t.pos < nf.nfull * {width}
        GROUP BY t.doc_id, t.pos // {width}
    ),
    d AS (
        SELECT a.doc_id, a.wid AS i, b.wid AS j,
               CAST({dist_terms} AS BIGINT) AS d2
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.wid <> b.wid
    ),
    best AS (
        SELECT doc_id, i, j, d2 FROM (
            SELECT doc_id, i, j, d2,
                   row_number() OVER (PARTITION BY doc_id, i
                                      ORDER BY d2 ASC, j ASC)
                       AS rn
            FROM d)
        WHERE rn = 1
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS window_id,
           d2 AS nn_dist,
           CAST(j AS BIGINT) AS nn_idx
    FROM best
    """
    return q, sql


# --------------------------------------------------------------- doc_fd_bins
def _fd_bins_query():
    def q(sf_dir: str):
        def fd(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "iqr": pa.array([], type=pa.float64()),
                "n_bins": pa.array([], type=pa.int64()),
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
            keep = lens >= 4
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            out_iqr, out_bins, out_n = [], [], []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]].astype(
                    np.float64)
                q25 = float(np.quantile(seg, 0.25))
                q75 = float(np.quantile(seg, 0.75))
                iqr = q75 - q25
                n = int(lens[di])
                if iqr > 0:
                    h = 2.0 * iqr / float(np.cbrt(float(n)))
                    rng = float(int(seg.max() - seg.min()))
                    bins = int(math.ceil(rng / h))
                else:
                    bins = 1
                out_iqr.append(iqr)
                out_bins.append(bins)
                out_n.append(n)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(out_n, type=pa.int64()),
                "iqr": pa.array(out_iqr, type=pa.float64()),
                "n_bins": pa.array(out_bins, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            fd, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "iqr": pa.float64(),
            "n_bins": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    st AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               quantile_cont(CAST(token AS DOUBLE), 0.25) AS q25,
               quantile_cont(CAST(token AS DOUBLE), 0.75) AS q75,
               CAST(max(token) - min(token) AS DOUBLE) AS rng
        FROM tok GROUP BY doc_id HAVING count(*) >= 4
    )
    SELECT doc_id, n AS n_tok,
           q75 - q25 AS iqr,
           CASE WHEN q75 - q25 > 0
                THEN CAST(ceil(rng / (2.0e0 * (q75 - q25)
                               / cbrt(CAST(n AS DOUBLE))))
                     AS BIGINT)
                ELSE 1 END AS n_bins
    FROM st
    """
    return q, sql


# ----------------------------------------------------- corpus_position_entropy
def _position_entropy_query(period: int = 8):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "posmod": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            lens = np.asarray(lengths, dtype=np.int64)
            tot = int(lens.sum())
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(lens) - lens, lens))
            pm = pos % period
            shift = np.int64(1 << 21)
            keys = pm.astype(np.int64) * shift + values.astype(
                np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "posmod": pa.array(uk // shift),
                "token": pa.array(uk % shift),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["posmod", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "posmod": g.column("posmod").cast(pa.int64()),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values(["posmod", "token"]).reset_index(
            drop=True)
        rows = []
        for pm, grp in h.groupby("posmod", sort=True):
            n = int(grp["cnt"].sum())
            nf = float(n)
            ent = 0.0
            for c in grp["cnt"]:
                p = float(int(c)) / nf
                ent = ent + p * math.log(p)
            rows.append((int(pm), n, -ent))
        return pa.table({
            "posmod": pa.array([r[0] for r in rows],
                               type=pa.int64()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "entropy": pa.array([r[2] for r in rows],
                                type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT pos % {period} AS posmod, token,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY posmod, token
    ),
    tot AS (
        SELECT posmod, CAST(sum(cnt) AS BIGINT) AS n
        FROM c GROUP BY posmod
    ),
    terms AS (
        SELECT c.posmod,
               (CAST(c.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(c.cnt AS DOUBLE)
                    / CAST(tot.n AS DOUBLE)) AS term,
               c.token
        FROM c JOIN tot ON tot.posmod = c.posmod
    )
    SELECT t.posmod, tot.n,
           -list_reduce(list_prepend(0.0e0,
               list(t.term ORDER BY t.token)), (a, b) -> a + b)
               AS entropy
    FROM terms t JOIN tot ON tot.posmod = t.posmod
    GROUP BY t.posmod, tot.n
    """
    return q, sql


def build_wave77_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_matrix_profile_w8",) + _matrix_profile_query()))
    add(*(("doc_fd_bins",) + _fd_bins_query()))
    add(*(("corpus_position_entropy",) + _position_entropy_query()))
    return queries, oracles
