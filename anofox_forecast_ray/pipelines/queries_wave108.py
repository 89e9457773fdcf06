"""Wave-108 queries: source cohesion and modal-token dispersion.

- source_doc_cohesion: mean Jensen-Shannon divergence between each
  doc's token distribution and its SOURCE's aggregate distribution —
  the source-purity number (high mean = the source is a grab bag;
  the mixture-auditing complement of source_jsd_matrix). Per-doc JSD
  folds in ascending token order against the broadcast source
  profile; the per-source mean folds over docs in doc_id order.
- doc_top_token_dispersion: how evenly is each doc's MODAL token
  spread through the doc? Normalized mean absolute deviation of its
  positions around their mean, kept exact with the n-scaled integer
  trick (sum |k*pos_i - S| is int64), normalized by doc length.
  Low = the token clusters in one region (header/footer artifact).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


# ---------------------------------------------------------- source_doc_cohesion
def _cohesion_query():
    def q(sf_dir: str):
        import ray

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

        ds = corpus_ds(sf_dir)
        refs = list(ds.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs())
        prof = tree_reduce_tables(refs, merge).to_pandas()
        profiles = {}
        totals = {}
        for src, grp in prof.groupby("source"):
            toks = grp["token"].to_numpy(np.int64)
            cnts = grp["cnt"].to_numpy(np.int64)
            order = np.argsort(toks)
            profiles[src] = (toks[order], cnts[order])
            totals[src] = int(cnts.sum())
        pref = ray.put((profiles, totals))

        class JSDStage:
            def __init__(self, pref):
                self.profiles, self.totals = ray.get(pref)

            def __call__(self, t: pa.Table) -> pa.Table:
                empty = pa.table({
                    "source": pa.array([], type=pa.string()),
                    "doc": pa.array([], type=pa.int64()),
                    "jsd": pa.array([], type=pa.float64()),
                })
                if ("tokens" not in t.column_names
                        or t.num_rows == 0):
                    return empty
                values, lengths = _flat_tokens(t)
                srcs = t.column("source").to_pylist()
                dids = [int(d) for d in
                        t.column("doc_id").to_pylist()]
                out_s, out_d, out_j = [], [], []
                off = 0
                for i, ln_ in enumerate(lengths):
                    seg = values[off: off + int(ln_)]
                    off += int(ln_)
                    if ln_ == 0:
                        continue
                    ptoks, pcnts = self.profiles[srcs[i]]
                    nsrc = float(self.totals[srcs[i]])
                    uk, cc = np.unique(
                        seg.astype(np.int64),
                        return_counts=True)
                    nd_ = float(int(ln_))
                    # doc tokens are a subset of the source profile
                    idx = np.searchsorted(ptoks, uk)
                    j = 0.0
                    di = 0
                    for k in range(ptoks.size):
                        p = float(int(pcnts[k])) / nsrc
                        if di < uk.size and idx[di] == k:
                            qq = float(int(cc[di])) / nd_
                            di += 1
                        else:
                            qq = 0.0
                        mm = 0.5 * (p + qq)
                        term = 0.0
                        if p > 0:
                            term = term + 0.5 * (
                                p * math.log(p / mm))
                        if qq > 0:
                            term = term + 0.5 * (
                                qq * math.log(qq / mm))
                        j = j + term
                    out_s.append(srcs[i])
                    out_d.append(dids[i])
                    out_j.append(j)
                return pa.table({
                    "source": pa.array(out_s, type=pa.string()),
                    "doc": pa.array(out_d, type=pa.int64()),
                    "jsd": pa.array(out_j, type=pa.float64()),
                })

        refs2 = list(ds.map_batches(
            JSDStage, batch_format="pyarrow", concurrency=2,
            fn_constructor_args=(pref,)).to_arrow_refs())
        a = tree_reduce_tables(refs2, lambda t: t).to_pandas()
        a = a.drop_duplicates("doc").sort_values(
            ["source", "doc"]).reset_index(drop=True)
        rows = []
        for src, grp in a.groupby("source", sort=True):
            acc = 0.0
            for v in grp["jsd"]:  # doc-ordered fold
                acc = acc + float(v)
            rows.append((src, len(grp), acc / float(len(grp))))
        return pa.table({
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "n_docs": pa.array([r[1] for r in rows],
                               type=pa.int64()),
            "mean_jsd": pa.array([r[2] for r in rows],
                                 type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    sprof AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, token
    ),
    stot AS (
        SELECT source, CAST(sum(c) AS DOUBLE) AS n
        FROM sprof GROUP BY source
    ),
    dcnt AS (
        SELECT doc_id, source, token,
               CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY doc_id, source, token
    ),
    dtot AS (
        SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n
        FROM dcnt GROUP BY doc_id
    ),
    docs AS (SELECT DISTINCT doc_id, source FROM tok),
    terms AS (
        SELECT d.doc_id, sp.token,
               (CASE WHEN sp.c > 0
                     THEN 0.5e0 * ((CAST(sp.c AS DOUBLE) / st.n)
                          * ln((CAST(sp.c AS DOUBLE) / st.n)
                               / (0.5e0
                                  * (CAST(sp.c AS DOUBLE) / st.n
                                     + CAST(COALESCE(dc.c, 0)
                                            AS DOUBLE) / dt.n))))
                     ELSE 0.0e0 END)
               + (CASE WHEN COALESCE(dc.c, 0) > 0
                     THEN 0.5e0
                          * ((CAST(dc.c AS DOUBLE) / dt.n)
                          * ln((CAST(dc.c AS DOUBLE) / dt.n)
                               / (0.5e0
                                  * (CAST(sp.c AS DOUBLE) / st.n
                                     + CAST(dc.c AS DOUBLE)
                                       / dt.n))))
                     ELSE 0.0e0 END) AS term
        FROM docs d
        JOIN sprof sp ON sp.source = d.source
        JOIN stot st ON st.source = d.source
        JOIN dtot dt ON dt.doc_id = d.doc_id
        LEFT JOIN dcnt dc ON dc.doc_id = d.doc_id
                         AND dc.token = sp.token
    ),
    perdoc AS (
        SELECT t.doc_id,
               list_reduce(list_prepend(0.0e0,
                   list(t.term ORDER BY t.token)),
                   (a, b) -> a + b) AS jsd
        FROM terms t GROUP BY t.doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           list_reduce(list_prepend(0.0e0,
               list(p.jsd ORDER BY CAST(p.doc_id AS BIGINT))),
               (a, b) -> a + b) / CAST(count(*) AS DOUBLE)
               AS mean_jsd
    FROM perdoc p JOIN docs d ON d.doc_id = p.doc_id
    GROUP BY d.source
    """
    return q, sql


# ---------------------------------------------------- doc_top_token_dispersion
def _dispersion_query():
    def q(sf_dir: str):
        def disp(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "top_token": pa.array([], type=pa.int64()),
                "k_occ": pa.array([], type=pa.int64()),
                "dispersion": pa.array([], type=pa.float64()),
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
            keep = lens >= 2
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            out_t, out_k, out_d = [], [], []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]]
                uk, cc = np.unique(seg, return_counts=True)
                # modal token, lowest value on ties
                best = int(uk[np.lexsort((uk, -cc))[0]])
                pos = np.flatnonzero(seg == best).astype(np.int64)
                k = pos.size
                s = int(pos.sum())
                mad_num = int(np.abs(k * pos - s).sum())
                # normalized MAD: (mad_num / k^2) / n
                dd = (float(mad_num) / (float(k) * float(k))
                      / float(seg.size))
                out_t.append(best)
                out_k.append(k)
                out_d.append(dd)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "top_token": pa.array(out_t, type=pa.int64()),
                "k_occ": pa.array(out_k, type=pa.int64()),
                "dispersion": pa.array(out_d, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            disp, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "top_token": pa.int64(),
            "k_occ": pa.int64(),
            "dispersion": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id HAVING count(*) >= 2
    ),
    modal AS (
        SELECT doc_id, token AS top_token, c AS k FROM (
            SELECT doc_id, token,
                   CAST(count(*) AS BIGINT) AS c,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY count(*) DESC,
                                               token ASC) AS rn
            FROM tok GROUP BY doc_id, token)
        WHERE rn = 1
    ),
    pos AS (
        SELECT t.doc_id, m.top_token, m.k, t.pos,
               CAST(sum(t.pos) OVER (PARTITION BY t.doc_id)
                    AS BIGINT) AS s
        FROM tok t JOIN modal m
          ON m.doc_id = t.doc_id AND t.token = m.top_token
    ),
    agg AS (
        SELECT doc_id, top_token, k,
               CAST(sum(abs(k * pos - s)) AS BIGINT) AS mad_num
        FROM pos GROUP BY doc_id, top_token, k, s
    )
    SELECT agg.doc_id,
           CAST(agg.top_token AS BIGINT) AS top_token,
           agg.k AS k_occ,
           CAST(agg.mad_num AS DOUBLE)
               / (CAST(agg.k AS DOUBLE) * CAST(agg.k AS DOUBLE))
               / CAST(tl.n AS DOUBLE) AS dispersion
    FROM agg JOIN tl ON tl.doc_id = agg.doc_id
    """
    return q, sql


def build_wave108_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_doc_cohesion",) + _cohesion_query()))
    add(*(("doc_top_token_dispersion",) + _dispersion_query()))
    return queries, oracles
