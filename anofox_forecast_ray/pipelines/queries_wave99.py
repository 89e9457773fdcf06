"""Wave-99 queries: variance-change F ratio and quadratic trend.

- doc_var_ratio_halves: F = s1^2 / s2^2 between the first and second
  half of each token series — the variance-change screen that
  complements doc_cusum_argmax's mean-change view. Both sample
  variances are float expressions of exact int sums; the ratio is
  one more division.
- doc_quadratic_trend_w8: exact quadratic fit y ~ a + b t + c t^2
  over the w8 window-sum series via the explicit 3x3 Cramer solve on
  INTEGER moment sums (S_tk = sum t^k for k = 0..4 and M_k =
  sum t^k y for k = 0..2; window sums and powers stay inside int64
  at the doc-length envelope). Emits the curvature coefficient c —
  the U-shape / acceleration screen the linear doc_ols_trend cannot
  see. Determinants are spelled as the same cofactor expansion on
  both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


# ------------------------------------------------------ doc_var_ratio_halves
def _var_ratio_query():
    def q(sf_dir: str):
        def vr(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "f_ratio": pa.array([], type=pa.float64()),
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
            out = []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]]
                h = seg.size // 2
                a, b = seg[:h], seg[h:]

                def svar(v):
                    n = v.size
                    s = int(v.sum())
                    ss = int((v * v).sum())
                    return ((float(n) * float(ss)
                             - float(s) * float(s))
                            / (float(n) * (float(n) - 1.0)))

                v1, v2 = svar(a), svar(b)
                out.append(v1 / v2 if v2 > 0 else 0.0)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(lens[keep], type=pa.int64()),
                "f_ratio": pa.array(out, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            vr, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "f_ratio": pa.float64(),
        })

    def svar_sql(tag):
        return (f"((CAST(n{tag} AS DOUBLE) * CAST(ss{tag} AS DOUBLE)"
                f" - CAST(s{tag} AS DOUBLE) * CAST(s{tag} AS DOUBLE))"
                f" / (CAST(n{tag} AS DOUBLE)"
                f" * (CAST(n{tag} AS DOUBLE) - 1.0e0)))")

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id HAVING count(*) >= 4
    ),
    lab AS (
        SELECT t.doc_id, t.token,
               CASE WHEN t.pos < tl.n // 2 THEN 1 ELSE 2 END
                   AS half
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
    ),
    m AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN half = 1 THEN token END)
                    AS BIGINT) AS s1,
               CAST(sum(CASE WHEN half = 1
                        THEN token * token END) AS BIGINT) AS ss1,
               CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN half = 2 THEN token END)
                    AS BIGINT) AS s2,
               CAST(sum(CASE WHEN half = 2
                        THEN token * token END) AS BIGINT) AS ss2
        FROM lab GROUP BY doc_id
    )
    SELECT m.doc_id, tl.n AS n_tok,
           CASE WHEN {svar_sql("2")} > 0
                THEN {svar_sql("1")} / {svar_sql("2")}
                ELSE 0.0e0 END AS f_ratio
    FROM m JOIN tl ON tl.doc_id = m.doc_id
    """
    return q, sql


# --------------------------------------------------- doc_quadratic_trend_w8
def _quadratic_query(width: int = 8):
    def q(sf_dir: str):
        def quad(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "a0": pa.array([], type=pa.float64()),
                "b1": pa.array([], type=pa.float64()),
                "c2": pa.array([], type=pa.float64()),
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
            rkeep = dkeep[grp_a]
            newidx = np.cumsum(dkeep) - 1
            grp = newidx[grp_a[rkeep]]
            tt = wid_a[rkeep].astype(np.int64)
            y = ws_a[rkeep].astype(np.int64)
            nd = len(ids)

            def acc(v):
                out = np.zeros(nd, dtype=np.int64)
                np.add.at(out, grp, v)
                return out.astype(np.float64)

            s0 = acc(np.ones_like(tt))
            s1 = acc(tt)
            s2 = acc(tt * tt)
            s3 = acc(tt * tt * tt)
            s4 = acc(tt * tt * tt * tt)
            m0 = acc(y)
            m1 = acc(tt * y)
            m2 = acc(tt * tt * y)
            # 3x3 Cramer, first-row cofactor expansion
            det = (s0 * (s2 * s4 - s3 * s3)
                   - s1 * (s1 * s4 - s3 * s2)
                   + s2 * (s1 * s3 - s2 * s2))
            det_a = (m0 * (s2 * s4 - s3 * s3)
                     - s1 * (m1 * s4 - s3 * m2)
                     + s2 * (m1 * s3 - s2 * m2))
            det_b = (s0 * (m1 * s4 - m2 * s3)
                     - m0 * (s1 * s4 - s3 * s2)
                     + s2 * (s1 * m2 - s2 * m1))
            det_c = (s0 * (s2 * m2 - s3 * m1)
                     - s1 * (s1 * m2 - s2 * m1)
                     + m0 * (s1 * s3 - s2 * s2))
            ok = det != 0
            a0 = np.where(ok, det_a / np.where(ok, det, 1.0), 0.0)
            b1 = np.where(ok, det_b / np.where(ok, det, 1.0), 0.0)
            c2 = np.where(ok, det_c / np.where(ok, det, 1.0), 0.0)
            nw = nw_a[dkeep]
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw, type=pa.int64()),
                "a0": pa.array(a0, type=pa.float64()),
                "b1": pa.array(b1, type=pa.float64()),
                "c2": pa.array(c2, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            quad, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "a0": pa.float64(),
            "b1": pa.float64(),
            "c2": pa.float64(),
        })

    det = ("(s0 * (s2 * s4 - s3 * s3)"
           " - s1 * (s1 * s4 - s3 * s2)"
           " + s2 * (s1 * s3 - s2 * s2))")
    det_a = ("(m0 * (s2 * s4 - s3 * s3)"
             " - s1 * (m1 * s4 - s3 * m2)"
             " + s2 * (m1 * s3 - s2 * m2))")
    det_b = ("(s0 * (m1 * s4 - m2 * s3)"
             " - m0 * (s1 * s4 - s3 * s2)"
             " + s2 * (s1 * m2 - s2 * m1))")
    det_c = ("(s0 * (s2 * m2 - s3 * m1)"
             " - s1 * (s1 * m2 - s2 * m1)"
             " + m0 * (s1 * s3 - s2 * s2))")
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    mm AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(1) AS DOUBLE) AS s0,
               CAST(sum(wid) AS DOUBLE) AS s1,
               CAST(sum(wid * wid) AS DOUBLE) AS s2,
               CAST(sum(wid * wid * wid) AS DOUBLE) AS s3,
               CAST(sum(wid * wid * wid * wid) AS DOUBLE) AS s4,
               CAST(sum(s) AS DOUBLE) AS m0,
               CAST(sum(wid * s) AS DOUBLE) AS m1,
               CAST(sum(wid * wid * s) AS DOUBLE) AS m2
        FROM w GROUP BY doc_id HAVING count(*) >= 3
    )
    SELECT doc_id, m,
           CASE WHEN {det} <> 0 THEN {det_a} / {det}
                ELSE 0.0e0 END AS a0,
           CASE WHEN {det} <> 0 THEN {det_b} / {det}
                ELSE 0.0e0 END AS b1,
           CASE WHEN {det} <> 0 THEN {det_c} / {det}
                ELSE 0.0e0 END AS c2
    FROM mm
    """
    return q, sql


def build_wave99_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_var_ratio_halves",) + _var_ratio_query()))
    add(*(("doc_quadratic_trend_w8",) + _quadratic_query()))
    return queries, oracles
