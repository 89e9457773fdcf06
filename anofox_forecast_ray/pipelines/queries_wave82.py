"""Wave-82 queries: Hjorth parameters and intraclass correlation.

- doc_hjorth: the Hjorth descriptors (Hjorth 1970 — activity,
  mobility, complexity) of each token series: activity = var(y),
  mobility = sqrt(var(dy)/var(y)), complexity =
  mobility(dy)/mobility(y) = sqrt(var(ddy)*var(y))/var(dy). All
  three variances come from pure-int64 moment sums of y, the first
  difference and the second difference (population variances,
  n-scaled as (n*SS - S^2) with the matching n per series), so the
  descriptors are scalar expressions of exact ints on both sides.
- source_icc: intraclass correlation ICC(1) of doc token counts
  within sources (how much does source membership explain doc
  length): from the one-way ANOVA decomposition, MSB/(MSB +
  (n0 - 1)*MSW) with n0 the mean group size correction
  (N - sum n_g^2/N)/(k - 1). Integer (n, s, ss, n^2) partials;
  source-ordered LIST fold extends the wave-60 accumulator by one
  slot for sum(n_g^2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, corpus_ds


# ------------------------------------------------------------------ doc_hjorth
def _hjorth_query():
    def q(sf_dir: str):
        def hjorth(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "activity": pa.array([], type=pa.float64()),
                "mobility": pa.array([], type=pa.float64()),
                "complexity": pa.array([], type=pa.float64()),
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
            keep = lens >= 3
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            out = {"n": [], "act": [], "mob": [], "cpx": []}
            for di in np.flatnonzero(keep):
                y = flat[offs[di]: offs[di + 1]]
                d1 = np.diff(y)
                d2 = np.diff(d1)

                def pvar(v):
                    n = v.size
                    s = int(v.sum())
                    ss = int((v * v).sum())
                    return ((float(n) * float(ss)
                             - float(s) * float(s))
                            / (float(n) * float(n)))

                v0 = pvar(y)
                v1 = pvar(d1)
                v2 = pvar(d2) if d2.size > 0 else 0.0
                mob = (np.sqrt(v1 / v0) if v0 > 0 else 0.0)
                cpx = (np.sqrt(v2 / v1) / mob
                       if v1 > 0 and mob > 0 else 0.0)
                out["n"].append(int(lens[di]))
                out["act"].append(v0)
                out["mob"].append(float(mob))
                out["cpx"].append(float(cpx))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(out["n"], type=pa.int64()),
                "activity": pa.array(out["act"],
                                     type=pa.float64()),
                "mobility": pa.array(out["mob"],
                                     type=pa.float64()),
                "complexity": pa.array(out["cpx"],
                                       type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            hjorth, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "activity": pa.float64(),
            "mobility": pa.float64(),
            "complexity": pa.float64(),
        })

    def var_expr(n, s, ss):
        return (f"((CAST({n} AS DOUBLE) * CAST({ss} AS DOUBLE)"
                f" - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE))"
                f" / (CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE)))")

    v0 = var_expr("n0", "s0", "ss0")
    v1 = var_expr("n1", "s1", "ss1")
    v2 = var_expr("n2", "s2", "ss2")
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d1 AS (
        SELECT doc_id, pos,
               lead(token) OVER w - token AS d
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    d2 AS (
        SELECT doc_id, pos,
               lead(d) OVER w - d AS d
        FROM d1 WHERE d IS NOT NULL
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    m0 AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(token) AS BIGINT) AS s0,
               CAST(sum(token * token) AS BIGINT) AS ss0
        FROM tok GROUP BY doc_id HAVING count(*) >= 3
    ),
    m1 AS (
        SELECT doc_id, CAST(count(d) AS BIGINT) AS n1,
               CAST(sum(d) AS BIGINT) AS s1,
               CAST(sum(d * d) AS BIGINT) AS ss1
        FROM d1 WHERE d IS NOT NULL GROUP BY doc_id
    ),
    m2 AS (
        SELECT doc_id, CAST(count(d) AS BIGINT) AS n2,
               CAST(sum(d) AS BIGINT) AS s2,
               CAST(sum(d * d) AS BIGINT) AS ss2
        FROM d2 WHERE d IS NOT NULL GROUP BY doc_id
    )
    SELECT m0.doc_id, m0.n0 AS n_tok,
           {v0} AS activity,
           CASE WHEN {v0} > 0 THEN sqrt({v1} / {v0})
                ELSE 0.0e0 END AS mobility,
           CASE WHEN {v1} > 0 AND {v0} > 0
                     AND sqrt({v1} / {v0}) > 0
                THEN sqrt({v2} / {v1}) / sqrt({v1} / {v0})
                ELSE 0.0e0 END AS complexity
    FROM m0
    JOIN m1 ON m1.doc_id = m0.doc_id
    JOIN m2 ON m2.doc_id = m0.doc_id
    """
    return q, sql


# -------------------------------------------------------------------- source_icc
def _icc_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "ss": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _v, lengths = _flat_tokens(t)
            y = np.asarray(lengths, dtype=np.int64)
            src = np.asarray(t.column("source").to_pylist())
            uk, inv = np.unique(src, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size).astype(np.int64)
            s = np.bincount(
                inv, weights=y, minlength=uk.size).astype(np.int64)
            ss = np.bincount(
                inv, weights=y * y, minlength=uk.size).astype(
                np.int64)
            return pa.table({
                "source": pa.array(uk, type=pa.string()),
                "n": pa.array(n), "s": pa.array(s),
                "ss": pa.array(ss),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [("n", "sum"), ("s", "sum"), ("ss", "sum")])
            return pa.table({
                "source": g.column("source"),
                "n": g.column("n_sum").cast(pa.int64()),
                "s": g.column("s_sum").cast(pa.int64()),
                "ss": g.column("ss_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("source").reset_index(drop=True)
        k = len(a)
        ssb_acc = ssw_acc = gn = gs = gn2 = 0.0
        for r in a.itertuples():
            nf, sf, ssf = float(r.n), float(r.s), float(r.ss)
            cg = sf * sf / nf
            ssb_acc = ssb_acc + cg
            ssw_acc = ssw_acc + (ssf - cg)
            gn = gn + nf
            gs = gs + sf
            gn2 = gn2 + nf * nf
        ssb = ssb_acc - gs * gs / gn
        ssw = ssw_acc
        msb = ssb / float(k - 1)
        msw = ssw / (gn - float(k))
        n0 = (gn - gn2 / gn) / float(k - 1)
        icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
        return pa.table({
            "k_sources": pa.array([k], type=pa.int64()),
            "msb": pa.array([msb], type=pa.float64()),
            "msw": pa.array([msw], type=pa.float64()),
            "n0": pa.array([n0], type=pa.float64()),
            "icc": pa.array([icc], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, d.source,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM len GROUP BY source
    ),
    fold AS (
        SELECT list_reduce(
            list_prepend(
                [0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([CAST(n AS DOUBLE), CAST(s AS DOUBLE),
                      CAST(ss AS DOUBLE)] ORDER BY source)),
            (acc, e) -> [
                acc[1] + e[2] * e[2] / e[1],
                acc[2] + (e[3] - e[2] * e[2] / e[1]),
                acc[3] + e[1],
                acc[4] + e[2],
                acc[5] + e[1] * e[1]]) AS f,
            CAST(count(*) AS BIGINT) AS k
        FROM g
    )
    SELECT k AS k_sources,
           (f[1] - f[4] * f[4] / f[3])
               / CAST(k - 1 AS DOUBLE) AS msb,
           f[2] / (f[3] - CAST(k AS DOUBLE)) AS msw,
           (f[3] - f[5] / f[3]) / CAST(k - 1 AS DOUBLE) AS n0,
           ((f[1] - f[4] * f[4] / f[3]) / CAST(k - 1 AS DOUBLE)
            - f[2] / (f[3] - CAST(k AS DOUBLE)))
           / ((f[1] - f[4] * f[4] / f[3]) / CAST(k - 1 AS DOUBLE)
              + ((f[3] - f[5] / f[3]) / CAST(k - 1 AS DOUBLE)
                 - 1.0e0)
                * (f[2] / (f[3] - CAST(k AS DOUBLE)))) AS icc
    FROM fold
    """
    return q, sql


def build_wave82_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_hjorth",) + _hjorth_query()))
    add(*(("source_icc",) + _icc_query()))
    return queries, oracles
