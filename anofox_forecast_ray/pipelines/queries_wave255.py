"""Wave-255 queries: Fligner-Killeen scale test and Elias code costs.

source_fligner_killeen: the median-centered normal-scores scale test
between src0/src1 doc lengths.  Deviations |2x − med2_g| are exact
integers (doubled group medians), pooled doubled midranks feed the
A&S 26.2.23 normal quantile (the repo's quantile_normal, same
rational approximation in SQL as events_ppcc_normality), and every
float sum (scores, squares, group-0 share) is a SEQUENTIAL
list_reduce fold in deviation order.  Completes the scale-test
family: Ansari-Bradley (wave-180), Conover squared-ranks (wave-249),
and now the normal-scores variant.

corpus_elias_code_cost: exact Elias gamma/delta bit costs of the
doc-gap postings list of the RAREST-coverage token — the token with
the minimum document frequency (ties: smallest token id; first gap
= doc_id + 1).  The modal token would be degenerate: the codepoint
corpus's frequent tokens appear in nearly every doc, making every
gap 1; the min-df token is the only selective postings list.  floor(log2 g) is computed
EXACTLY on both sides — bit_length in Python, length(bin(g)) − 1 in
DuckDB — no float logs anywhere.  Completes the codec cost-model
family (varint / DoD / RLE / zlib waves).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK


def _qn(p: float) -> float:
    """A&S 26.2.23 — identical expression to kernels/stats."""
    t = (math.sqrt(-2.0 * math.log(p)) if p < 0.5
         else math.sqrt(-2.0 * math.log(1.0 - p)))
    r = t - (2.515517 + 0.802853 * t + 0.010328 * t * t) / (
        1.0 + 1.432788 * t + 0.189269 * t * t
        + 0.001308 * t * t * t)
    return -r if p < 0.5 else r


def fligner_killeen(c0, c1, vals):
    """(n1, n2, chi2) from per-value counts of the two samples."""
    n1 = sum(c0)
    n2 = sum(c1)
    nn = n1 + n2

    def med2(counts):
        tot = sum(counts)
        lo_i = (tot - 1) // 2
        hi_i = tot // 2
        cum = 0
        lo = hi = None
        for c, v in zip(counts, vals):
            nxt = cum + c
            if lo is None and lo_i < nxt:
                lo = v
            if hi is None and hi_i < nxt:
                hi = v
            cum = nxt
        return lo + hi

    m0 = med2(c0)
    m1 = med2(c1)
    pooled = {}
    for c, v in zip(c0, vals):
        if c:
            u = abs(2 * v - m0)
            e = pooled.setdefault(u, [0, 0])
            e[0] += c
    for c, v in zip(c1, vals):
        if c:
            u = abs(2 * v - m1)
            e = pooled.setdefault(u, [0, 0])
            e[1] += c
    fn = float(nn)
    sa = saa = sag = 0.0
    cum = 0
    for u in sorted(pooled):
        ca, cb = pooled[u]
        cv = ca + cb
        r2 = 2 * cum + cv + 1
        p = 0.5 + float(r2) / (4.0 * (fn + 1.0))
        a = _qn(p)
        sa = sa + float(cv) * a
        saa = saa + float(cv) * (a * a)
        sag = sag + float(ca) * a
        cum += cv
    abar = sa / fn
    v2 = (saa - fn * (abar * abar)) / (fn - 1.0)
    d0 = sag / float(n1) - abar
    d1 = (sa - sag) / float(n2) - abar
    chi2 = (float(n1) * (d0 * d0) + float(n2) * (d1 * d1)) / v2
    return n1, n2, chi2


def elias_costs(gaps):
    """(n, gamma_bits, delta_bits) exact integer code costs."""
    gb = db = 0
    for g in gaps:
        l = g.bit_length() - 1            # floor(log2 g), g >= 1
        gb += 2 * l + 1
        ll = (l + 1).bit_length() - 1     # floor(log2 (l+1))
        db += l + 2 * ll + 1
    return len(gaps), gb, db


# -------------------------------------------- source_fligner_killeen
def _fk_query():
    def q(sf_dir: str):
        from .queries_wave180 import _two_source_hist

        h = _two_source_hist(sf_dir)
        n1, n2, chi2 = fligner_killeen(
            [int(v) for v in h["c0"]], [int(v) for v in h["c1"]],
            [int(v) for v in h["v"]])
        return pa.table({
            "n_a": pa.array([n1], type=pa.int64()),
            "n_b": pa.array([n2], type=pa.int64()),
            "fk_chi2": pa.array([chi2], type=pa.float64()),
        })

    from .queries_wave180 import _SQL_HIST

    qn = """
        CASE WHEN {p} < 0.5e0
             THEN -({t} - (2.515517e0 + 0.802853e0 * {t}
                           + 0.010328e0 * {t} * {t})
                    / (1.0e0 + 1.432788e0 * {t}
                       + 0.189269e0 * {t} * {t}
                       + 0.001308e0 * {t} * {t} * {t}))
             ELSE {t} - (2.515517e0 + 0.802853e0 * {t}
                         + 0.010328e0 * {t} * {t})
                  / (1.0e0 + 1.432788e0 * {t}
                     + 0.189269e0 * {t} * {t}
                     + 0.001308e0 * {t} * {t} * {t}) END
    """
    sql = f"""
    WITH {_SQL_HIST},
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2
        FROM h
    ),
    cums AS (
        SELECT v, c0, c1,
               CAST(coalesce(sum(c0) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS b0,
               CAST(coalesce(sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS b1
        FROM h
    ),
    meds AS (
        SELECT
            (SELECT v FROM cums, nn
             WHERE (nn.n1 - 1) // 2 >= b0
               AND (nn.n1 - 1) // 2 < b0 + c0
             LIMIT 1)
            + (SELECT v FROM cums, nn
               WHERE nn.n1 // 2 >= b0 AND nn.n1 // 2 < b0 + c0
               LIMIT 1) AS m0,
            (SELECT v FROM cums, nn
             WHERE (nn.n2 - 1) // 2 >= b1
               AND (nn.n2 - 1) // 2 < b1 + c1
             LIMIT 1)
            + (SELECT v FROM cums, nn
               WHERE nn.n2 // 2 >= b1 AND nn.n2 // 2 < b1 + c1
               LIMIT 1) AS m1
    ),
    scored AS (
        SELECT abs(2 * h.v - meds.m0) AS u, h.c0 AS ca,
               CAST(0 AS BIGINT) AS cb
        FROM h CROSS JOIN meds WHERE h.c0 > 0
        UNION ALL
        SELECT abs(2 * h.v - meds.m1) AS u,
               CAST(0 AS BIGINT) AS ca, h.c1 AS cb
        FROM h CROSS JOIN meds WHERE h.c1 > 0
    ),
    pooled AS (
        SELECT u, CAST(sum(ca) AS BIGINT) AS ca,
               CAST(sum(ca + cb) AS BIGINT) AS cv
        FROM scored GROUP BY u
    ),
    ranked AS (
        SELECT u, ca, cv,
               2 * CAST(coalesce(sum(cv) OVER (ORDER BY u
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) + cv + 1 AS r2
        FROM pooled
    ),
    sc AS (
        SELECT u, ca, cv,
               {qn.format(p='p', t='t')} AS a
        FROM (
            SELECT u, ca, cv, p,
                   sqrt(-2.0e0 * ln(CASE WHEN p < 0.5e0 THEN p
                                    ELSE 1.0e0 - p END)) AS t
            FROM (
                SELECT u, ca, cv,
                       0.5e0 + CAST(r2 AS DOUBLE)
                           / (4.0e0 * (CAST(nn.n1 + nn.n2
                                            AS DOUBLE) + 1.0e0))
                           AS p
                FROM ranked CROSS JOIN nn
            )
        )
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(cv AS DOUBLE) * a ORDER BY u)),
                (x, y) -> x + y) AS sa,
            list_reduce(list_prepend(0.0e0,
                list(CAST(cv AS DOUBLE) * (a * a) ORDER BY u)),
                (x, y) -> x + y) AS saa,
            list_reduce(list_prepend(0.0e0,
                list(CAST(ca AS DOUBLE) * a ORDER BY u)),
                (x, y) -> x + y) AS sag
        FROM sc
    )
    SELECT nn.n1 AS n_a, nn.n2 AS n_b,
           (CAST(nn.n1 AS DOUBLE)
            * ((folds.sag / CAST(nn.n1 AS DOUBLE)
                - folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE))
               * (folds.sag / CAST(nn.n1 AS DOUBLE)
                  - folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE)))
            + CAST(nn.n2 AS DOUBLE)
              * (((folds.sa - folds.sag) / CAST(nn.n2 AS DOUBLE)
                  - folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE))
                 * ((folds.sa - folds.sag)
                    / CAST(nn.n2 AS DOUBLE)
                    - folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE))))
           / ((folds.saa - CAST(nn.n1 + nn.n2 AS DOUBLE)
               * ((folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE))
                  * (folds.sa / CAST(nn.n1 + nn.n2 AS DOUBLE))))
              / (CAST(nn.n1 + nn.n2 AS DOUBLE) - 1.0e0))
               AS fk_chi2
    FROM folds CROSS JOIN nn
    """
    return q, sql


# -------------------------------------------- corpus_elias_code_cost
def _elias_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        # doc frequency per token (distinct docs), bounded histogram
        def df_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "token": pa.array([], type=pa.int64()),
                "docs": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64)
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            key = np.unique((ids[row_idx] << 21)
                            | values.astype(np.int64))
            return pa.table({
                "token": pa.array(key & ((1 << 21) - 1)),
                "docs": pa.array(key >> 21),
            })

        def df_merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            d = t.to_pandas().drop_duplicates()
            return pa.Table.from_pandas(d, preserve_index=False)

        refs0 = list(
            corpus_ds(sf_dir)
            .map_batches(df_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        pairs = tree_reduce_tables(refs0, df_merge).to_pandas()
        dfc = pairs.groupby("token")["docs"].nunique()
        dfmin = int(dfc.min())
        top_tok = min(int(t) for t, c in dfc.items()
                      if int(c) == dfmin)

        def docs_with(t: pa.Table) -> pa.Table:
            empty = pa.table({"d": pa.array([], type=pa.int64())})
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64)
            row_idx = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            hit = values.astype(np.int64) == top_tok
            return pa.table({
                "d": pa.array(np.unique(ids[row_idx[hit]])),
            })

        def merge(t: pa.Table) -> pa.Table:
            d = np.unique(t.column("d").to_numpy(
                zero_copy_only=False))
            return pa.table({"d": pa.array(d.astype(np.int64))})

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(docs_with, batch_format="pyarrow")
            .to_arrow_refs()
        )
        docs = sorted(int(v) for v in
                      tree_reduce_tables(refs, merge)["d"]
                      .to_pylist())
        gaps = [docs[0] + 1] + [b - a for a, b in
                                zip(docs[:-1], docs[1:])]
        n, gb, db = elias_costs(gaps)
        return pa.table({
            "top_token": pa.array([top_tok], type=pa.int64()),
            "n_gaps": pa.array([n], type=pa.int64()),
            "gamma_bits": pa.array([gb], type=pa.int64()),
            "delta_bits": pa.array([db], type=pa.int64()),
            "gamma_bits_per_gap": pa.array(
                [float(gb) / float(n)], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    freq AS (
        SELECT token, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY token
    ),
    top AS (
        SELECT token FROM freq ORDER BY df ASC, token ASC LIMIT 1
    ),
    docs AS (
        SELECT DISTINCT CAST(doc_id AS BIGINT) AS d
        FROM tok WHERE token = (SELECT token FROM top)
    ),
    gaps AS (
        SELECT CASE WHEN lag(d) OVER (ORDER BY d) IS NULL
                    THEN d + 1
                    ELSE d - lag(d) OVER (ORDER BY d) END AS g
        FROM docs
    ),
    bits AS (
        SELECT g,
               CAST(length(bin(g)) - 1 AS BIGINT) AS l,
               CAST(length(bin(CAST(length(bin(g)) AS BIGINT)))
                    - 1 AS BIGINT) AS ll
        FROM gaps
    )
    SELECT (SELECT CAST(token AS BIGINT) FROM top) AS top_token,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(2 * l + 1) AS BIGINT) AS gamma_bits,
           CAST(sum(l + 2 * ll + 1) AS BIGINT) AS delta_bits,
           CAST(sum(2 * l + 1) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS gamma_bits_per_gap
    FROM bits
    """
    return q, sql


def build_wave255_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_fligner_killeen",) + _fk_query()))
    add(*(("corpus_elias_code_cost",) + _elias_query()))
    return queries, oracles
