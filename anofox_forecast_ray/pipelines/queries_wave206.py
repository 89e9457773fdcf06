"""Wave-206 queries: k-sample Anderson-Darling, Zipf-Mandelbrot.

- source_ad_ksample: the Scholz-Stephens (1987) k-sample Anderson-
  Darling test (the midrank/tie-adjusted version scipy's
  anderson_ksamp implements) across all 20 sources' doc lengths.
  With doubled midrank cumulatives everything reduces to integers:
  p_ij = N*(2*cumi_before + h_ij) - n_i*(2*cum_before + h_j),
  den4_j = (2H)(2N - 2H) - N h_j, and
  A2 = (N-1)/N * sum_i (1/n_i) * (1/N) * sum_j h_j p^2 / den4 —
  one division per (sample, value) term, folded in (source, value)
  order from the bounded per-source histogram.
- corpus_zipf_mandelbrot: the two-parameter Zipf-Mandelbrot law
  f_r ~ C/(r+q)^s fit over the top-64 token frequencies: for each
  candidate offset q in 0..15, OLS of ln f on ln(r+q) gives s(q)
  and SSE(q); the reported fit is the SSE-argmin (SSE ASC, q ASC).
  One scalar ln per (rank, q) pair; OLS folds in rank order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from ._scaffold import read_cols

ZM_TOP = 64
ZM_QMAX = 15


def ad_ksample(sources, values, counts):
    """(a2, k, N) from (source, value, count) rows.
    sources/values sorted ascending; fold order (source, value)."""
    import collections

    per = collections.defaultdict(dict)
    for s, v, c in zip(sources, values, counts):
        per[s][v] = int(c)
    srcs = sorted(per)
    allv = sorted({v for s in per for v in per[s]})
    h = {v: sum(per[s].get(v, 0) for s in srcs) for v in allv}
    N = sum(h.values())
    cum_b = {}
    acc = 0
    for v in allv:
        cum_b[v] = acc
        acc += h[v]
    outer = 0.0
    for s in srcs:
        n_i = sum(per[s].values())
        cumi = 0
        inner = 0.0
        for v in allv:
            h_ij = per[s].get(v, 0)
            p = (N * (2 * cumi + h_ij)
                 - n_i * (2 * cum_b[v] + h[v]))
            twoh = 2 * cum_b[v] + h[v]
            den4 = twoh * (2 * N - twoh) - N * h[v]
            if den4 > 0:
                inner = inner + (h[v] * p * p) / den4
            cumi += h_ij
        outer = outer + inner / n_i
    a2 = (N - 1) / N * (outer / N)
    return a2, len(srcs), N


def zm_fit(freqs):
    """freqs: top-64 counts in rank order. Returns
    (best_q, s_exponent, sse)."""
    n = len(freqs)
    ys = [math.log(float(int(f))) for f in freqs]
    best = None
    for qq in range(ZM_QMAX + 1):
        xs = [math.log(float(r + 1 + qq)) for r in range(n)]
        sx = 0.0
        sy = 0.0
        for v in xs:
            sx = sx + v
        for v in ys:
            sy = sy + v
        mx = sx / n
        my = sy / n
        sxy = 0.0
        sxx = 0.0
        for a, b in zip(xs, ys):
            sxy = sxy + (a - mx) * (b - my)
            sxx = sxx + (a - mx) * (a - mx)
        slope = sxy / sxx
        icept = my - slope * mx
        sse = 0.0
        for a, b in zip(xs, ys):
            e = b - (icept + slope * a)
            sse = sse + e * e
        key = (sse, qq)
        if best is None or key < best[0]:
            best = (key, qq, -slope, sse)
    return best[1], best[2], best[3]


# --------------------------------------------------- source_ad_ksample
def _adk_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            import pandas as pd

            df = pd.DataFrame({"s": src, "v": v})
            g = df.groupby(["s", "v"]).size().reset_index(
                name="c")
            return pa.table({
                "s": pa.array(g["s"], type=pa.string()),
                "v": pa.array(g["v"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby(["s", "v"])["c"].sum().reset_index()
            return pa.table({
                "s": pa.array(g["s"], type=pa.string()),
                "v": pa.array(g["v"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values(["s", "v"]).reset_index(drop=True)
        a2, k, N = ad_ksample(list(h["s"]),
                              [int(x) for x in h["v"]],
                              [int(x) for x in h["c"]])
        return pa.table({
            "k_samples": pa.array([k], type=pa.int64()),
            "n_total": pa.array([N], type=pa.int64()),
            "a2_kn": pa.array([a2], type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT source AS s, n_chars AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    vv AS (
        SELECT v, CAST(sum(c) AS BIGINT) AS h,
               CAST(coalesce(sum(sum(c)) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cum_b
        FROM g GROUP BY v
    ),
    nn AS (SELECT CAST(sum(h) AS BIGINT) AS n FROM vv),
    ns AS (
        SELECT s, CAST(sum(c) AS BIGINT) AS n_i FROM g
        GROUP BY s
    ),
    grid AS (
        SELECT ns.s, ns.n_i, vv.v, vv.h, vv.cum_b,
               CAST(coalesce(g.c, 0) AS BIGINT) AS h_ij
        FROM ns CROSS JOIN vv
        LEFT JOIN g ON g.s = ns.s AND g.v = vv.v
    ),
    cums AS (
        SELECT s, n_i, v, h, cum_b, h_ij,
               CAST(coalesce(sum(h_ij) OVER (PARTITION BY s
                    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cumi
        FROM grid
    ),
    terms AS (
        SELECT s, n_i, v, h,
               ((SELECT n FROM nn) * (2 * cumi + h_ij)
                - n_i * (2 * cum_b + h)) AS p,
               (2 * cum_b + h)
                   * (2 * (SELECT n FROM nn)
                      - (2 * cum_b + h))
                   - (SELECT n FROM nn) * h AS den4
        FROM cums
    ),
    innerf AS (
        SELECT s, n_i,
               list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN den4 > 0
                        THEN CAST(h * p * p AS DOUBLE)
                             / CAST(den4 AS DOUBLE)
                        ELSE 0.0e0 END ORDER BY v)),
                   (a, x) -> a + x) AS innr
        FROM terms GROUP BY s, n_i
    ),
    outer_f AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(innr / CAST(n_i AS DOUBLE)
                        ORDER BY s)), (a, x) -> a + x) AS o
        FROM innerf
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ns)
               AS k_samples,
           (SELECT n FROM nn) AS n_total,
           CAST((SELECT n FROM nn) - 1 AS DOUBLE)
               / CAST((SELECT n FROM nn) AS DOUBLE)
               * (outer_f.o
                  / CAST((SELECT n FROM nn) AS DOUBLE))
               AS a2_kn
    FROM outer_f
    """
    return q, sql


# ----------------------------------------------- corpus_zipf_mandelbrot
def _zm_query():
    def q(sf_dir: str):
        from .queries_wave187 import _token_hist

        h = _token_hist(sf_dir)
        h = h.sort_values(["f", "token"],
                          ascending=[False, True])
        freqs = [int(v) for v in h["f"].head(ZM_TOP)]
        qq, s, sse = zm_fit(freqs)
        return pa.table({
            "best_q": pa.array([qq], type=pa.int64()),
            "zm_exponent": pa.array([s], type=pa.float64()),
            "sse": pa.array([sse], type=pa.float64()),
        })

    def per_q(qq):
        return f"""
        SELECT {qq} AS q,
            (SELECT list_reduce(list_prepend(0.0e0,
                list((ln(CAST(r + {qq} AS DOUBLE)) - mx)
                     * (lf - my) ORDER BY r)),
                (a, x) -> a + x)
             FROM tops CROSS JOIN mu{qq}) /
            (SELECT list_reduce(list_prepend(0.0e0,
                list((ln(CAST(r + {qq} AS DOUBLE)) - mx)
                     * (ln(CAST(r + {qq} AS DOUBLE)) - mx)
                     ORDER BY r)),
                (a, x) -> a + x)
             FROM tops CROSS JOIN mu{qq}) AS slope
        """

    # build mu CTEs and SSE per q
    mu_ctes = []
    sse_rows = []
    for qq in range(ZM_QMAX + 1):
        mu_ctes.append(f"""
    mu{qq} AS MATERIALIZED (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(ln(CAST(r + {qq} AS DOUBLE))
                        ORDER BY r)), (a, x) -> a + x)
                   / CAST((SELECT count(*) FROM tops)
                          AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(lf ORDER BY r)), (a, x) -> a + x)
                   / CAST((SELECT count(*) FROM tops)
                          AS DOUBLE) AS my
        FROM tops
    ),
    b{qq} AS MATERIALIZED (
        SELECT mu{qq}.mx, mu{qq}.my,
               list_reduce(list_prepend(0.0e0,
                   list((ln(CAST(r + {qq} AS DOUBLE))
                         - mu{qq}.mx) * (lf - mu{qq}.my)
                        ORDER BY r)), (a, x) -> a + x)
               / list_reduce(list_prepend(0.0e0,
                   list((ln(CAST(r + {qq} AS DOUBLE))
                         - mu{qq}.mx)
                        * (ln(CAST(r + {qq} AS DOUBLE))
                           - mu{qq}.mx)
                        ORDER BY r)), (a, x) -> a + x)
                   AS slope
        FROM tops CROSS JOIN mu{qq}
        GROUP BY mu{qq}.mx, mu{qq}.my
    )""")
        sse_rows.append(f"""
        SELECT CAST({qq} AS BIGINT) AS q,
               -b{qq}.slope AS s_exp,
               (SELECT list_reduce(list_prepend(0.0e0,
                    list((lf - ((b{qq}.my
                                 - b{qq}.slope * b{qq}.mx)
                                + b{qq}.slope
                                  * ln(CAST(r + {qq}
                                       AS DOUBLE))))
                         * (lf - ((b{qq}.my
                                   - b{qq}.slope * b{qq}.mx)
                                  + b{qq}.slope
                                    * ln(CAST(r + {qq}
                                         AS DOUBLE))))
                         ORDER BY r)), (a, x) -> a + x)
                FROM tops) AS sse
        FROM b{qq}""")

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT token, CAST(count(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    tops AS (
        SELECT CAST(row_number() OVER (ORDER BY f DESC,
                    token ASC) AS BIGINT) AS r,
               ln(CAST(f AS DOUBLE)) AS lf
        FROM hist
        QUALIFY r <= {ZM_TOP}
    ),
    {",".join(mu_ctes)},
    cand AS ({" UNION ALL ".join(sse_rows)}),
    pick AS (
        SELECT q, s_exp, sse,
               row_number() OVER (ORDER BY sse ASC, q ASC)
                   AS rk
        FROM cand
    )
    SELECT q AS best_q, s_exp AS zm_exponent, sse
    FROM pick WHERE rk = 1
    """
    return q, sql


def build_wave206_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_ad_ksample",) + _adk_query()))
    add(*(("corpus_zipf_mandelbrot",) + _zm_query()))
    return queries, oracles
