"""Wave-247 queries: forecast rationality and source-overlap indices.

events_mincer_zarnowitz: the Mincer-Zarnowitz (1969) rationality
regression y_t = a + b·f_t + e for the seasonal-naive (lag-7)
forecast of daily error counts, with the joint F test of
(a,b) = (0,1).  Everything reduces to six exact integer sums — the
restricted RSS is literally Σ(y−f)², an integer — so a, b and F are
three identical float expressions on both sides.

source_overlap_matrix: Bray-Curtis dissimilarity and Morisita-Horn
similarity between every pair of source unigram (codepoint)
distributions.  Σmin(c1,c2), Σc1·c2 and Σc² are exact integers from
the bounded per-source histogram (the wave-70 JSD partial/tree-reduce
shape: only (source, token, cnt) rows ever shuffle); each pair emits
two one-division floats.  Complements source_jsd_matrix /
source_vocab_jaccard with the abundance-weighted ecology indices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds

US_PER_DAY = 86_400_000_000


def mincer_zarnowitz(y):
    """(n, alpha, beta, f_joint) for the lag-7 forecast."""
    pairs = [(y[t - 7], y[t]) for t in range(7, len(y))]
    n = len(pairs)
    sx = sum(f for f, _ in pairs)
    sy = sum(v for _, v in pairs)
    sxx = sum(f * f for f, _ in pairs)
    syy = sum(v * v for _, v in pairs)
    sxy = sum(f * v for f, v in pairs)
    rss_r = sum((v - f) ** 2 for f, v in pairs)
    fm = float(n)
    sxx_c = n * sxx - sx * sx
    syy_c = n * syy - sy * sy
    sxy_c = n * sxy - sx * sy
    beta = float(sxy_c) / float(sxx_c)
    alpha = (float(sy) - beta * float(sx)) / fm
    rss_u = (float(syy_c)
             - float(sxy_c) * float(sxy_c) / float(sxx_c)) / fm
    f_joint = ((float(rss_r) - rss_u) / 2.0) / (rss_u / (fm - 2.0))
    return n, alpha, beta, f_joint


def _src_token_hist(sf_dir: str):
    """Per-(source, token) counts — bounded histogram, tree-reduced."""
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

    refs = list(
        corpus_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    h = tree_reduce_tables(refs, merge).to_pandas()
    return h.sort_values(["source", "token"]).reset_index(drop=True)


def overlap_indices(h1: dict, h2: dict):
    """(bray_curtis, morisita_horn) from two token->count dicts."""
    n1 = sum(h1.values())
    n2 = sum(h2.values())
    smin = sum(min(c, h2[t]) for t, c in h1.items() if t in h2)
    s12 = sum(c * h2[t] for t, c in h1.items() if t in h2)
    sq1 = sum(c * c for c in h1.values())
    sq2 = sum(c * c for c in h2.values())
    bc = 1.0 - float(2 * smin) / float(n1 + n2)
    mh = (float(2 * s12)
          / ((float(sq1) / (float(n1) * float(n1))
              + float(sq2) / (float(n2) * float(n2)))
             * float(n1) * float(n2)))
    return bc, mh


# ------------------------------------------- events_mincer_zarnowitz
def _mz_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, alpha, beta, f_joint = mincer_zarnowitz(
            [int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "mz_alpha": pa.array([alpha], type=pa.float64()),
            "mz_beta": pa.array([beta], type=pa.float64()),
            "mz_f": pa.array([f_joint], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    lagged AS (
        SELECT y, lag(y, 7) OVER (ORDER BY day) AS f FROM d
    ),
    pairs AS (SELECT f, y FROM lagged WHERE f IS NOT NULL),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(f) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(f * f) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(f * y) AS BIGINT) AS sxy,
               CAST(sum((y - f) * (y - f)) AS BIGINT) AS rss_r
        FROM pairs
    ),
    c AS (
        SELECT n, sx, sy, rss_r,
               n * sxx - sx * sx AS sxx_c,
               n * syy - sy * sy AS syy_c,
               n * sxy - sx * sy AS sxy_c,
               CAST(n AS DOUBLE) AS fm
        FROM s
    ),
    f2 AS (
        SELECT n, fm, rss_r,
               CAST(sxy_c AS DOUBLE) / CAST(sxx_c AS DOUBLE)
                   AS beta,
               (CAST(syy_c AS DOUBLE)
                - CAST(sxy_c AS DOUBLE) * CAST(sxy_c AS DOUBLE)
                  / CAST(sxx_c AS DOUBLE)) / fm AS rss_u,
               CAST(sy AS DOUBLE) AS fsy,
               CAST(sx AS DOUBLE) AS fsx
        FROM c
    )
    SELECT n AS n_obs,
           (fsy - beta * fsx) / fm AS mz_alpha,
           beta AS mz_beta,
           ((CAST(rss_r AS DOUBLE) - rss_u) / 2.0)
               / (rss_u / (fm - 2.0)) AS mz_f
    FROM f2
    """
    return q, sql


# --------------------------------------------- source_overlap_matrix
def _overlap_query():
    def q(sf_dir: str):
        h = _src_token_hist(sf_dir)
        hists = {}
        for src, grp in h.groupby("source", sort=True):
            hists[src] = dict(zip(
                [int(v) for v in grp["token"]],
                [int(v) for v in grp["cnt"]]))
        sources = sorted(hists)
        out = {"s1": [], "s2": [], "bray_curtis": [],
               "morisita_horn": []}
        for i, s1 in enumerate(sources):
            for s2 in sources[i + 1:]:
                bc, mh = overlap_indices(hists[s1], hists[s2])
                out["s1"].append(s1)
                out["s2"].append(s2)
                out["bray_curtis"].append(bc)
                out["morisita_horn"].append(mh)
        return pa.table({
            "s1": pa.array(out["s1"], type=pa.string()),
            "s2": pa.array(out["s2"], type=pa.string()),
            "bray_curtis": pa.array(out["bray_curtis"],
                                    type=pa.float64()),
            "morisita_horn": pa.array(out["morisita_horn"],
                                      type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    ),
    totals AS (
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(cnt * cnt) AS BIGINT) AS sq
        FROM hist GROUP BY source
    ),
    prs AS (
        SELECT a.source AS s1, b.source AS s2,
               a.n AS n1, b.n AS n2, a.sq AS sq1, b.sq AS sq2
        FROM totals a JOIN totals b ON a.source < b.source
    ),
    inner_sums AS (
        SELECT a.source AS s1, b.source AS s2,
               CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS smin,
               CAST(sum(a.cnt * b.cnt) AS BIGINT) AS s12
        FROM hist a JOIN hist b
          ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT p.s1, p.s2,
           1.0 - CAST(2 * coalesce(i.smin, 0) AS DOUBLE)
                 / CAST(p.n1 + p.n2 AS DOUBLE) AS bray_curtis,
           CAST(2 * coalesce(i.s12, 0) AS DOUBLE)
           / ((CAST(p.sq1 AS DOUBLE)
               / (CAST(p.n1 AS DOUBLE) * CAST(p.n1 AS DOUBLE))
               + CAST(p.sq2 AS DOUBLE)
                 / (CAST(p.n2 AS DOUBLE) * CAST(p.n2 AS DOUBLE)))
              * CAST(p.n1 AS DOUBLE) * CAST(p.n2 AS DOUBLE))
               AS morisita_horn
    FROM prs p LEFT JOIN inner_sums i
      ON p.s1 = i.s1 AND p.s2 = i.s2
    ORDER BY p.s1, p.s2
    """
    return q, sql


def build_wave247_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mincer_zarnowitz",) + _mz_query()))
    add(*(("source_overlap_matrix",) + _overlap_query()))
    return queries, oracles
