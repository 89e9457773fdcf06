"""Wave-271 queries: categorical forecast skill and MDL order choice.

events_forecast_skill_2x2: the weather-verification skill scores for
the seasonal-naive DIRECTION forecast of daily errors (predict
up/down at t from the t−7 vs t−8 move): Peirce PSS = POD − POFD,
Heidke HSS, and the Gilbert skill score (equitable threat score) —
all from the four integer contingency cells, each score a short
identical float expression.  Completes the directional-evaluation
pair with events_pesaran_timmermann.

corpus_mdl_order_selection: two-part MDL model selection between the
order-0 and order-1 token models of the within-doc chain:
L_m = (params_m/2)·log2 N + N·H_m/ln 2 bits, with H0 the unigram
entropy and H1 the bigram conditional entropy, both SEQUENTIAL
−p·ln p folds over bounded integer histograms (bigram marginals
derived from the same windows).  Emits both code lengths and the
winner — the information-criterion companion of
corpus_markov_order_g2.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def skill_2x2(y):
    """(n, hits, misses, false_alarms, corr_neg, pss, hss, ets)."""
    a = b = c = d = 0
    for t in range(8, len(y)):
        act = 1 if y[t] > y[t - 1] else 0
        fc = 1 if y[t - 7] > y[t - 8] else 0
        if fc == 1 and act == 1:
            a += 1
        elif fc == 1:
            b += 1
        elif act == 1:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    pss = (float(a) / float(a + c)) - (float(b) / float(b + d))
    hss = (2.0 * float(a * d - b * c)
           / float((a + c) * (c + d) + (a + b) * (b + d)))
    a_r = float((a + b) * (a + c)) / float(n)
    ets = (float(a) - a_r) / (float(a + b + c) - a_r)
    return n, a, c, b, d, pss, hss, ets


def mdl_order(uni, bi):
    """(l0_bits, l1_bits, winner) from unigram {a:n} over bigram
    windows and bigram {(a,b): n} counts."""
    n = sum(bi.values())
    k = len(uni)
    fn = float(n)
    ln2 = math.log(2.0)
    h0 = 0.0
    for aa in sorted(uni):
        p = float(uni[aa]) / fn
        h0 = h0 + (-(p * math.log(p)))
    h1 = 0.0
    for key in sorted(bi):
        aa, bb = key
        nab = bi[key]
        h1 = h1 + (-(float(nab) / fn)
                   * math.log(float(nab) / float(uni[aa])))
    log2n = math.log(fn) / ln2
    l0 = (float(k - 1) / 2.0) * log2n + fn * (h0 / ln2)
    l1 = ((float(k) * float(k - 1)) / 2.0) * log2n \
        + fn * (h1 / ln2)
    winner = "order1" if l1 < l0 else "order0"
    return l0, l1, winner


# ------------------------------------------- events_forecast_skill_2x2
def _skill_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, a, c, b, d, pss, hss, ets = skill_2x2(
            [int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "hits": pa.array([a], type=pa.int64()),
            "misses": pa.array([c], type=pa.int64()),
            "false_alarms": pa.array([b], type=pa.int64()),
            "corr_neg": pa.array([d], type=pa.int64()),
            "pss": pa.array([pss], type=pa.float64()),
            "hss": pa.array([hss], type=pa.float64()),
            "ets": pa.array([ets], type=pa.float64()),
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
    d0 AS (
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    lagged AS (
        SELECT CASE WHEN y > lag(y, 1) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS act,
               CASE WHEN lag(y, 7) OVER (ORDER BY day)
                         > lag(y, 8) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS fc,
               lag(y, 8) OVER (ORDER BY day) AS guard
        FROM d0
    ),
    cells AS (
        SELECT
            CAST(sum(CASE WHEN fc = 1 AND act = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(sum(CASE WHEN fc = 1 AND act = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(sum(CASE WHEN fc = 0 AND act = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN fc = 0 AND act = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM lagged WHERE guard IS NOT NULL
    )
    SELECT a + b + c + d AS n_obs,
           a AS hits, c AS misses, b AS false_alarms,
           d AS corr_neg,
           (CAST(a AS DOUBLE) / CAST(a + c AS DOUBLE))
           - (CAST(b AS DOUBLE) / CAST(b + d AS DOUBLE)) AS pss,
           2.0 * CAST(a * d - b * c AS DOUBLE)
           / CAST((a + c) * (c + d) + (a + b) * (b + d)
                  AS DOUBLE) AS hss,
           (CAST(a AS DOUBLE)
            - CAST((a + b) * (a + c) AS DOUBLE)
              / CAST(a + b + c + d AS DOUBLE))
           / (CAST(a + b + c AS DOUBLE)
              - CAST((a + b) * (a + c) AS DOUBLE)
                / CAST(a + b + c + d AS DOUBLE)) AS ets
    FROM cells
    """
    return q, sql


# ---------------------------------------- corpus_mdl_order_selection
def _mdl_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size < 2:
                return empty
            row = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            v = values.astype(np.int64)
            ok = row[:-1] == row[1:]
            key = (v[:-1][ok] << 21) | v[1:][ok]
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "key": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate([("cnt", "sum")])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        mask = (1 << 21) - 1
        bi = {}
        uni = {}
        for kk, nn in zip(h["key"].astype(int),
                          h["cnt"].astype(int)):
            aa, bb = kk >> 21, kk & mask
            bi[(aa, bb)] = int(nn)
            uni[aa] = uni.get(aa, 0) + int(nn)
        l0, l1, winner = mdl_order(uni, bi)
        return pa.table({
            "l0_bits": pa.array([l0], type=pa.float64()),
            "l1_bits": pa.array([l1], type=pa.float64()),
            "winner": pa.array([winner], type=pa.string()),
        })

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    bi AS (
        SELECT token AS a,
               lead(token) OVER (PARTITION BY doc_id
                                 ORDER BY pos) AS b
        FROM tok
    ),
    h AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS n
        FROM bi WHERE b IS NOT NULL GROUP BY a, b
    ),
    uni AS (
        SELECT a, CAST(sum(n) AS BIGINT) AS na
        FROM h GROUP BY a
    ),
    nn AS (
        SELECT CAST(sum(n) AS BIGINT) AS n,
               (SELECT CAST(count(*) AS BIGINT) FROM uni) AS k
        FROM h
    ),
    h0 AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list(-(CAST(na AS DOUBLE) / CAST(nn.n AS DOUBLE)
                   * ln(CAST(na AS DOUBLE)
                        / CAST(nn.n AS DOUBLE)))
                 ORDER BY a)), (x, y) -> x + y) AS h0
        FROM uni CROSS JOIN nn GROUP BY nn.n
    ),
    h1 AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list(-(CAST(h.n AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(h.n AS DOUBLE)
                      / CAST(uni.na AS DOUBLE))
                 ORDER BY h.a, h.b)), (x, y) -> x + y) AS h1
        FROM h JOIN uni ON h.a = uni.a
        CROSS JOIN nn GROUP BY nn.n
    ),
    f AS (
        SELECT CAST(nn.n AS DOUBLE) AS fn,
               CAST(nn.k AS DOUBLE) AS fk,
               ln(CAST(nn.n AS DOUBLE)) / ln(2.0e0) AS log2n,
               h0.h0, h1.h1
        FROM nn CROSS JOIN h0 CROSS JOIN h1
    )
    SELECT (fk - 1.0) / 2.0 * log2n
               + fn * (h0 / ln(2.0e0)) AS l0_bits,
           (fk * (fk - 1.0)) / 2.0 * log2n
               + fn * (h1 / ln(2.0e0)) AS l1_bits,
           CASE WHEN (fk * (fk - 1.0)) / 2.0 * log2n
                     + fn * (h1 / ln(2.0e0))
                     < (fk - 1.0) / 2.0 * log2n
                       + fn * (h0 / ln(2.0e0))
                THEN 'order1' ELSE 'order0' END AS winner
    FROM f
    """
    return q, sql


def build_wave271_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_forecast_skill_2x2",) + _skill_query()))
    add(*(("corpus_mdl_order_selection",) + _mdl_query()))
    return queries, oracles
