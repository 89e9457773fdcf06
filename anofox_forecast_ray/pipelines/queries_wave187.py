"""Wave-187 queries: AMS F2 sketch, linear counting.

Sketch-family completion (joins HLL, KMV, CMS, Bloom, quantile
sketch) over the token frequency distribution:

- corpus_ams_f2: the Alon-Matias-Szegedy second-frequency-moment
  sketch — K=8 estimators, each Y_k = sum_t s_k(t) * f_t with a
  sha256-derived +-1 sign per (token, k); the estimate is the median
  of Y_k^2. Against the bounded codepoint histogram both Y_k and the
  exact F2 = sum f_t^2 are pure int64; the even-rank median is
  (4th+5th)/2 — one division. Reports the sketch's relative error.
- corpus_linear_counting: Whang's linear-counting distinct estimator
  — hash every distinct token into an m=1024-bit bitmap; with V =
  fraction of zero bits, est = -m * ln(V). Occupancy is an exact
  integer count of distinct sha-derived bit indices; one ln.

Both use the proven cross-engine hash identity: DuckDB
CAST(concat('0x', substr(sha256(s),1,H)) AS BIGINT) ==
int(hashlib.sha256(s.encode()).hexdigest()[:H], 16).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks

K_EST = 8
LC_M = 1024


def ams_sign(token: int, k: int) -> int:
    h = hashlib.sha256(f"{token}|{k}".encode()).hexdigest()
    return 1 if int(h[:1], 16) % 2 == 0 else -1


def lc_bit(token: int) -> int:
    h = hashlib.sha256(f"{token}".encode()).hexdigest()
    return int(h[:12], 16) % LC_M


def _token_hist(sf_dir: str):
    """Merged (token, f) histogram of the codepoint corpus."""
    from .queries import corpus_ds
    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        toks = t.column("tokens")
        flat = toks.combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(flat, return_counts=True)
        return pa.table({
            "token": pa.array(uk),
            "f": pa.array(cnt.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("f", "sum")])
        return pa.table({
            "token": g.column("token").cast(pa.int64()),
            "f": g.column("f_sum").cast(pa.int64()),
        })

    refs = list(
        corpus_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    h = tree_reduce_tables(refs, merge).to_pandas()
    return h.sort_values("token").reset_index(drop=True)


# ----------------------------------------------------------- corpus_ams_f2
def _ams_query():
    def q(sf_dir: str):
        h = _token_hist(sf_dir)
        tok = h["token"].to_numpy(np.int64)
        f = h["f"].to_numpy(np.int64)
        f2 = int((f * f).sum())
        ests = []
        for k in range(K_EST):
            y = 0
            for t, ft in zip(tok, f):
                y += ams_sign(int(t), k) * int(ft)
            ests.append(y * y)
        ests.sort()
        med = (ests[K_EST // 2 - 1] + ests[K_EST // 2]) / 2
        rel = (med - f2) / f2
        return pa.table({
            "f2_exact": pa.array([f2], type=pa.int64()),
            "ams_median": pa.array([med], type=pa.float64()),
            "rel_err": pa.array([rel], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    hist AS (
        SELECT token, CAST(count(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    ks AS (
        SELECT CAST(unnest(generate_series(0, {K_EST - 1}))
                    AS BIGINT) AS k
    ),
    signs AS (
        SELECT ks.k, hist.f,
               CASE WHEN CAST(concat('0x',
                        substr(sha256(CAST(hist.token AS VARCHAR)
                               || '|' || CAST(ks.k AS VARCHAR)),
                               1, 1)) AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM hist CROSS JOIN ks
    ),
    ys AS (
        SELECT k, CAST(sum(s * f) AS BIGINT) AS y
        FROM signs GROUP BY k
    ),
    ests AS (
        SELECT y * y AS est,
               row_number() OVER (ORDER BY y * y) AS rk
        FROM ys
    ),
    med AS (
        SELECT CAST((SELECT est FROM ests WHERE rk = {K_EST // 2})
                    + (SELECT est FROM ests
                       WHERE rk = {K_EST // 2 + 1})
                    AS DOUBLE) / 2.0e0 AS m
        FROM (SELECT 1)
    ),
    ex AS (
        SELECT CAST(sum(f * f) AS BIGINT) AS f2 FROM hist
    )
    SELECT ex.f2 AS f2_exact, med.m AS ams_median,
           (med.m - CAST(ex.f2 AS DOUBLE))
               / CAST(ex.f2 AS DOUBLE) AS rel_err
    FROM ex CROSS JOIN med
    """
    return q, sql


# ------------------------------------------------ corpus_linear_counting
def _linear_counting_query():
    def q(sf_dir: str):
        h = _token_hist(sf_dir)
        tok = h["token"].to_numpy(np.int64)
        d_exact = int(tok.size)
        bits = {lc_bit(int(t)) for t in tok}
        occ = len(bits)
        import math

        v = (LC_M - occ) / LC_M
        est = -float(LC_M) * math.log(v)
        return pa.table({
            "exact_distinct": pa.array([d_exact], type=pa.int64()),
            "n_occupied": pa.array([occ], type=pa.int64()),
            "lc_estimate": pa.array([float(est)],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    dt AS (SELECT DISTINCT token FROM tok),
    bits AS (
        SELECT DISTINCT
               CAST(concat('0x', substr(sha256(
                   CAST(token AS VARCHAR)), 1, 12)) AS BIGINT)
               % {LC_M} AS b
        FROM dt
    ),
    s AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM dt) AS d,
               (SELECT CAST(count(*) AS BIGINT) FROM bits) AS occ
        FROM (SELECT 1)
    )
    SELECT d AS exact_distinct, occ AS n_occupied,
           -CAST({LC_M} AS DOUBLE)
               * ln(CAST({LC_M} - occ AS DOUBLE)
                    / CAST({LC_M} AS DOUBLE)) AS lc_estimate
    FROM s
    """
    return q, sql


def build_wave187_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_ams_f2",) + _ams_query()))
    add(*(("corpus_linear_counting",) + _linear_counting_query()))
    return queries, oracles
