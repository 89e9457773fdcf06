"""Wave-295 query: Benford MAD conformity.

lineitem_benford_mad: Nigrini's forensic-accounting conformity
standard — the mean absolute deviation between the observed
first-digit proportions of extended prices and the Benford
probabilities log10(1 + 1/d), with the published verdict bands
(< 0.006 close, < 0.012 acceptable, < 0.015 marginal, else
nonconforming).  Digit counts are exact integers (first digit via
string extraction, identical on both sides); expected probabilities
are the same ln ratios; the MAD folds over digits 1..9 in order.
Complements events_benford (chi2 on a different table) with the MAD
band diagnostic.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def benford_mad(digit_counts):
    """(n, mad, verdict) from counts[1..9]."""
    n = sum(digit_counts)
    fn = float(n)
    mad = 0.0
    for d in range(1, 10):
        obs = float(digit_counts[d - 1]) / fn
        exp = (math.log(1.0 + 1.0 / float(d))
               / math.log(10.0))
        mad = mad + abs(obs - exp)
    mad = mad / 9.0
    if mad < 0.006:
        verdict = "close"
    elif mad < 0.012:
        verdict = "acceptable"
    elif mad < 0.015:
        verdict = "marginal"
    else:
        verdict = "nonconforming"
    return n, mad, verdict


def _benford_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                          columns=["l_extendedprice"])
        cents = np.round(
            t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
        counts = [0] * 9
        for v in cents:
            s = str(int(v))
            d = int(s[1]) if s[0] == "-" else int(s[0])
            if d > 0:
                counts[d - 1] += 1
        n, mad, verdict = benford_mad(counts)
        return pa.table({
            "n_values": pa.array([n], type=pa.int64()),
            "benford_mad": pa.array([mad], type=pa.float64()),
            "verdict": pa.array([verdict], type=pa.string()),
        })

    sql = """
    WITH vals AS (
        SELECT CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS v
        FROM lineitem
    ),
    digits AS (
        SELECT CAST(substr(CAST(abs(v) AS VARCHAR), 1, 1)
                    AS BIGINT) AS d
        FROM vals
    ),
    h AS (
        SELECT g.d,
               CAST(coalesce(c.n, 0) AS BIGINT) AS cnt
        FROM (SELECT CAST(unnest(generate_series(1, 9))
                          AS BIGINT) AS d) g
        LEFT JOIN (SELECT d, count(*) AS n FROM digits
                   WHERE d > 0 GROUP BY d) c ON g.d = c.d
    ),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
    mad AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list(abs(CAST(cnt AS DOUBLE)
                     / CAST((SELECT n FROM nn) AS DOUBLE)
                     - ln(1.0e0 + 1.0e0 / CAST(d AS DOUBLE))
                       / ln(10.0e0)) ORDER BY d)),
            (a, b) -> a + b) / 9.0e0 AS mad
        FROM h
    )
    SELECT (SELECT n FROM nn) AS n_values,
           mad.mad AS benford_mad,
           CASE WHEN mad.mad < 0.006e0 THEN 'close'
                WHEN mad.mad < 0.012e0 THEN 'acceptable'
                WHEN mad.mad < 0.015e0 THEN 'marginal'
                ELSE 'nonconforming' END AS verdict
    FROM mad
    """
    return q, sql


def build_wave295_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_benford_mad",) + _benford_query()))
    return queries, oracles
