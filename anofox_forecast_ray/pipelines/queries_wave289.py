"""Wave-289 query: ANOSIM over part price distances.

part_brand_anosim: Clarke's (1993) analysis of similarities — do
within-brand part price distances rank smaller than between-brand
ones?  All C(n,2) pairwise distances are exact integers
|cents_i − cents_j|; the pooled distance histogram carries
(within, total) counts per distinct distance, doubled midranks keep
rank sums integer (HUGEINT-sized), and
R = (r̄_between − r̄_within)/(M/2) is three float divisions.
R ∈ [−1, 1], ≈ 0 under no brand structure (checked by a label
permutation in the independent harness).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def anosim(cents, labels):
    """(n, m_pairs, r) from id-ordered int values + labels."""
    n = len(cents)
    c = np.asarray(cents, dtype=np.int64)
    lab = np.asarray(labels)
    iu, ju = np.triu_indices(n, k=1)
    d = np.abs(c[iu] - c[ju])
    within = lab[iu] == lab[ju]
    vals, inv = np.unique(d, return_inverse=True)
    tot = np.bincount(inv, minlength=vals.size)
    win = np.bincount(inv[within], minlength=vals.size)
    m = int(tot.sum())
    nw = int(win.sum())
    nb = m - nw
    cum = 0
    sw2 = sb2 = 0
    for k in range(vals.size):
        cv = int(tot[k])
        r2 = 2 * cum + cv + 1
        w = int(win[k])
        sw2 += w * r2
        sb2 += (cv - w) * r2
        cum += cv
    rw = float(sw2) / (2.0 * float(nw))
    rb = float(sb2) / (2.0 * float(nb))
    r = (rb - rw) / (float(m) / 2.0)
    return n, m, nw, r


def _anosim_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_retailprice"])
        order = np.argsort(
            np.asarray(t.column("p_partkey").to_pylist()))
        cents = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)[order]
        brand = np.asarray(t.column("p_brand").to_pylist())[order]
        n, m, nw, r = anosim(cents.tolist(), brand.tolist())
        return pa.table({
            "n_parts": pa.array([n], type=pa.int64()),
            "n_pairs": pa.array([m], type=pa.int64()),
            "n_within": pa.array([nw], type=pa.int64()),
            "anosim_r": pa.array([r], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT p_partkey AS pk, p_brand AS b,
               CAST(round_even(p_retailprice * 100, 0) AS BIGINT)
                   AS y
        FROM part
    ),
    prs AS (
        SELECT abs(a.y - b_.y) AS d,
               CASE WHEN a.b = b_.b THEN 1 ELSE 0 END AS w
        FROM base a JOIN base b_ ON b_.pk > a.pk
    ),
    h AS (
        SELECT d, CAST(count(*) AS BIGINT) AS cv,
               CAST(sum(w) AS BIGINT) AS cw
        FROM prs GROUP BY d
    ),
    ranked AS (
        SELECT cv, cw,
               2 * CAST(coalesce(sum(cv) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) + cv + 1
                   AS r2
        FROM h
    ),
    s AS (
        SELECT CAST(sum(cv) AS BIGINT) AS m,
               CAST(sum(cw) AS BIGINT) AS nw,
               CAST(sum(CAST(cw AS HUGEINT) * r2) AS HUGEINT)
                   AS sw2,
               CAST(sum(CAST(cv - cw AS HUGEINT) * r2)
                    AS HUGEINT) AS sb2
        FROM ranked
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM base)
               AS n_parts,
           m AS n_pairs,
           nw AS n_within,
           (CAST(sb2 AS DOUBLE) / (2.0 * CAST(m - nw AS DOUBLE))
            - CAST(sw2 AS DOUBLE) / (2.0 * CAST(nw AS DOUBLE)))
           / (CAST(m AS DOUBLE) / 2.0) AS anosim_r
    FROM s
    """
    return q, sql


def build_wave289_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("part_brand_anosim",) + _anosim_query()))
    return queries, oracles
