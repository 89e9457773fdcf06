"""Wave-270 queries: stochastic dominance / ASO and half-sample mode.

source_stochastic_dominance: first-order stochastic dominance audit
between src0/src1 doc lengths plus the Almost-Stochastic-Order
violation ratio ε (Dror et al. 2019, the deep-learning model-
comparison statistic): on the pooled value grid the CDF gap
cross-multiplies to d_v = n2·cum1 − n1·cum2 (exact integer), the
step-width-weighted positive/negative masses W± are exact integers,
and ε = W⁻/(W⁺+W⁻) with one division (ε≈0 ⇒ src0 ≾ src1; ε≈0.5 ⇒
no order).  FOSD holds iff one of the masses is zero.

part_mode_hsm: the half-sample mode (Bickel 2002 HSM) of part retail
prices in exact cents — recursively take the shortest window
containing ceil(m/2) of the current points (ties → leftmost), stop
at m ≤ 2, report the doubled midpoint.  Every comparison is integer,
so the recursion path is bitwise deterministic; the SQL replays it
as a recursive CTE over the rank-indexed sorted array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stochastic_dominance(c0, c1, vals):
    """(n1, n2, frac_steps_ge, w_pos, w_neg, aso_eps)."""
    n1 = sum(c0)
    n2 = sum(c1)
    cum1 = cum2 = 0
    w_pos = w_neg = 0
    ge = 0
    steps = 0
    for k in range(len(vals) - 1):
        cum1 += c0[k]
        cum2 += c1[k]
        d = n2 * cum1 - n1 * cum2
        width = vals[k + 1] - vals[k]
        if d >= 0:
            ge += 1
            w_pos += d * width
        else:
            w_neg += (-d) * width
        steps += 1
    tot = w_pos + w_neg
    eps = 0.5 if tot == 0 else float(w_neg) / float(tot)
    return (n1, n2, float(ge) / float(steps), w_pos, w_neg, eps)


def half_sample_mode(vals):
    """(mode2, depth) — doubled HSM over sorted ints."""
    v = sorted(vals)
    lo, m = 0, len(v)
    depth = 0
    while m > 2:
        k = (m + 1) // 2
        best = None
        for i in range(lo, lo + m - k + 1):
            w = v[i + k - 1] - v[i]
            if best is None or w < best[0]:
                best = (w, i)          # ascending i: leftmost tie
        lo, m = best[1], k
        depth += 1
    mode2 = v[lo] + v[lo + m - 1]
    return mode2, depth


# ----------------------------------------- source_stochastic_dominance
def _sd_query():
    def q(sf_dir: str):
        from .queries_wave180 import _two_source_hist

        h = _two_source_hist(sf_dir)
        n1, n2, frac, wp, wn, eps = stochastic_dominance(
            [int(v) for v in h["c0"]], [int(v) for v in h["c1"]],
            [int(v) for v in h["v"]])
        return pa.table({
            "n_a": pa.array([n1], type=pa.int64()),
            "n_b": pa.array([n2], type=pa.int64()),
            "frac_ge": pa.array([frac], type=pa.float64()),
            "w_pos": pa.array([wp], type=pa.int64()),
            "w_neg": pa.array([wn], type=pa.int64()),
            "aso_eps": pa.array([eps], type=pa.float64()),
        })

    from .queries_wave180 import _SQL_HIST

    sql = f"""
    WITH {_SQL_HIST},
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2
        FROM h
    ),
    w AS (
        SELECT v, c0, c1,
               lead(v) OVER (ORDER BY v) AS nv,
               CAST(sum(c0) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
               CAST(sum(c1) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
        FROM h
    ),
    steps AS (
        SELECT (SELECT n2 FROM nn) * cum1
               - (SELECT n1 FROM nn) * cum2 AS d,
               nv - v AS width
        FROM w WHERE nv IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS steps,
               CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ge,
               CAST(sum(CASE WHEN d >= 0 THEN d * width
                             ELSE 0 END) AS BIGINT) AS w_pos,
               CAST(sum(CASE WHEN d < 0 THEN -d * width
                             ELSE 0 END) AS BIGINT) AS w_neg
        FROM steps
    )
    SELECT nn.n1 AS n_a, nn.n2 AS n_b,
           CAST(agg.ge AS DOUBLE) / CAST(agg.steps AS DOUBLE)
               AS frac_ge,
           agg.w_pos, agg.w_neg,
           CASE WHEN agg.w_pos + agg.w_neg = 0 THEN 0.5
                ELSE CAST(agg.w_neg AS DOUBLE)
                     / CAST(agg.w_pos + agg.w_neg AS DOUBLE) END
               AS aso_eps
    FROM agg CROSS JOIN nn
    """
    return q, sql


# --------------------------------------------------- part_mode_hsm
def _hsm_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_retailprice"])
        cents = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        mode2, depth = half_sample_mode([int(v) for v in cents])
        return pa.table({
            "mode2": pa.array([mode2], type=pa.int64()),
            "mode_cents": pa.array([float(mode2) / 2.0],
                                   type=pa.float64()),
            "depth": pa.array([depth], type=pa.int64()),
        })

    sql = """
    WITH RECURSIVE sorted_v AS (
        SELECT CAST(round_even(p_retailprice * 100, 0) AS BIGINT)
                   AS x,
               row_number() OVER (
                   ORDER BY CAST(round_even(p_retailprice * 100, 0)
                                 AS BIGINT)) AS rk
        FROM part
    ),
    r AS (
        SELECT CAST(1 AS BIGINT) AS lo,
               (SELECT CAST(count(*) AS BIGINT) FROM sorted_v)
                   AS m,
               CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT (SELECT a.rk FROM sorted_v a JOIN sorted_v b
                ON b.rk = a.rk + (r.m + 1) // 2 - 1
                WHERE a.rk >= r.lo
                  AND a.rk <= r.lo + r.m - (r.m + 1) // 2
                ORDER BY b.x - a.x ASC, a.rk ASC LIMIT 1),
               (r.m + 1) // 2,
               r.depth + 1
        FROM r WHERE r.m > 2
    ),
    last AS (
        SELECT lo, m, depth FROM r ORDER BY depth DESC LIMIT 1
    )
    SELECT (SELECT x FROM sorted_v WHERE rk = last.lo)
           + (SELECT x FROM sorted_v
              WHERE rk = last.lo + last.m - 1) AS mode2,
           CAST((SELECT x FROM sorted_v WHERE rk = last.lo)
                + (SELECT x FROM sorted_v
                   WHERE rk = last.lo + last.m - 1) AS DOUBLE)
               / 2.0 AS mode_cents,
           last.depth AS depth
    FROM last
    """
    return q, sql


def build_wave270_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_stochastic_dominance",) + _sd_query()))
    add(*(("part_mode_hsm",) + _hsm_query()))
    return queries, oracles
