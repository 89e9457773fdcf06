"""Wave-180 queries: Ansari-Bradley scale test, Cliff's delta.

- source_ansari_bradley: the classic nonparametric test for a SCALE
  difference between two samples (src0 vs src1 doc lengths). Scores
  count in from both ends, a_i = min(i, N+1-i); ties take the block
  average. Everything is derived EXACTLY from the bounded pooled
  (value -> c0, c1) histogram: a tie block occupying ranks l..r has
  integer score-sum S = T(r) - T(l-1) with the closed form
  T(k) = k(k+1)/2 below the midpoint and T_N - (N-k)(N-k+1)/2 above
  (score symmetry a_i = a_{N+1-i}); the statistic folds
  c0_v * S_v / c_v in value order, the tie-corrected variance uses
  Q = sum S_v^2 / c_v. One integer product + one division per block.
- source_cliffs_delta: the ordinal effect size delta =
  (#{x>y} - #{x<y}) / (n1*n2) for the same two samples — pure
  integer dominance counts from the same histogram (cumulative
  counts of the other sample), one final division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

SRC_A = "src0"
SRC_B = "src1"


def _t_scores(k: int, n: int, tn: int) -> int:
    """Integer sum of Ansari-Bradley scores for ranks 1..k of N."""
    if k <= (n + 1) // 2:
        return k * (k + 1) // 2
    return tn - (n - k) * (n - k + 1) // 2


def _tn_scores(n: int) -> int:
    """Total Ansari-Bradley score sum over N ranks."""
    if n % 2 == 0:
        return (n // 2) * (n // 2 + 1)
    return ((n + 1) // 2) ** 2


def ab_from_hist(c0: np.ndarray, c1: np.ndarray):
    """(ab_stat, z) from per-value counts sorted ascending by value.

    Folds run in value order; each term is an exact integer ratio
    rounded once (int product / int count), matching the SQL oracle's
    list_reduce fold term-for-term.
    """
    cv = c0 + c1
    n1 = int(c0.sum())
    n2 = int(c1.sum())
    n = n1 + n2
    tn = _tn_scores(n)
    cum = np.cumsum(cv)
    ab = 0.0
    q = 0.0
    for i in range(len(cv)):
        r = int(cum[i])
        c = int(cv[i])
        s = _t_scores(r, n, tn) - _t_scores(r - c, n, tn)
        ab = ab + (int(c0[i]) * s) / c
        q = q + (s * s) / c
    e = (n1 * tn) / n
    num = n * q - float(tn * tn)
    var = (n1 * n2) * num / (n * n * (n - 1))
    z = (ab - e) / np.sqrt(var)
    return n1, n2, ab, float(z)


def cliffs_from_hist(c0: np.ndarray, c1: np.ndarray):
    """(gt, lt, tie, delta) integer dominance counts + one division."""
    n1 = int(c0.sum())
    n2 = int(c1.sum())
    cum1 = np.cumsum(c1)
    before1 = np.concatenate(([0], cum1[:-1]))
    gt = int((c0 * before1).sum())
    lt = int((c0 * (n2 - cum1)).sum())
    tie = int((c0 * c1).sum())
    delta = (gt - lt) / (n1 * n2)
    return gt, lt, tie, delta


def _two_source_hist(sf_dir: str) -> "np.ndarray":
    """Merged (value, c0, c1) histogram of n_chars for SRC_A/SRC_B."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"v": pa.array([], type=pa.int64()),
             "c0": pa.array([], type=pa.int64()),
             "c1": pa.array([], type=pa.int64())}
        )
        if "source" not in t.column_names:
            return empty
        src = np.asarray(t.column("source").to_pylist())
        keep = (src == SRC_A) | (src == SRC_B)
        if not keep.any():
            return empty
        v = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        a = src[keep] == SRC_A
        va, ca = np.unique(v[a], return_counts=True)
        vb, cb = np.unique(v[~a], return_counts=True)
        allv = np.union1d(va, vb)
        c0 = np.zeros(allv.size, dtype=np.int64)
        c1 = np.zeros(allv.size, dtype=np.int64)
        c0[np.searchsorted(allv, va)] = ca
        c1[np.searchsorted(allv, vb)] = cb
        return pa.table(
            {"v": pa.array(allv), "c0": pa.array(c0),
             "c1": pa.array(c1)}
        )

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("v").aggregate([("c0", "sum"), ("c1", "sum")])
        return pa.table(
            {"v": g.column("v").cast(pa.int64()),
             "c0": g.column("c0_sum").cast(pa.int64()),
             "c1": g.column("c1_sum").cast(pa.int64())}
        )

    refs = list(
        read_cols(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    h = tree_reduce_tables(refs, merge).to_pandas()
    return h.sort_values("v").reset_index(drop=True)


_SQL_HIST = f"""
    d AS (
        SELECT n_chars AS v,
               CASE WHEN source = '{SRC_A}' THEN 1 ELSE 0 END AS is0
        FROM documents
        WHERE source IN ('{SRC_A}', '{SRC_B}')
    ),
    h AS (
        SELECT v,
               CAST(sum(is0) AS BIGINT) AS c0,
               CAST(sum(1 - is0) AS BIGINT) AS c1
        FROM d GROUP BY v
    )
"""


# ------------------------------------------------- source_ansari_bradley
def _ansari_query():
    def q(sf_dir: str):
        h = _two_source_hist(sf_dir)
        c0 = h["c0"].to_numpy(np.int64)
        c1 = h["c1"].to_numpy(np.int64)
        n1, n2, ab, z = ab_from_hist(c0, c1)
        return pa.table({
            "n_a": pa.array([n1], type=pa.int64()),
            "n_b": pa.array([n2], type=pa.int64()),
            "ab_stat": pa.array([ab], type=pa.float64()),
            "z_ab": pa.array([z], type=pa.float64()),
        })

    # T(k) closed form; TN by parity; folds in value order mirror the
    # engine's sequential loop term-for-term.
    sql = f"""
    WITH {_SQL_HIST},
    w AS (
        SELECT v, c0, c1, c0 + c1 AS cv,
               CAST(sum(c0 + c1) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM h
    ),
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2,
               CAST(sum(cv) AS BIGINT) AS n,
               CASE WHEN CAST(sum(cv) AS BIGINT) % 2 = 0
                    THEN (CAST(sum(cv) AS BIGINT) // 2)
                         * (CAST(sum(cv) AS BIGINT) // 2 + 1)
                    ELSE ((CAST(sum(cv) AS BIGINT) + 1) // 2)
                         * ((CAST(sum(cv) AS BIGINT) + 1) // 2)
               END AS tn
        FROM w
    ),
    blocks AS (
        SELECT w.v, w.c0, w.cv,
               (CASE WHEN w.cum <= (nn.n + 1) // 2
                     THEN w.cum * (w.cum + 1) // 2
                     ELSE nn.tn - (nn.n - w.cum)
                          * (nn.n - w.cum + 1) // 2 END)
             - (CASE WHEN w.cum - w.cv <= (nn.n + 1) // 2
                     THEN (w.cum - w.cv) * (w.cum - w.cv + 1) // 2
                     ELSE nn.tn - (nn.n - w.cum + w.cv)
                          * (nn.n - w.cum + w.cv + 1) // 2 END)
                   AS s
        FROM w CROSS JOIN nn
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(c0 * s AS DOUBLE) / CAST(cv AS DOUBLE)
                     ORDER BY v)), (p, x) -> p + x) AS ab,
            list_reduce(list_prepend(0.0e0,
                list(CAST(s * s AS DOUBLE) / CAST(cv AS DOUBLE)
                     ORDER BY v)), (p, x) -> p + x) AS q
        FROM blocks
    )
    SELECT nn.n1 AS n_a, nn.n2 AS n_b,
           folds.ab AS ab_stat,
           (folds.ab - CAST(nn.n1 * nn.tn AS DOUBLE)
                       / CAST(nn.n AS DOUBLE))
           / sqrt(CAST(nn.n1 * nn.n2 AS DOUBLE)
                  * (CAST(nn.n AS DOUBLE) * folds.q
                     - CAST(nn.tn * nn.tn AS DOUBLE))
                  / CAST(nn.n * nn.n * (nn.n - 1) AS DOUBLE))
               AS z_ab
    FROM folds CROSS JOIN nn
    """
    return q, sql


# -------------------------------------------------- source_cliffs_delta
def _cliffs_query():
    def q(sf_dir: str):
        h = _two_source_hist(sf_dir)
        c0 = h["c0"].to_numpy(np.int64)
        c1 = h["c1"].to_numpy(np.int64)
        gt, lt, tie, delta = cliffs_from_hist(c0, c1)
        return pa.table({
            "n_gt": pa.array([gt], type=pa.int64()),
            "n_lt": pa.array([lt], type=pa.int64()),
            "n_tie": pa.array([tie], type=pa.int64()),
            "cliffs_delta": pa.array([delta], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_HIST},
    w AS (
        SELECT v, c0, c1,
               CAST(sum(c1) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1
        FROM h
    ),
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2
        FROM w
    ),
    cnt AS (
        SELECT CAST(sum(c0 * (cum1 - c1)) AS BIGINT) AS gt,
               CAST(sum(c0 * ((SELECT n2 FROM nn) - cum1))
                    AS BIGINT) AS lt,
               CAST(sum(c0 * c1) AS BIGINT) AS tie
        FROM w
    )
    SELECT cnt.gt AS n_gt, cnt.lt AS n_lt, cnt.tie AS n_tie,
           CAST(cnt.gt - cnt.lt AS DOUBLE)
               / CAST(nn.n1 * nn.n2 AS DOUBLE) AS cliffs_delta
    FROM cnt CROSS JOIN nn
    """
    return q, sql


def build_wave180_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_ansari_bradley",) + _ansari_query()))
    add(*(("source_cliffs_delta",) + _cliffs_query()))
    return queries, oracles
