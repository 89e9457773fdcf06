"""Wave-120 queries: Cochran's Q and 2x2 odds-ratio measures.

- events_cochrans_q: Cochran's Q across k = 4 six-hour day quadrants
  — for each (user, active-day) block, the binary "hit an error in
  quadrant j"; Q = k(k-1) sum_j (C_j - N/k)^2 / (k sum R_i - sum
  R_i^2) generalizes McNemar (wave 114) to k related proportions.
  With integer column totals C_j, row totals R_i: the numerator is
  expanded to k(k-1) * (k * sum C_j^2 - N^2) / k ... kept exact by
  computing k * sum(C_j^2) - N*N and k * sum(R) - sum(R^2) as ints
  and taking ONE float ratio times (k-1). Per-block (key, quadrant)
  bit partials OR-merge before anything moves.
- events_odds_ratio: the 2x2 epidemiology measures for error
  incidence by the user-hash cohort bit (wave 116's assignment):
  odds ratio (ad/bc, exact int products), relative risk, and the
  Woolf log-OR 95% CI — ln and the four reciprocal variances spelled
  identically on both sides, folded in fixed a,b,c,d order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

MIX32 = 2654435761
QK = 4


# --------------------------------------------------------- events_cochrans_q
def _cochran_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "q0": pa.array([], type=pa.int64()),
                "q1": pa.array([], type=pa.int64()),
                "q2": pa.array([], type=pa.int64()),
                "q3": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            quad = ((tus // 3_600_000_000) % 24) // 6
            uid = t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            et = np.asarray(t.column("event_type").to_pylist())
            is_err = et == "error"
            key = uid * np.int64(1 << 24) + day
            uk, inv = np.unique(key, return_inverse=True)
            cols = []
            for j in range(QK):
                b = np.zeros(uk.size, dtype=np.int64)
                np.maximum.at(b, inv[is_err & (quad == j)], 1)
                cols.append(b)
            return pa.table({
                "key": pa.array(uk),
                "q0": pa.array(cols[0]),
                "q1": pa.array(cols[1]),
                "q2": pa.array(cols[2]),
                "q3": pa.array(cols[3]),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate(
                [(f"q{j}", "max") for j in range(QK)])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                **{f"q{j}": g.column(f"q{j}_max").cast(pa.int64())
                   for j in range(QK)},
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        qcols = [a[f"q{j}"].to_numpy(np.int64) for j in range(QK)]
        c_j = [int(col.sum()) for col in qcols]
        r_i = sum(qcols)
        n_tot = int(r_i.sum())
        sum_c2 = sum(c * c for c in c_j)
        sum_r = int(r_i.sum())
        sum_r2 = int((r_i * r_i).sum())
        num = QK * sum_c2 - n_tot * n_tot
        den = QK * sum_r - sum_r2
        q_stat = float(QK - 1) * (float(num) / float(den))
        return pa.table({
            "n_blocks": pa.array([len(a)], type=pa.int64()),
            "c0": pa.array([c_j[0]], type=pa.int64()),
            "c1": pa.array([c_j[1]], type=pa.int64()),
            "c2": pa.array([c_j[2]], type=pa.int64()),
            "c3": pa.array([c_j[3]], type=pa.int64()),
            "cochran_q": pa.array([q_stat], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // 86400000000 AS day,
               ((epoch_us(ts) // 3600000000) % 24) // 6 AS quad,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    u AS (
        SELECT user_id, day,
               max(CASE WHEN ise = 1 AND quad = 0
                        THEN 1 ELSE 0 END) AS q0,
               max(CASE WHEN ise = 1 AND quad = 1
                        THEN 1 ELSE 0 END) AS q1,
               max(CASE WHEN ise = 1 AND quad = 2
                        THEN 1 ELSE 0 END) AS q2,
               max(CASE WHEN ise = 1 AND quad = 3
                        THEN 1 ELSE 0 END) AS q3
        FROM e GROUP BY user_id, day
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(q0) AS BIGINT) AS c0,
               CAST(sum(q1) AS BIGINT) AS c1,
               CAST(sum(q2) AS BIGINT) AS c2,
               CAST(sum(q3) AS BIGINT) AS c3,
               CAST(sum(q0 + q1 + q2 + q3) AS BIGINT) AS sr,
               CAST(sum((q0 + q1 + q2 + q3)
                        * (q0 + q1 + q2 + q3)) AS BIGINT) AS sr2
        FROM u
    )
    SELECT n_blocks, c0, c1, c2, c3,
           CAST({QK} - 1 AS DOUBLE)
           * (CAST({QK} * (c0*c0 + c1*c1 + c2*c2 + c3*c3)
                   - sr * sr AS DOUBLE)
              / CAST({QK} * sr - sr2 AS DOUBLE)) AS cochran_q
    FROM agg
    """
    return q, sql


# --------------------------------------------------------- events_odds_ratio
def _odds_ratio_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "treat": pa.array([], type=pa.int64()),
                "errs": pa.array([], type=pa.int64()),
                "evts": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            uid = t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            treat = ((uid * np.int64(MIX32)) % np.int64(1 << 32)
                     ) // np.int64(1 << 31)
            et = np.asarray(t.column("event_type").to_pylist())
            is_err = (et == "error").astype(np.int64)
            errs = np.bincount(treat, weights=is_err,
                               minlength=2).astype(np.int64)
            evts = np.bincount(treat, minlength=2).astype(np.int64)
            return pa.table({
                "treat": pa.array(np.arange(2, dtype=np.int64)),
                "errs": pa.array(errs),
                "evts": pa.array(evts),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("treat").aggregate(
                [("errs", "sum"), ("evts", "sum")])
            return pa.table({
                "treat": g.column("treat").cast(pa.int64()),
                "errs": g.column("errs_sum").cast(pa.int64()),
                "evts": g.column("evts_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        x = tree_reduce_tables(refs, merge).to_pandas()
        x = x.set_index("treat")
        a = int(x.loc[1, "errs"])                   # exposed, err
        b = int(x.loc[1, "evts"]) - a               # exposed, ok
        c = int(x.loc[0, "errs"])                   # ctrl, err
        d = int(x.loc[0, "evts"]) - c               # ctrl, ok
        oddsr = float(a * d) / float(b * c)
        rr = ((float(a) / float(a + b))
              / (float(c) / float(c + d)))
        ln_or = math.log(oddsr)
        se = math.sqrt(1.0 / float(a) + 1.0 / float(b)
                       + 1.0 / float(c) + 1.0 / float(d))
        lo = ln_or - 1.96 * se
        hi = ln_or + 1.96 * se
        return pa.table({
            "a": pa.array([a], type=pa.int64()),
            "b": pa.array([b], type=pa.int64()),
            "c": pa.array([c], type=pa.int64()),
            "d": pa.array([d], type=pa.int64()),
            "odds_ratio": pa.array([oddsr], type=pa.float64()),
            "rel_risk": pa.array([rr], type=pa.float64()),
            "ln_or_lo": pa.array([lo], type=pa.float64()),
            "ln_or_hi": pa.array([hi], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT ((user_id * {MIX32}) % 4294967296) // 2147483648
                   AS treat,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    cells AS (
        SELECT
            CAST(sum(CASE WHEN treat = 1 THEN ise ELSE 0 END)
                 AS BIGINT) AS a,
            CAST(sum(CASE WHEN treat = 1 THEN 1 - ise ELSE 0 END)
                 AS BIGINT) AS b,
            CAST(sum(CASE WHEN treat = 0 THEN ise ELSE 0 END)
                 AS BIGINT) AS c,
            CAST(sum(CASE WHEN treat = 0 THEN 1 - ise ELSE 0 END)
                 AS BIGINT) AS d
        FROM e
    )
    SELECT a, b, c, d,
           CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)
               AS odds_ratio,
           (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
               / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))
               AS rel_risk,
           ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
               - 1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE)
                               + 1.0e0 / CAST(b AS DOUBLE)
                               + 1.0e0 / CAST(c AS DOUBLE)
                               + 1.0e0 / CAST(d AS DOUBLE))
               AS ln_or_lo,
           ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
               + 1.96e0 * sqrt(1.0e0 / CAST(a AS DOUBLE)
                               + 1.0e0 / CAST(b AS DOUBLE)
                               + 1.0e0 / CAST(c AS DOUBLE)
                               + 1.0e0 / CAST(d AS DOUBLE))
               AS ln_or_hi
    FROM cells
    """
    return q, sql


def build_wave120_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cochrans_q",) + _cochran_query()))
    add(*(("events_odds_ratio",) + _odds_ratio_query()))
    return queries, oracles
