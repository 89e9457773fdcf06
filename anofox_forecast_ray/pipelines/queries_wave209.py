"""Wave-209 queries: two-sample Cramer-von Mises, discrete hazard.

- source_cramer_von_mises: the two-sample Cramer-von Mises T
  between src0 and src1 doc lengths, completing the ECDF-distance
  family (KS, Kuiper, AD): with cross-multiplied CDF numerators
  p_j = cum0_j*n1 - cum1_j*n0 at each pooled value (multiplicity
  h_j), T = sum h_j p_j^2 / (N^2 n0 n1) — a single division of
  exact int64s.
- events_renewal_hazard: the empirical discrete hazard function of
  inter-event gaps (minute buckets, capped at 30): h(k) =
  (gaps ending at k) / (gaps >= k) — each row one exact integer
  ratio; the increasing/decreasing shape is the DFR/IFR read a
  reliability engineer wants. Emits one row per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave180 import _SQL_HIST, _two_source_hist

US_PER_MIN = 60_000_000
HAZ_CAP = 30


def cvm_from_hist(c0: np.ndarray, c1: np.ndarray):
    """(num, den, T) exact ints + one division."""
    n0 = int(c0.sum())
    n1 = int(c1.sum())
    N = n0 + n1
    cum0 = np.cumsum(c0)
    cum1 = np.cumsum(c1)
    h = c0 + c1
    p = cum0 * n1 - cum1 * n0
    num = int((h * p * p).sum())
    den = N * N * n0 * n1
    return num, den, num / den


def hazard_rows(gap_counts: np.ndarray):
    """gap_counts[k] for k = 0..HAZ_CAP (last = overflow bucket);
    rows of (k, at_risk, events, hazard)."""
    total = int(gap_counts.sum())
    out = []
    at_risk = total
    for k in range(HAZ_CAP + 1):
        ev = int(gap_counts[k])
        out.append((k, at_risk, ev, ev / at_risk))
        at_risk -= ev
        if at_risk == 0:
            break
    return out


# ---------------------------------------------- source_cramer_von_mises
def _cvm_query():
    def q(sf_dir: str):
        h = _two_source_hist(sf_dir)
        c0 = h["c0"].to_numpy(np.int64)
        c1 = h["c1"].to_numpy(np.int64)
        num, den, t = cvm_from_hist(c0, c1)
        return pa.table({
            "cvm_num": pa.array([num], type=pa.int64()),
            "cvm_den": pa.array([den], type=pa.int64()),
            "cvm_t": pa.array([t], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_HIST},
    w AS (
        SELECT v, c0, c1, c0 + c1 AS h,
               CAST(sum(c0) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum0,
               CAST(sum(c1) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1
        FROM h
    ),
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1
        FROM w
    ),
    s AS (
        SELECT CAST(sum(h * (cum0 * (SELECT n1 FROM nn)
                             - cum1 * (SELECT n0 FROM nn))
                        * (cum0 * (SELECT n1 FROM nn)
                           - cum1 * (SELECT n0 FROM nn)))
                    AS BIGINT) AS num
        FROM w
    )
    SELECT s.num AS cvm_num,
           CAST((nn.n0 + nn.n1) * (nn.n0 + nn.n1)
                * nn.n0 * nn.n1 AS BIGINT) AS cvm_den,
           CAST(s.num AS DOUBLE)
               / CAST((nn.n0 + nn.n1) * (nn.n0 + nn.n1)
                      * nn.n0 * nn.n1 AS DOUBLE) AS cvm_t
    FROM s CROSS JOIN nn
    """
    return q, sql


# ------------------------------------------------ events_renewal_hazard
def _hazard_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prune(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t.column("user_id").cast(pa.int64()),
                "tus": t.column("ts").cast(pa.int64()),
                "eid": t.column("event_id").cast(pa.int64()),
            })

        def per_user(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("eid", "ascending")])
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            uid = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            empty = pa.table(
                {"k": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
            if tus.size < 2:
                return empty
            same = uid[1:] == uid[:-1]
            gaps = (np.diff(tus) // US_PER_MIN)[same]
            if gaps.size == 0:
                return empty
            k = np.minimum(gaps, HAZ_CAP).astype(np.int64)
            uk, c = np.unique(k, return_counts=True)
            return pa.table({"k": pa.array(uk, type=pa.int64()),
                             "c": pa.array(c.astype(np.int64))})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate([("c", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prune, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(per_user, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        counts = np.zeros(HAZ_CAP + 1, dtype=np.int64)
        for _, r in h.iterrows():
            counts[int(r["k"])] += int(r["c"])
        rows = hazard_rows(counts)
        return pa.table({
            "gap_min": pa.array([r[0] for r in rows],
                                type=pa.int64()),
            "n_at_risk": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
            "n_events": pa.array([r[2] for r in rows],
                                 type=pa.int64()),
            "hazard": pa.array([r[3] for r in rows],
                               type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS tus,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ),
    gaps AS (
        SELECT least((nxt - tus) // {US_PER_MIN},
                     {HAZ_CAP}) AS k
        FROM o WHERE nxt IS NOT NULL
    ),
    hist AS (
        SELECT k, CAST(count(*) AS BIGINT) AS c
        FROM gaps GROUP BY k
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(0, {HAZ_CAP}))
                    AS BIGINT) AS k
    ),
    filled AS (
        SELECT g.k, CAST(coalesce(hist.c, 0) AS BIGINT) AS c
        FROM grid g LEFT JOIN hist ON g.k = hist.k
    ),
    risk AS (
        SELECT k, c,
               CAST((SELECT sum(c) FROM filled) AS BIGINT)
                   - CAST(coalesce(sum(c) OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT)
                   AS at_risk
        FROM filled
    )
    SELECT k AS gap_min, at_risk AS n_at_risk, c AS n_events,
           CAST(c AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
    FROM risk WHERE at_risk > 0
    """
    return q, sql


def build_wave209_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_cramer_von_mises",) + _cvm_query()))
    add(*(("events_renewal_hazard",) + _hazard_query()))
    return queries, oracles
