"""Wave-214 queries: Lorenz asymmetry, Storey's pi0.

- lineitem_lorenz_asymmetry: the Damgaard-Weiner Lorenz asymmetry
  coefficient S = F(mu) + L(mu) over extended-price cents: with
  m = #{x < mu} (exact: v*n < S1 in int64), x_(m) / x_(m+1) the
  bracketing order statistics from the bounded histogram, delta =
  (mu - x_m)/(x_(m+1) - x_m), F = (m + delta)/n and L = (sum below
  + delta * x_(m+1)) / total. S > 1 says inequality comes from a
  few LARGE values; S < 1 from many small ones — the shape Gini
  cannot see.
- events_storey_pi0: Storey's null-proportion estimate pi0 =
  #{p_c > 0.5} / (C * 0.5) over the 168 hour-of-week error-rate
  cells, where p_c is the two-sided z-test p-value of the cell's
  error rate against the global rate. p > 0.5 iff |z| <
  z_{0.75} = 0.6744897501960817 (the standard normal quartile as a
  shared literal) — so no CDF is evaluated; z's come from exact
  integer counts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
Z75 = 0.6744897501960817e0


def lorenz_asymmetry(values: np.ndarray, counts: np.ndarray):
    """(m_below, delta, s) from the ascending value histogram."""
    n = int(counts.sum())
    s1 = int((values * counts).sum())
    # m = #{x < mu}: v < s1/n  <=>  v*n < s1 (ints)
    below = values * n < s1
    m = int(counts[below].sum())
    sum_below = int((values[below] * counts[below]).sum())
    xm = int(values[below][-1])
    above = ~below
    xm1 = int(values[above][0])
    mu = s1 / n
    delta = (mu - xm) / (xm1 - xm)
    f = (m + delta) / n
    lm = (sum_below + delta * xm1) / s1
    return m, delta, f + lm


def storey_pi0(cells):
    """cells: [(n_c, r_c)]; global rate from totals; z_c from the
    pooled-variance proportion z; pi0 = #{|z| < z75} / (C * 0.5)."""
    N = sum(c[0] for c in cells)
    R = sum(c[1] for c in cells)
    p0 = R / N
    null_like = 0
    used = 0
    for n_c, r_c in cells:
        if n_c == 0:
            continue
        used += 1
        num = r_c / n_c - p0
        den = math.sqrt(p0 * (1.0e0 - p0) / n_c)
        z = num / den
        if abs(z) < Z75:
            null_like += 1
    pi0 = null_like / (used * 0.5e0)
    return used, null_like, pi0


# ------------------------------------------- lineitem_lorenz_asymmetry
def _lac_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, c = np.unique(cents, return_counts=True)
            return pa.table({
                "v": pa.array(uk),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("v").aggregate([("c", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        m, delta, s = lorenz_asymmetry(
            h["v"].to_numpy(np.int64), h["c"].to_numpy(np.int64))
        return pa.table({
            "m_below_mean": pa.array([m], type=pa.int64()),
            "delta": pa.array([delta], type=pa.float64()),
            "lorenz_s": pa.array([s], type=pa.float64()),
        })

    sql = """
    WITH c AS (
        SELECT CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS v
        FROM lineitem
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1
        FROM c
    ),
    below AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(v) AS BIGINT) AS sum_below,
               CAST(max(v) AS BIGINT) AS xm
        FROM c WHERE v * (SELECT n FROM nn)
                     < (SELECT s1 FROM nn)
    ),
    above AS (
        SELECT CAST(min(v) AS BIGINT) AS xm1
        FROM c WHERE NOT (v * (SELECT n FROM nn)
                          < (SELECT s1 FROM nn))
    ),
    d AS (
        SELECT (CAST(nn.s1 AS DOUBLE) / CAST(nn.n AS DOUBLE)
                - CAST(below.xm AS DOUBLE))
               / CAST(above.xm1 - below.xm AS DOUBLE) AS delta,
               nn.n, nn.s1, below.m, below.sum_below, above.xm1
        FROM nn CROSS JOIN below CROSS JOIN above
    )
    SELECT m AS m_below_mean, delta,
           (CAST(m AS DOUBLE) + delta) / CAST(n AS DOUBLE)
           + (CAST(sum_below AS DOUBLE)
              + delta * CAST(xm1 AS DOUBLE))
             / CAST(s1 AS DOUBLE) AS lorenz_s
    FROM d
    """
    return q, sql


# ------------------------------------------------- events_storey_pi0
def _pi0_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            how = (((tus // US_PER_DAY) + 4) % 7) * 24 \
                + (tus // US_PER_HOUR) % 24
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error").astype(np.int64)
            n = np.bincount(how, minlength=168).astype(np.int64)
            r = np.bincount(how, weights=err.astype(np.float64),
                            minlength=168).astype(np.int64)
            return pa.table({
                "cell": pa.array(np.arange(168, dtype=np.int64)),
                "n": pa.array(n), "r": pa.array(r),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cell").aggregate(
                [("n", "sum"), ("r", "sum")])
            return pa.table({
                "cell": g.column("cell").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "r": g.column("r_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("cell").reset_index(drop=True)
        cells = [(int(r["n"]), int(r["r"]))
                 for _, r in h.iterrows()]
        used, nl, pi0 = storey_pi0(cells)
        return pa.table({
            "n_cells": pa.array([used], type=pa.int64()),
            "n_null_like": pa.array([nl], type=pa.int64()),
            "pi0": pa.array([pi0], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (((epoch_us(ts) // {US_PER_DAY}) + 4) % 7) * 24
               + (epoch_us(ts) // {US_PER_HOUR}) % 24 AS cell,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    cells AS (
        SELECT cell, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(is_err) AS BIGINT) AS r
        FROM e GROUP BY cell
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(r) AS BIGINT) AS rr
        FROM cells
    ),
    z AS (
        SELECT cell,
               (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST((SELECT rr FROM tot) AS DOUBLE)
                  / CAST((SELECT nn FROM tot) AS DOUBLE))
               / sqrt((CAST((SELECT rr FROM tot) AS DOUBLE)
                       / CAST((SELECT nn FROM tot) AS DOUBLE))
                      * (1.0e0
                         - CAST((SELECT rr FROM tot) AS DOUBLE)
                           / CAST((SELECT nn FROM tot)
                                  AS DOUBLE))
                      / CAST(n AS DOUBLE)) AS zz
        FROM cells WHERE n > 0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS used,
               CAST(sum(CASE WHEN abs(zz) < {Z75!r}
                        THEN 1 ELSE 0 END) AS BIGINT) AS nl
        FROM z
    )
    SELECT used AS n_cells, nl AS n_null_like,
           CAST(nl AS DOUBLE)
               / (CAST(used AS DOUBLE) * 0.5e0) AS pi0
    FROM s
    """
    return q, sql


def build_wave214_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_lorenz_asymmetry",) + _lac_query()))
    add(*(("events_storey_pi0",) + _pi0_query()))
    return queries, oracles
