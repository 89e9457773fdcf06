"""Wave-182 queries: Moran's I and Geary's C on the hour-of-day ring.

Spatial autocorrelation of the 24-hour activity profile, with the ring
lattice (hour k adjacent to k±1 mod 24) as the weight matrix — the
classic test for whether adjacent hours have correlated load.

Exactness trick: with n = 24 cells and W = 48 total weight, substituting
u_k = 24*x_k - N (exact integers; N = total events) clears the mean:
  Moran's I = (n/W) * sum_ij w_ij z_i z_j / sum z^2
            = num / den            with num = sum_k u_k u_{k+1 mod 24},
                                        den = sum_k u_k^2
  Geary's C = ((n-1)/(2W)) * sum_ij w_ij (x_i - x_j)^2 / sum z^2
            = 276 * d2 / den       with d2 = sum_k (x_k - x_{k+1})^2
Each statistic is ONE division of two int64s — bitwise-safe at any
scale (u <= 24N, den <= 24*(24N)^2 fits int64 through sf0.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def ring_moran_geary(x: np.ndarray) -> tuple[float, float]:
    """(moran_i, geary_c) for a 24-cell ring profile of int counts."""
    x = x.astype(np.int64)
    n_cells = x.size
    N = int(x.sum())
    u = n_cells * x - N
    nxt = np.roll(u, -1)
    num = int((u * nxt).sum())
    den = int((u * u).sum())
    xd = x - np.roll(x, -1)
    d2 = int((xd * xd).sum())
    # 276 = (n-1) * 2 * n^2 / (2W) for n=24, W=2n
    coef = (n_cells - 1) * n_cells * n_cells // (2 * n_cells)
    return num / den, (coef * d2) / den


# ------------------------------------------------------ events_ring_moran
def _ring_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            n = np.bincount(hod, minlength=24).astype(np.int64)
            return pa.table({
                "k": pa.array(np.arange(24, dtype=np.int64)),
                "x": pa.array(n),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate([("x", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "x": g.column("x_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("k").reset_index(drop=True)
        x = h["x"].to_numpy(np.int64)
        mi, gc = ring_moran_geary(x)
        return pa.table({
            "n_events": pa.array([int(x.sum())], type=pa.int64()),
            "moran_i": pa.array([mi], type=pa.float64()),
            "geary_c": pa.array([gc], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS k FROM events
    ),
    g AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 24)),
    h AS (
        SELECT g.k, CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM g LEFT JOIN (
            SELECT k, count(*) AS cnt FROM e GROUP BY k
        ) c ON g.k = c.k
    ),
    nn AS (SELECT CAST(sum(x) AS BIGINT) AS n FROM h),
    u AS (
        SELECT k, 24 * x - (SELECT n FROM nn) AS uk, x FROM h
    ),
    j AS (
        SELECT a.uk AS ua, b.uk AS ub, a.x AS xa, b.x AS xb
        FROM u a JOIN u b ON b.k = (a.k + 1) % 24
    ),
    s AS (
        SELECT CAST(sum(ua * ub) AS BIGINT) AS num,
               CAST(sum((xa - xb) * (xa - xb)) AS BIGINT) AS d2
        FROM j
    ),
    d AS (SELECT CAST(sum(uk * uk) AS BIGINT) AS den FROM u)
    SELECT (SELECT n FROM nn) AS n_events,
           CAST(s.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS moran_i,
           CAST(276 * s.d2 AS DOUBLE) / CAST(d.den AS DOUBLE)
               AS geary_c
    FROM s CROSS JOIN d
    """
    return q, sql


def kuiper_from_hist(x: np.ndarray) -> tuple[int, int, float]:
    """(dplus_num, dminus_num, V) for the binned Kuiper test of
    hour-of-day uniformity. Comparing F_i = cum_i/N against
    G_i = (i+1)/24 at bin right-edges in units of 1/(24N) keeps the
    sups exact integers: delta_i = 24*cum_i - (i+1)*N;
    V = (max(0, max delta) + max(0, -min delta)) / (24N)."""
    x = x.astype(np.int64)
    N = int(x.sum())
    cum = np.cumsum(x)
    i = np.arange(x.size, dtype=np.int64)
    delta = x.size * cum - (i + 1) * N
    dp = max(0, int(delta.max()))
    dm = max(0, -int(delta.min()))
    return dp, dm, (dp + dm) / (x.size * N)


# ------------------------------------------------------ events_hod_kuiper
def _kuiper_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            n = np.bincount(hod, minlength=24).astype(np.int64)
            return pa.table({
                "k": pa.array(np.arange(24, dtype=np.int64)),
                "x": pa.array(n),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("k").aggregate([("x", "sum")])
            return pa.table({
                "k": g.column("k").cast(pa.int64()),
                "x": g.column("x_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("k").reset_index(drop=True)
        x = h["x"].to_numpy(np.int64)
        dp, dm, v = kuiper_from_hist(x)
        return pa.table({
            "n_events": pa.array([int(x.sum())], type=pa.int64()),
            "d_plus_num": pa.array([dp], type=pa.int64()),
            "d_minus_num": pa.array([dm], type=pa.int64()),
            "kuiper_v": pa.array([v], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS k FROM events
    ),
    g AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 24)),
    h AS (
        SELECT g.k, CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM g LEFT JOIN (
            SELECT k, count(*) AS cnt FROM e GROUP BY k
        ) c ON g.k = c.k
    ),
    nn AS (SELECT CAST(sum(x) AS BIGINT) AS n FROM h),
    w AS (
        SELECT k,
               24 * CAST(sum(x) OVER (ORDER BY k
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - (k + 1) * (SELECT n FROM nn) AS delta
        FROM h
    ),
    s AS (
        SELECT greatest(CAST(0 AS BIGINT), max(delta)) AS dp,
               greatest(CAST(0 AS BIGINT), -min(delta)) AS dm
        FROM w
    )
    SELECT (SELECT n FROM nn) AS n_events,
           s.dp AS d_plus_num, s.dm AS d_minus_num,
           CAST(s.dp + s.dm AS DOUBLE)
               / CAST(24 * (SELECT n FROM nn) AS DOUBLE) AS kuiper_v
    FROM s
    """
    return q, sql


def build_wave182_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_ring_moran_geary",) + _ring_query()))
    add(*(("events_hod_kuiper",) + _kuiper_query()))
    return queries, oracles
