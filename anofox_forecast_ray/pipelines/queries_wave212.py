"""Wave-212 queries: Gamma MoM lag fit, Simpson's paradox audit.

- orders_lag_gamma_mom: a Gamma(alpha, theta) method-of-moments fit
  to the fulfillment lag (l_shipdate - o_orderdate in whole days,
  exact ints) — the duration-distribution sibling of the lognormal
  revenue fit: alpha = mu^2/s2, theta = s2/mu from explicit integer
  moments. Engine shape: the bounded orderkey -> orderdate map is
  ray.put-BROADCAST once and each lineitem block joins map-side (no
  shuffle) — the canonical small-side join at 100 TB.
- events_simpsons_paradox: the Simpson's-paradox audit — does the
  value~hour association flip when stratified by day-of-week? The
  aggregate OLS slope and the 7 per-stratum slopes all come from
  exact int64 moments; the paradox flag counts strata whose slope
  sign opposes the aggregate (sign via the exact double slope
  computed identically on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def gamma_mom(n, s1, s2):
    """(mu, alpha, theta) from int moments (ddof=1 variance)."""
    mu = s1 / n
    s2v = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
    alpha = mu * mu / s2v
    theta = s2v / mu
    return mu, alpha, theta


def slope_from_moments(n, sx, sy, sxx, sxy):
    fn = float(n)
    return ((fn * float(sxy) - float(sx) * float(sy))
            / (fn * float(sxx) - float(sx) * float(sx)))


# ------------------------------------------------ orders_lag_gamma_mom
def _gamma_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        # bounded small side: orderkey -> orderdate day
        od = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate"])
        keys = od.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        days = (od.column("o_orderdate").cast(pa.int64())
                .to_numpy(zero_copy_only=False) // US_PER_DAY)
        order = np.argsort(keys)
        ref = ray.put((keys[order], days[order].astype(np.int64)))

        def partial(t: pa.Table) -> pa.Table:
            k, d = ray.get(ref)
            ok = t.column("l_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            ship = (t.column("l_shipdate").cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                    // US_PER_DAY)
            idx = np.searchsorted(k, ok)
            lag = (ship - d[idx]).astype(np.int64)
            return pa.table({
                "n": pa.array([lag.size], type=pa.int64()),
                "s1": pa.array([int(lag.sum())], type=pa.int64()),
                "s2": pa.array([int((lag * lag).sum())],
                               type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array([int(t.column(c).to_numpy().sum())],
                            type=pa.int64())
                for c in ("n", "s1", "s2")
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas().iloc[0]
        mu, alpha, theta = gamma_mom(int(m["n"]), int(m["s1"]),
                                     int(m["s2"]))
        return pa.table({
            "n_items": pa.array([int(m["n"])], type=pa.int64()),
            "mean_lag_days": pa.array([mu], type=pa.float64()),
            "gamma_alpha": pa.array([alpha], type=pa.float64()),
            "gamma_theta": pa.array([theta], type=pa.float64()),
        })

    sql = f"""
    WITH lag AS (
        SELECT (epoch_us(l.l_shipdate)
                - epoch_us(o.o_orderdate)) // {US_PER_DAY} AS d
        FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS s1,
               CAST(sum(d * d) AS BIGINT) AS s2
        FROM lag
    )
    SELECT n AS n_items,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
               AS mean_lag_days,
           (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           / ((CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
               AS gamma_alpha,
           ((CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
           / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               AS gamma_theta
    FROM s
    """
    return q, sql


# ---------------------------------------------- events_simpsons_paradox
def _simpson_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        cols = ["g", "n", "sx", "sy", "sxx", "sxy"]

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            x = (tus // US_PER_HOUR) % 24
            g = ((tus // US_PER_DAY) + 4) % 7
            y = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            rows = {c: [] for c in cols}
            for gg in range(7):
                m = g == gg
                xs = x[m]
                ys = y[m]
                rows["g"].append(gg)
                rows["n"].append(int(m.sum()))
                rows["sx"].append(int(xs.sum()))
                rows["sy"].append(int(ys.sum()))
                rows["sxx"].append(int((xs * xs).sum()))
                rows["sxy"].append(int((xs * ys).sum()))
            return pa.table({c: pa.array(rows[c],
                                         type=pa.int64())
                             for c in cols})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("g").aggregate(
                [(c, "sum") for c in cols[1:]])
            return pa.table(
                {"g": g.column("g").cast(pa.int64()),
                 **{c: g.column(f"{c}_sum").cast(pa.int64())
                    for c in cols[1:]}})

        refs = list(
            read_cols(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("g").reset_index(drop=True)
        tot = {c: int(h[c].sum()) for c in cols[1:]}
        agg = slope_from_moments(tot["n"], tot["sx"], tot["sy"],
                                 tot["sxx"], tot["sxy"])
        n_opp = 0
        for _, r in h.iterrows():
            s = slope_from_moments(int(r["n"]), int(r["sx"]),
                                   int(r["sy"]), int(r["sxx"]),
                                   int(r["sxy"]))
            if (s > 0.0) != (agg > 0.0):
                n_opp += 1
        return pa.table({
            "agg_slope": pa.array([agg], type=pa.float64()),
            "n_strata_opposite": pa.array([n_opp],
                                          type=pa.int64()),
            "paradox_flag": pa.array([1 if n_opp >= 4 else 0],
                                     type=pa.int64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS x,
               ((epoch_us(ts) // {US_PER_DAY}) + 4) % 7 AS g,
               CAST(round_even(value * 100, 0) AS BIGINT) AS y
        FROM events
    ),
    per AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM e GROUP BY g
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(sx) AS BIGINT) AS sx,
               CAST(sum(sy) AS BIGINT) AS sy,
               CAST(sum(sxx) AS BIGINT) AS sxx,
               CAST(sum(sxy) AS BIGINT) AS sxy
        FROM per
    ),
    agg AS (
        SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS s
        FROM tot
    ),
    strata AS (
        SELECT g,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS s
        FROM per
    ),
    cnt AS (
        SELECT CAST(sum(CASE WHEN (strata.s > 0.0e0)
                    <> ((SELECT s FROM agg) > 0.0e0)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_opp
        FROM strata
    )
    SELECT (SELECT s FROM agg) AS agg_slope,
           cnt.n_opp AS n_strata_opposite,
           CAST(CASE WHEN cnt.n_opp >= 4 THEN 1 ELSE 0 END
                AS BIGINT) AS paradox_flag
    FROM cnt
    """
    return q, sql


def build_wave212_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_lag_gamma_mom",) + _gamma_query()))
    add(*(("events_simpsons_paradox",) + _simpson_query()))
    return queries, oracles
