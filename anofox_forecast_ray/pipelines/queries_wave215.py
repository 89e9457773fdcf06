"""Wave-215 queries: INAR(1) fit, Cochrane-Orcutt correction.

- events_inar1: the INAR(1) integer-autoregression fit for count
  series (Al-Osh & Alzaid): the binomial-thinning survival rate
  alpha equals the lag-1 autocorrelation and the innovation mean is
  lambda = mu(1 - alpha). Estimated from the hourly count series by
  Yule-Walker: centered two-pass folds for the lag-1 autocovariance
  and variance, means as single divisions of exact ints. Also emits
  the equidispersion diagnostic var/mean the Poisson INAR implies.
- orders_cochrane_orcutt: the two-step Cochrane-Orcutt AR(1)
  serial-correlation correction of the monthly revenue trend:
  (1) OLS slope b_ols; (2) rho = lag-1 autocorrelation of the OLS
  residuals (fold in month order); (3) re-fit on the
  quasi-differenced series y_t - rho y_{t-1} vs x_t - rho x_{t-1}.
  Emits rho, b_ols, b_co — the textbook fix when Durbin-Watson
  flags the trend regression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

from .queries_wave137 import _hourly_counts
from .queries_wave191 import _monthly_cents


def inar1(x):
    """(mu, alpha, lam, vmr) with sequential folds."""
    n = len(x)
    s1 = 0
    for v in x:
        s1 += int(v)
    mu = s1 / n
    den = 0.0
    for v in x:
        den = den + (v - mu) * (v - mu)
    num = 0.0
    for t in range(n - 1):
        num = num + (x[t] - mu) * (x[t + 1] - mu)
    alpha = num / den
    lam = mu * (1.0e0 - alpha)
    vmr = (den / (n - 1)) / mu
    return mu, alpha, lam, vmr


def cochrane_orcutt(t, y):
    """(b_ols, rho, b_co) with folds in t order; t, y ints."""
    n = len(t)

    def ols(xs, ys):
        m = len(xs)
        sx = 0.0
        sy = 0.0
        for v in xs:
            sx = sx + v
        for v in ys:
            sy = sy + v
        mx = sx / m
        my = sy / m
        sxy = 0.0
        sxx = 0.0
        for a, b in zip(xs, ys):
            sxy = sxy + (a - mx) * (b - my)
            sxx = sxx + (a - mx) * (a - mx)
        b = sxy / sxx
        return my - b * mx, b

    xf = [float(int(v)) for v in t]
    yf = [float(int(v)) for v in y]
    a0, b_ols = ols(xf, yf)
    e = [yv - (a0 + b_ols * xv) for xv, yv in zip(xf, yf)]
    den = 0.0
    for v in e:
        den = den + v * v
    num = 0.0
    for i in range(n - 1):
        num = num + e[i] * e[i + 1]
    rho = num / den
    ys2 = [yf[i] - rho * yf[i - 1] for i in range(1, n)]
    xs2 = [xf[i] - rho * xf[i - 1] for i in range(1, n)]
    _, b_co = ols(xs2, ys2)
    return b_ols, rho, b_co


# ----------------------------------------------------------- events_inar1
def _inar_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        mu, alpha, lam, vmr = inar1(x)
        return pa.table({
            "mean_rate": pa.array([mu], type=pa.float64()),
            "inar_alpha": pa.array([alpha], type=pa.float64()),
            "inar_lambda": pa.array([lam], type=pa.float64()),
            "var_mean_ratio": pa.array([vmr],
                                       type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour, COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cnt) AS BIGINT) AS s1,
               list(CAST(cnt AS DOUBLE) ORDER BY hour) AS ys
        FROM grid
    ),
    mm AS (
        SELECT n, ys,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu
        FROM l
    ),
    folds AS (
        SELECT n, mu,
               list_reduce(list_prepend(0.0e0,
                   list_transform(ys,
                       v -> (v - mu) * (v - mu))),
                   (p, v) -> p + v) AS den,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n - 1 AS INTEGER)),
                       i -> (ys[i] - mu) * (ys[i + 1] - mu))),
                   (p, v) -> p + v) AS num
        FROM mm
    )
    SELECT mu AS mean_rate,
           num / den AS inar_alpha,
           mu * (1.0e0 - num / den) AS inar_lambda,
           (den / CAST(n - 1 AS DOUBLE)) / mu
               AS var_mean_ratio
    FROM folds
    """
    return q, sql


# -------------------------------------------- orders_cochrane_orcutt
def _co_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries import _num_read_blocks

        US_PER_DAY = 86_400_000_000

        def partial(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({"month": pa.array(uk),
                             "cents": pa.array(cs)})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate([("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("month").reset_index(drop=True)
        lo = int(m["month"].min())
        t = (m["month"].to_numpy(np.int64) - lo)
        y = m["cents"].to_numpy(np.int64)
        b_ols, rho, b_co = cochrane_orcutt(list(t), list(y))
        return pa.table({
            "b_ols": pa.array([b_ols], type=pa.float64()),
            "rho_resid": pa.array([rho], type=pa.float64()),
            "b_cochrane_orcutt": pa.array([b_co],
                                          type=pa.float64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(month - (SELECT min(month) FROM mm)
                         AS DOUBLE) ORDER BY month) AS xs,
               list(CAST(cents AS DOUBLE) ORDER BY month) AS ys
        FROM mm
    ),
    mu AS (
        SELECT n, xs, ys,
               list_reduce(list_prepend(0.0e0, xs),
                   (p, v) -> p + v) / CAST(n AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0, ys),
                   (p, v) -> p + v) / CAST(n AS DOUBLE) AS my
        FROM l
    ),
    ols AS (
        SELECT n, xs, ys, mx, my,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n AS INTEGER)),
                       i -> (xs[i] - mx) * (ys[i] - my))),
                   (p, v) -> p + v)
               / list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n AS INTEGER)),
                       i -> (xs[i] - mx) * (xs[i] - mx))),
                   (p, v) -> p + v) AS b
        FROM mu
    ),
    res AS (
        SELECT n, xs, ys, b, my - b * mx AS a
        FROM ols
    ),
    rho AS (
        SELECT n, xs, ys, b, a,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n - 1 AS INTEGER)),
                       i -> (ys[i] - (a + b * xs[i]))
                            * (ys[i + 1]
                               - (a + b * xs[i + 1])))),
                   (p, v) -> p + v)
               / list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST(n AS INTEGER)),
                       i -> (ys[i] - (a + b * xs[i]))
                            * (ys[i] - (a + b * xs[i])))),
                   (p, v) -> p + v) AS r
        FROM res
    ),
    quasi AS (
        SELECT n, r, b,
               list_transform(generate_series(2,
                   CAST(n AS INTEGER)),
                   i -> ys[i] - r * ys[i - 1]) AS ys2,
               list_transform(generate_series(2,
                   CAST(n AS INTEGER)),
                   i -> xs[i] - r * xs[i - 1]) AS xs2
        FROM rho
    ),
    mu2 AS (
        SELECT n, r, b, xs2, ys2,
               list_reduce(list_prepend(0.0e0, xs2),
                   (p, v) -> p + v)
                   / CAST(n - 1 AS DOUBLE) AS mx2,
               list_reduce(list_prepend(0.0e0, ys2),
                   (p, v) -> p + v)
                   / CAST(n - 1 AS DOUBLE) AS my2
        FROM quasi
    )
    SELECT b AS b_ols, r AS rho_resid,
           list_reduce(list_prepend(0.0e0,
               list_transform(generate_series(1,
                   CAST(n - 1 AS INTEGER)),
                   i -> (xs2[i] - mx2) * (ys2[i] - my2))),
               (p, v) -> p + v)
           / list_reduce(list_prepend(0.0e0,
               list_transform(generate_series(1,
                   CAST(n - 1 AS INTEGER)),
                   i -> (xs2[i] - mx2) * (xs2[i] - mx2))),
               (p, v) -> p + v) AS b_cochrane_orcutt
    FROM mu2
    """
    return q, sql


def build_wave215_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_inar1",) + _inar_query()))
    add(*(("orders_cochrane_orcutt",) + _co_query()))
    return queries, oracles
