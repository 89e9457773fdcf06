"""Wave-227 queries: Blomqvist beta, HC0 robust standard errors.

- events_blomqvist_beta: Blomqvist's medial correlation between
  event value (cents) and hour-of-day: split at the two EXACT
  integer medians (lower-median order statistic, rank ceil(n/2) —
  no interpolation, so the split is integer-exact) and
  beta = (n_agree - n_disagree) / n over the four quadrants
  (points ON a median excluded, the standard convention). Pure
  integer counts, one division.
- part_price_size_hc0: the White/HC0 heteroskedasticity-robust
  standard error for the retail-price ~ size regression, next to
  the classical OLS se: slope from int moments, se_ols^2 =
  (SSE/(n-2))/Sxx, se_hc0^2 = sum e_i^2 (x_i - xbar)^2 / Sxx^2 —
  folds over the bounded (size, price-cents histogram) cells in
  (size, price) order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def blomqvist(pairs_hist):
    """pairs_hist: {(hod, cents): count}. Lower medians by rank
    ceil(n/2) over each margin; beta from strict quadrants."""
    n = sum(pairs_hist.values())
    rk = (n + 1) // 2

    def lower_median(axis):
        import collections

        marg = collections.Counter()
        for (h, c), cnt in pairs_hist.items():
            marg[h if axis == 0 else c] += cnt
        cum = 0
        for v in sorted(marg):
            cum += marg[v]
            if cum >= rk:
                return v
        raise AssertionError

    mx = lower_median(0)
    my = lower_median(1)
    agree = 0
    disagree = 0
    used = 0
    for (h, c), cnt in sorted(pairs_hist.items()):
        if h == mx or c == my:
            continue
        used += cnt
        if (h > mx) == (c > my):
            agree += cnt
        else:
            disagree += cnt
    beta = (agree - disagree) / used
    return mx, my, used, beta


def hc0_regression(cells):
    """cells: [(x, y, cnt)] sorted; returns (slope, se_ols,
    se_hc0) with folds in cell order."""
    n = 0
    sx = 0
    sy = 0
    for x, y, c in cells:
        n += c
        sx += x * c
        sy += y * c
    fn = float(n)
    mx = sx / n
    my = sy / n
    sxy = 0.0
    sxx = 0.0
    for x, y, c in cells:
        sxy = sxy + c * ((x - mx) * (y - my))
        sxx = sxx + c * ((x - mx) * (x - mx))
    b = sxy / sxx
    a = my - b * mx
    sse = 0.0
    hc0 = 0.0
    for x, y, c in cells:
        e = y - (a + b * x)
        sse = sse + c * (e * e)
        hc0 = hc0 + c * ((e * e) * ((x - mx) * (x - mx)))
    se_ols = math.sqrt((sse / (n - 2)) / sxx)
    se_hc0 = math.sqrt(hc0 / (sxx * sxx))
    return b, se_ols, se_hc0


# ---------------------------------------------- events_blomqvist_beta
def _blomqvist_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            cents = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            df = pd.DataFrame({"h": hod, "c": cents})
            g = df.groupby(["h", "c"]).size().reset_index(
                name="n")
            return pa.table({
                "h": pa.array(g["h"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
                "n": pa.array(g["n"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby(["h", "c"])["n"].sum().reset_index()
            return pa.table({
                "h": pa.array(g["h"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
                "n": pa.array(g["n"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        t = tree_reduce_tables(refs, merge).to_pandas()
        hist = {(int(r["h"]), int(r["c"])): int(r["n"])
                for _, r in t.iterrows()}
        mx, my, used, beta = blomqvist(hist)
        return pa.table({
            "med_hour": pa.array([mx], type=pa.int64()),
            "med_cents": pa.array([my], type=pa.int64()),
            "n_used": pa.array([used], type=pa.int64()),
            "blomqvist_beta": pa.array([beta],
                                       type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
               CAST(round_even(value * 100, 0) AS BIGINT) AS c
        FROM events
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    mh AS (
        SELECT h AS v FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS r
            FROM e
        ) WHERE r = ((SELECT n FROM nn) + 1) // 2
    ),
    mc AS (
        SELECT c AS v FROM (
            SELECT c, row_number() OVER (ORDER BY c) AS r
            FROM e
        ) WHERE r = ((SELECT n FROM nn) + 1) // 2
    ),
    quad AS (
        SELECT
            CAST(sum(CASE WHEN (h > (SELECT v FROM mh))
                           = (c > (SELECT v FROM mc))
                     THEN 1 ELSE 0 END) AS BIGINT) AS agree,
            CAST(count(*) AS BIGINT) AS used
        FROM e
        WHERE h <> (SELECT v FROM mh)
          AND c <> (SELECT v FROM mc)
    )
    SELECT (SELECT v FROM mh) AS med_hour,
           (SELECT v FROM mc) AS med_cents,
           used AS n_used,
           CAST(agree - (used - agree) AS DOUBLE)
               / CAST(used AS DOUBLE) AS blomqvist_beta
    FROM quad
    """
    return q, sql


# ---------------------------------------------- part_price_size_hc0
def _hc0_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            size = t.column("p_size").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(t.column("p_retailprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            df = pd.DataFrame({"x": size, "y": cents})
            g = df.groupby(["x", "y"]).size().reset_index(
                name="n")
            return pa.table({
                "x": pa.array(g["x"].astype("int64")),
                "y": pa.array(g["y"].astype("int64")),
                "n": pa.array(g["n"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby(["x", "y"])["n"].sum().reset_index()
            return pa.table({
                "x": pa.array(g["x"].astype("int64")),
                "y": pa.array(g["y"].astype("int64")),
                "n": pa.array(g["n"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "part", ["p_size", "p_retailprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        t = tree_reduce_tables(refs, merge).to_pandas()
        t = t.sort_values(["x", "y"]).reset_index(drop=True)
        cells = [(int(r["x"]), int(r["y"]), int(r["n"]))
                 for _, r in t.iterrows()]
        b, se_ols, se_hc0 = hc0_regression(cells)
        return pa.table({
            "slope": pa.array([b], type=pa.float64()),
            "se_ols": pa.array([se_ols], type=pa.float64()),
            "se_hc0": pa.array([se_hc0], type=pa.float64()),
        })

    sql = """
    WITH p AS (
        SELECT CAST(p_size AS BIGINT) AS x,
               CAST(round_even(p_retailprice * 100, 0)
                    AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS n
        FROM part GROUP BY 1, 2
    ),
    mo AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(x * n) AS BIGINT) AS sx,
               CAST(sum(y * n) AS BIGINT) AS sy
        FROM p
    ),
    mu AS (
        SELECT nn,
               CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE) AS mx,
               CAST(sy AS DOUBLE) / CAST(nn AS DOUBLE) AS my
        FROM mo
    ),
    st AS (
        SELECT mu.nn, mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE)
                        * ((CAST(x AS DOUBLE) - mu.mx)
                           * (CAST(y AS DOUBLE) - mu.my))
                        ORDER BY x, y)), (a, v) -> a + v)
                   AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE)
                        * ((CAST(x AS DOUBLE) - mu.mx)
                           * (CAST(x AS DOUBLE) - mu.mx))
                        ORDER BY x, y)), (a, v) -> a + v)
                   AS sxx
        FROM p CROSS JOIN mu GROUP BY mu.nn, mu.mx, mu.my
    ),
    ab AS (
        SELECT nn, mx, my, sxx, sxy / sxx AS b,
               my - (sxy / sxx) * mx AS a
        FROM st
    ),
    folds AS (
        SELECT ab.nn, ab.sxx,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE)
                        * ((CAST(y AS DOUBLE)
                            - (ab.a + ab.b
                               * CAST(x AS DOUBLE)))
                           * (CAST(y AS DOUBLE)
                              - (ab.a + ab.b
                                 * CAST(x AS DOUBLE))))
                        ORDER BY x, y)), (p2, v) -> p2 + v)
                   AS sse,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(n AS DOUBLE)
                        * (((CAST(y AS DOUBLE)
                             - (ab.a + ab.b
                                * CAST(x AS DOUBLE)))
                            * (CAST(y AS DOUBLE)
                               - (ab.a + ab.b
                                  * CAST(x AS DOUBLE))))
                           * ((CAST(x AS DOUBLE) - ab.mx)
                              * (CAST(x AS DOUBLE) - ab.mx)))
                        ORDER BY x, y)), (p2, v) -> p2 + v)
                   AS hc0,
               ab.b
        FROM p CROSS JOIN ab
        GROUP BY ab.nn, ab.sxx, ab.b
    )
    SELECT b AS slope,
           sqrt((sse / CAST(nn - 2 AS DOUBLE)) / sxx) AS se_ols,
           sqrt(hc0 / (sxx * sxx)) AS se_hc0
    FROM folds
    """
    return q, sql


def build_wave227_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_blomqvist_beta",) + _blomqvist_query()))
    add(*(("part_price_size_hc0",) + _hc0_query()))
    return queries, oracles
