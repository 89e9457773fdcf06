"""Wave-157 queries: Sinkhorn/IPF balancing, Chow test.

- events_sinkhorn_ipf: iterative proportional fitting (Sinkhorn
  matrix balancing) of the hod x dow event-count table to UNIFORM
  target margins — 5 unrolled row-scale/column-scale sweeps, the
  optimal-transport normalization primitive. Row and column sums
  fold in ascending dow/hod order inside each generated CTE layer,
  scaling is one division per cell, and the reported max margin
  error shows convergence (< 1e-3 after 5 sweeps). Emits the
  summary row (the 168 balanced cells hash through the margins and
  the probe cell).
- part_chow_test: the Chow structural-stability test — is the
  price~size regression the SAME across brands? Per-brand and
  pooled OLS come from exact HUGEINT moments (one division per
  coefficient), each RSS is the closed form Syy - b*Sxy_c with
  two-pass centering avoided via the moment identity, the brand
  RSS fold walks brands in name order, and
  F = ((RSS_p - RSS_s)/(2(k-1))) / (RSS_s/(n - 2k)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
IPF_SWEEPS = 5


# ------------------------------------------------------ events_sinkhorn_ipf
def _ipf_query(sweeps: int = IPF_SWEEPS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "dow": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            dow = (tus // US_PER_DAY) % 7
            key = hod * 7 + dow
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "hod": pa.array(uk // 7),
                "dow": pa.array(uk % 7),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["hod", "dow"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "dow": g.column("dow").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        n = int(cells["c"].sum())
        m = np.zeros((24, 7), dtype=np.float64)
        for _, r in cells.iterrows():
            m[int(r["hod"]), int(r["dow"])] = float(
                int(r["c"]))
        rt = float(n) / 24.0  # uniform row target
        ct = float(n) / 7.0   # uniform col target

        for _s in range(sweeps):
            # row sweep (fold cols in dow order)
            for i in range(24):
                rs = 0.0
                for j in range(7):
                    rs = rs + m[i, j]
                for j in range(7):
                    m[i, j] = m[i, j] * (rt / rs)
            # col sweep (fold rows in hod order)
            for j in range(7):
                cs = 0.0
                for i in range(24):
                    cs = cs + m[i, j]
                for i in range(24):
                    m[i, j] = m[i, j] * (ct / cs)

        max_err = 0.0
        for i in range(24):
            rs = 0.0
            for j in range(7):
                rs = rs + m[i, j]
            d = abs(rs - rt)
            if d > max_err:
                max_err = d
        probe = m[12, 3]
        return pa.table({
            "n_events": pa.array([n], type=pa.int64()),
            "row_target": pa.array([rt], type=pa.float64()),
            "max_row_err": pa.array([max_err],
                                    type=pa.float64()),
            "cell_12_3": pa.array([probe],
                                  type=pa.float64()),
        })

    # generated IPF sweep layers
    layers = []
    prev = "m0"
    for s in range(1, sweeps + 1):
        layers.append(f"""
    r{s} AS MATERIALIZED (
        SELECT hod, dow,
               v * ((SELECT rt FROM tg)
                    / (SELECT list_reduce(list_prepend(0.0e0,
                           list(v2.v ORDER BY v2.dow)),
                           (x, y) -> x + y)
                       FROM {prev} v2
                       WHERE v2.hod = {prev}.hod)) AS v
        FROM {prev}
    ),
    m{s} AS MATERIALIZED (
        SELECT hod, dow,
               v * ((SELECT ct FROM tg)
                    / (SELECT list_reduce(list_prepend(0.0e0,
                           list(v2.v ORDER BY v2.hod)),
                           (x, y) -> x + y)
                       FROM r{s} v2
                       WHERE v2.dow = r{s}.dow)) AS v
        FROM r{s}
    )""")
        prev = f"m{s}"
    layers_sql = ",".join(layers)

    sql = f"""
    WITH cells AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod,
               (epoch_us(ts) // {US_PER_DAY}) % 7 AS dow,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    tg AS (SELECT CAST(n AS DOUBLE) / 24.0e0 AS rt,
                  CAST(n AS DOUBLE) / 7.0e0 AS ct
           FROM nn),
    m0 AS MATERIALIZED (
        SELECT g.hod, g.dow,
               CAST(COALESCE(cells.c, 0) AS DOUBLE) AS v
        FROM (SELECT a.a AS hod, b.b AS dow
              FROM (SELECT unnest(generate_series(0, 23))
                        AS a) a
              CROSS JOIN (SELECT unnest(
                  generate_series(0, 6)) AS b) b) g
        LEFT JOIN cells ON cells.hod = g.hod
                       AND cells.dow = g.dow
    ),{layers_sql},
    err AS (
        SELECT max(abs(rs - (SELECT rt FROM tg)))
                   AS max_row_err
        FROM (
            SELECT hod,
                   list_reduce(list_prepend(0.0e0,
                       list(v ORDER BY dow)),
                       (x, y) -> x + y) AS rs
            FROM m{sweeps} GROUP BY hod
        )
    )
    SELECT (SELECT n FROM nn) AS n_events,
           (SELECT rt FROM tg) AS row_target,
           err.max_row_err AS max_row_err,
           (SELECT v FROM m{sweeps}
            WHERE hod = 12 AND dow = 3) AS cell_12_3
    FROM err
    """
    return q, sql


# ------------------------------------------------------------ part_chow_test
def _chow_query():
    def q(sf_dir: str):
        import ray.data as rd

        emb = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_brand", "p_size", "p_retailprice"]
        ).to_pandas()
        emb["cents"] = np.round(
            emb["p_retailprice"].to_numpy() * 100.0
        ).astype(np.int64)
        emb["size"] = emb["p_size"].astype(np.int64)

        def fit_rss(sub):
            n = len(sub)
            x = [int(v) for v in sub["size"]]
            y = [int(v) for v in sub["cents"]]
            sx = sum(x)
            sy = sum(y)
            sxx = sum(v * v for v in x)
            sxy = sum(a * b for a, b in zip(x, y))
            syy = sum(v * v for v in y)
            den = n * sxx - sx * sx
            b = float(n * sxy - sx * sy) / float(den)
            # RSS = Syy_c - b * Sxy_c with centered moments as
            # exact integer combinations over n
            syy_c = float(n * syy - sy * sy) / float(n)
            sxy_c = float(n * sxy - sx * sy) / float(n)
            rss = syy_c - b * sxy_c
            return n, rss

        n_tot, rss_p = fit_rss(emb)
        brands = sorted(emb["p_brand"].unique())
        k = len(brands)
        rss_s = 0.0
        for bname in brands:
            _nb, rb = fit_rss(emb[emb["p_brand"] == bname])
            rss_s = rss_s + rb
        df1 = 2 * (k - 1)
        df2 = n_tot - 2 * k
        f_stat = ((rss_p - rss_s) / float(df1)) \
            / (rss_s / float(df2))
        return pa.table({
            "n_parts": pa.array([n_tot], type=pa.int64()),
            "k_brands": pa.array([k], type=pa.int64()),
            "rss_pooled": pa.array([rss_p],
                                   type=pa.float64()),
            "rss_separate": pa.array([rss_s],
                                     type=pa.float64()),
            "f_chow": pa.array([f_stat], type=pa.float64()),
        })

    sql = """
    WITH p AS (
        SELECT p_brand AS b,
               CAST(p_size AS BIGINT) AS x,
               CAST(round_even(p_retailprice * 100, 0)
                    AS BIGINT) AS y
        FROM part
    ),
    gm AS (
        SELECT b,
               CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT)
                   AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT)
                   AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy
        FROM p GROUP BY b
    ),
    grss AS (
        SELECT b,
               (CAST(n * syy - sy * sy AS DOUBLE)
                / CAST(n AS DOUBLE))
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS rss
        FROM gm
    ),
    tm AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT)
                   AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT)
                   AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy
        FROM p
    ),
    prss AS (
        SELECT CAST(n AS BIGINT) AS n_tot,
               (CAST(n * syy - sy * sy AS DOUBLE)
                / CAST(n AS DOUBLE))
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS rss_p
        FROM tm
    ),
    srss AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               list_reduce(list_prepend(0.0e0,
                   list(rss ORDER BY b)),
                   (x, y) -> x + y) AS rss_s
        FROM grss
    )
    SELECT prss.n_tot AS n_parts,
           srss.k AS k_brands,
           prss.rss_p AS rss_pooled,
           srss.rss_s AS rss_separate,
           ((prss.rss_p - srss.rss_s)
            / CAST(2 * (srss.k - 1) AS DOUBLE))
           / (srss.rss_s
              / CAST(prss.n_tot - 2 * srss.k AS DOUBLE))
               AS f_chow
    FROM prss CROSS JOIN srss
    """
    return q, sql


def build_wave157_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_sinkhorn_ipf",) + _ipf_query()))
    add(*(("part_chow_test",) + _chow_query()))
    return queries, oracles
