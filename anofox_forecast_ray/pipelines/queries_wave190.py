"""Wave-190 queries: Hotelling T-squared, Bartlett's test.

- lineitem_hotelling_t2: the two-sample Hotelling T^2 test — the
  multivariate generalization of the t-test — comparing returned
  ('R') vs kept ('N') line items on the 2-D feature (quantity,
  rounded extendedprice DOLLARS — cents-squared sums would overflow
  int64 at sf0.1; dollar moments stay exact past sf10). sy^2 still
  exceeds int64, so both sides square it as exact-double *
  exact-double (deterministic single rounding); the
  pooled covariance is (raw1 + raw2)/(n-2); the 2x2 inverse is
  closed-form; T2 = (n1 n2/(n1+n2)) d' S^-1 d. Checked against
  numpy.cov/inv in the unit test (wave-99 rule).
- source_bartlett: Bartlett's chi-square for homogeneity of doc
  length variance across the 20 sources: X2 = [(N-k) ln sp2 -
  sum (n_i - 1) ln s2_i] / C with the standard small-sample factor
  C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)). Per-source int
  moments; one scalar ln per source folded in source order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def hotelling_from_moments(m1, m2):
    """m = (n, sx, sy, sxx, sxy, syy) integer moments per group.
    Returns (t2, f_stat). All float ops spelled to match the SQL."""
    def raw(m):
        n, sx, sy, sxx, sxy, syy = m
        fn = float(n)
        rxx = float(sxx) - float(sx) * float(sx) / fn
        rxy = float(sxy) - float(sx) * float(sy) / fn
        ryy = float(syy) - float(sy) * float(sy) / fn
        return fn, float(sx) / fn, float(sy) / fn, rxx, rxy, ryy

    n1, mx1, my1, rxx1, rxy1, ryy1 = raw(m1)
    n2, mx2, my2, rxx2, rxy2, ryy2 = raw(m2)
    dof = n1 + n2 - 2.0e0
    sxx = (rxx1 + rxx2) / dof
    sxy = (rxy1 + rxy2) / dof
    syy = (ryy1 + ryy2) / dof
    det = sxx * syy - sxy * sxy
    d1 = mx1 - mx2
    d2 = my1 - my2
    quad = (d1 * d1 * syy - 2.0e0 * d1 * d2 * sxy
            + d2 * d2 * sxx) / det
    t2 = (n1 * n2 / (n1 + n2)) * quad
    f = t2 * (n1 + n2 - 3.0e0) / (2.0e0 * (n1 + n2 - 2.0e0))
    return t2, f


def bartlett_from_moments(ns, s1s, s2s):
    """Per-group int moments in group order -> (chi2, df)."""
    k = len(ns)
    N = sum(ns)
    # group variances (ddof=1), sequential in group order
    vs = []
    for n, s1, s2 in zip(ns, s1s, s2s):
        v = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
        vs.append(v)
    spnum = 0.0
    for n, v in zip(ns, vs):
        spnum = spnum + (n - 1) * v
    sp2 = spnum / (N - k)
    lnsum = 0.0
    for n, v in zip(ns, vs):
        lnsum = lnsum + (n - 1) * math.log(v)
    invsum = 0.0
    for n in ns:
        invsum = invsum + 1.0 / (n - 1)
    c = 1.0e0 + (invsum - 1.0e0 / (N - k)) / (3.0e0 * (k - 1))
    chi2 = ((N - k) * math.log(sp2) - lnsum) / c
    return chi2, k - 1


# ---------------------------------------------- lineitem_hotelling_t2
def _hotelling_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            rf = np.asarray(t.column("l_returnflag").to_pylist())
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            dollars = np.round(t.column("l_extendedprice").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            rows = {"g": [], "n": [], "sx": [], "sy": [],
                    "sxx": [], "sxy": [], "syy": []}
            for g, flag in ((0, "R"), (1, "N")):
                m = rf == flag
                x = qty[m]
                y = dollars[m]
                rows["g"].append(g)
                rows["n"].append(int(m.sum()))
                rows["sx"].append(int(x.sum()))
                rows["sy"].append(int(y.sum()))
                rows["sxx"].append(int((x * x).sum()))
                rows["sxy"].append(int((x * y).sum()))
                rows["syy"].append(int((y * y).sum()))
            return pa.table({
                "g": pa.array(rows["g"], type=pa.int64()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "sx": pa.array(rows["sx"], type=pa.int64()),
                "sy": pa.array(rows["sy"], type=pa.int64()),
                "sxx": pa.array(rows["sxx"], type=pa.int64()),
                "sxy": pa.array(rows["sxy"], type=pa.int64()),
                "syy": pa.array(rows["syy"], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("g").aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                 ("sxx", "sum"), ("sxy", "sum"), ("syy", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "sx": g.column("sx_sum").cast(pa.int64()),
                "sy": g.column("sy_sum").cast(pa.int64()),
                "sxx": g.column("sxx_sum").cast(pa.int64()),
                "sxy": g.column("sxy_sum").cast(pa.int64()),
                "syy": g.column("syy_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_returnflag", "l_quantity",
                         "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.set_index("g")

        def row(g):
            r = m.loc[g]
            return (int(r["n"]), int(r["sx"]), int(r["sy"]),
                    int(r["sxx"]), int(r["sxy"]), int(r["syy"]))

        t2, f = hotelling_from_moments(row(0), row(1))
        n1, n2 = int(m.loc[0, "n"]), int(m.loc[1, "n"])
        return pa.table({
            "n_r": pa.array([n1], type=pa.int64()),
            "n_n": pa.array([n2], type=pa.int64()),
            "t2": pa.array([t2], type=pa.float64()),
            "f_stat": pa.array([f], type=pa.float64()),
        })

    sql = """
    WITH li AS (
        SELECT l_returnflag AS rf,
               CAST(round_even(l_quantity, 0) AS BIGINT) AS x,
               CAST(round_even(l_extendedprice, 0) AS BIGINT) AS y
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    g AS (
        SELECT CASE WHEN rf = 'R' THEN 0 ELSE 1 END AS grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM li GROUP BY 1
    ),
    raws AS (
        SELECT grp, CAST(n AS DOUBLE) AS fn,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
               CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   / CAST(n AS DOUBLE) AS rxx,
               CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS rxy,
               CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ryy
        FROM g
    ),
    pooled AS (
        SELECT
            (SELECT fn FROM raws WHERE grp = 0) AS n1,
            (SELECT fn FROM raws WHERE grp = 1) AS n2,
            (SELECT mx FROM raws WHERE grp = 0)
              - (SELECT mx FROM raws WHERE grp = 1) AS d1,
            (SELECT my FROM raws WHERE grp = 0)
              - (SELECT my FROM raws WHERE grp = 1) AS d2,
            ((SELECT rxx FROM raws WHERE grp = 0)
             + (SELECT rxx FROM raws WHERE grp = 1))
            / ((SELECT fn FROM raws WHERE grp = 0)
               + (SELECT fn FROM raws WHERE grp = 1) - 2.0e0)
                AS sxx,
            ((SELECT rxy FROM raws WHERE grp = 0)
             + (SELECT rxy FROM raws WHERE grp = 1))
            / ((SELECT fn FROM raws WHERE grp = 0)
               + (SELECT fn FROM raws WHERE grp = 1) - 2.0e0)
                AS sxy,
            ((SELECT ryy FROM raws WHERE grp = 0)
             + (SELECT ryy FROM raws WHERE grp = 1))
            / ((SELECT fn FROM raws WHERE grp = 0)
               + (SELECT fn FROM raws WHERE grp = 1) - 2.0e0)
                AS syy
        FROM (SELECT 1)
    ),
    t AS (
        SELECT n1, n2,
               (n1 * n2 / (n1 + n2))
               * ((d1 * d1 * syy - 2.0e0 * d1 * d2 * sxy
                   + d2 * d2 * sxx)
                  / (sxx * syy - sxy * sxy)) AS t2
        FROM pooled
    )
    SELECT CAST(n1 AS BIGINT) AS n_r, CAST(n2 AS BIGINT) AS n_n,
           t2,
           t2 * (n1 + n2 - 3.0e0)
               / (2.0e0 * (n1 + n2 - 2.0e0)) AS f_stat
    FROM t
    """
    return q, sql


# -------------------------------------------------- source_bartlett
def _bartlett_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            uk = np.unique(src)
            rows = {"src": [], "n": [], "s1": [], "s2": []}
            for s in uk:
                m = src == s
                x = v[m]
                rows["src"].append(str(s))
                rows["n"].append(int(m.sum()))
                rows["s1"].append(int(x.sum()))
                rows["s2"].append(int((x * x).sum()))
            return pa.table({
                "src": pa.array(rows["src"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "s1": pa.array(rows["s1"], type=pa.int64()),
                "s2": pa.array(rows["s2"], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("src").aggregate(
                [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            return pa.table({
                "src": g.column("src").cast(pa.string()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s1": g.column("s1_sum").cast(pa.int64()),
                "s2": g.column("s2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("src").reset_index(drop=True)
        chi2, df = bartlett_from_moments(
            [int(v) for v in m["n"]],
            [int(v) for v in m["s1"]],
            [int(v) for v in m["s2"]])
        return pa.table({
            "k_groups": pa.array([df + 1], type=pa.int64()),
            "chi2_bartlett": pa.array([chi2], type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT source AS src,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS s1,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        FROM documents GROUP BY source
    ),
    v AS (
        SELECT src, n,
               (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
                   AS s2i
        FROM g
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS k
        FROM v
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(n - 1 AS DOUBLE) * s2i ORDER BY src)),
                (p, x) -> p + x) AS spnum,
            list_reduce(list_prepend(0.0e0,
                list(CAST(n - 1 AS DOUBLE) * ln(s2i)
                     ORDER BY src)), (p, x) -> p + x) AS lnsum,
            list_reduce(list_prepend(0.0e0,
                list(1.0e0 / CAST(n - 1 AS DOUBLE) ORDER BY src)),
                (p, x) -> p + x) AS invsum
        FROM v
    )
    SELECT tot.k AS k_groups,
           (CAST(tot.nn - tot.k AS DOUBLE)
            * ln(folds.spnum / CAST(tot.nn - tot.k AS DOUBLE))
            - folds.lnsum)
           / (1.0e0 + (folds.invsum
                       - 1.0e0 / CAST(tot.nn - tot.k AS DOUBLE))
                      / (3.0e0 * CAST(tot.k - 1 AS DOUBLE)))
               AS chi2_bartlett
    FROM tot CROSS JOIN folds
    """
    return q, sql


def build_wave190_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_hotelling_t2",) + _hotelling_query()))
    add(*(("source_bartlett",) + _bartlett_query()))
    return queries, oracles
