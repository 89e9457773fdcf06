"""Wave-196 queries: partial correlation, OLS mediation decomposition.

- events_partial_corr: the first-order partial correlation of event
  value (exact cents) with hour-of-day, CONTROLLING for day-of-week:
  r_xy.z = (r_xy - r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)). All
  three Pearson r's come from exact int64 raw moments combined in
  doubles with identical spelling (all variables have real spread,
  so the raw-moment form is safe — the NOTES cancellation rule only
  bites near-constant variables).
- orders_sobel_mediation: the Baron-Kenny mediation decomposition
  with X = weekend order dummy, M = urgent/high-priority dummy,
  Y = order value cents: a = slope(M~X), total c = slope(Y~X),
  b and direct c' from the two-regressor OLS closed forms
  b = (Cmy Cxx - Cxy Cxm)/(Cmm Cxx - Cxm^2),
  c' = (Cxy Cmm - Cmy Cxm)/(Cxx Cmm - Cxm^2),
  indirect = a*b. The exact OLS identity c = c' + a*b is the
  independent check in the unit test.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def partial_corr(n, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz):
    """r_xy.z from integer raw moments; doubles spelled as SQL."""
    fn = float(n)

    def corr(sa, sb, saa, sbb, sab):
        num = fn * float(sab) - float(sa) * float(sb)
        da = fn * float(saa) - float(sa) * float(sa)
        db = fn * float(sbb) - float(sb) * float(sb)
        return num / math.sqrt(da * db)

    rxy = corr(sx, sy, sxx, syy, sxy)
    rxz = corr(sx, sz, sxx, szz, sxz)
    ryz = corr(sy, sz, syy, szz, syz)
    return ((rxy - rxz * ryz)
            / math.sqrt((1.0e0 - rxz * rxz)
                        * (1.0e0 - ryz * ryz)), rxy, rxz, ryz)


def mediation(n, sx, sm, sy, sxx, sxm, sxy, smm, smy):
    """(a, b, total_c, direct, indirect) doubles from int moments."""
    fn = float(n)
    cxx = fn * float(sxx) - float(sx) * float(sx)
    cxm = fn * float(sxm) - float(sx) * float(sm)
    cxy = fn * float(sxy) - float(sx) * float(sy)
    cmm = fn * float(smm) - float(sm) * float(sm)
    cmy = fn * float(smy) - float(sm) * float(sy)
    a = cxm / cxx
    c = cxy / cxx
    b = (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm)
    direct = (cxy * cmm - cmy * cxm) / (cxx * cmm - cxm * cxm)
    return a, b, c, direct, a * b


# ---------------------------------------------- events_partial_corr
def _pcorr_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        cols = ["n", "sx", "sy", "sz", "sxx", "syy", "szz",
                "sxy", "sxz", "syz"]

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            x = (tus // US_PER_HOUR) % 24
            z = ((tus // US_PER_DAY) + 4) % 7
            y = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            vals = [x.size, int(x.sum()), int(y.sum()),
                    int(z.sum()), int((x * x).sum()),
                    int((y * y).sum()), int((z * z).sum()),
                    int((x * y).sum()), int((x * z).sum()),
                    int((y * z).sum())]
            return pa.table({c: pa.array([v], type=pa.int64())
                             for c, v in zip(cols, vals)})

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array([int(t.column(c).to_numpy().sum())],
                            type=pa.int64())
                for c in cols
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas().iloc[0]
        pr, rxy, rxz, ryz = partial_corr(
            *[int(m[c]) for c in cols])
        return pa.table({
            "r_value_hour": pa.array([rxy], type=pa.float64()),
            "r_partial": pa.array([pr], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS x,
               ((epoch_us(ts) // {US_PER_DAY}) + 4) % 7 AS z,
               CAST(round_even(value * 100, 0) AS BIGINT) AS y
        FROM events
    ),
    mo AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(z) AS DOUBLE) AS sz,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(z * z) AS DOUBLE) AS szz,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * z) AS DOUBLE) AS sxz,
               CAST(sum(y * z) AS DOUBLE) AS syz
        FROM e
    ),
    rs AS (
        SELECT
            (fn * sxy - sx * sy)
            / sqrt((fn * sxx - sx * sx)
                   * (fn * syy - sy * sy)) AS rxy,
            (fn * sxz - sx * sz)
            / sqrt((fn * sxx - sx * sx)
                   * (fn * szz - sz * sz)) AS rxz,
            (fn * syz - sy * sz)
            / sqrt((fn * syy - sy * sy)
                   * (fn * szz - sz * sz)) AS ryz
        FROM mo
    )
    SELECT rxy AS r_value_hour,
           (rxy - rxz * ryz)
           / sqrt((1.0e0 - rxz * rxz) * (1.0e0 - ryz * ryz))
               AS r_partial
    FROM rs
    """
    return q, sql


# -------------------------------------------- orders_sobel_mediation
def _mediation_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        cols = ["n", "sx", "sm", "sy", "sxx", "sxm", "sxy",
                "smm", "smy"]

        def partial(t: pa.Table) -> pa.Table:
            day = (t.column("o_orderdate").cast(pa.int64())
                   .to_numpy(zero_copy_only=False) // US_PER_DAY)
            dow = (day + 4) % 7
            x = ((dow == 6) | (dow == 0)).astype(np.int64)
            pr = np.asarray(
                t.column("o_orderpriority").to_pylist())
            mm = ((pr == "1-URGENT") | (pr == "2-HIGH")).astype(
                np.int64)
            y = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            vals = [x.size, int(x.sum()), int(mm.sum()),
                    int(y.sum()), int((x * x).sum()),
                    int((x * mm).sum()), int((x * y).sum()),
                    int((mm * mm).sum()), int((mm * y).sum())]
            return pa.table({c: pa.array([v], type=pa.int64())
                             for c, v in zip(cols, vals)})

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array([int(t.column(c).to_numpy().sum())],
                            type=pa.int64())
                for c in cols
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                         "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas().iloc[0]
        a, b, c, direct, indirect = mediation(
            *[int(m[cc]) for cc in cols])
        return pa.table({
            "a_path": pa.array([a], type=pa.float64()),
            "b_path": pa.array([b], type=pa.float64()),
            "total_c": pa.array([c], type=pa.float64()),
            "direct_c": pa.array([direct], type=pa.float64()),
            "indirect_ab": pa.array([indirect],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT CASE WHEN ((epoch_us(o_orderdate)
                           // {US_PER_DAY}) + 4) % 7 IN (6, 0)
                    THEN 1 ELSE 0 END AS x,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS m,
               CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
                   AS y
        FROM orders
    ),
    mo AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(m) AS DOUBLE) AS sm,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * m) AS DOUBLE) AS sxm,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(m * m) AS DOUBLE) AS smm,
               CAST(sum(m * y) AS DOUBLE) AS smy
        FROM o
    ),
    cc AS (
        SELECT fn * sxx - sx * sx AS cxx,
               fn * sxm - sx * sm AS cxm,
               fn * sxy - sx * sy AS cxy,
               fn * smm - sm * sm AS cmm,
               fn * smy - sm * sy AS cmy
        FROM mo
    )
    SELECT cxm / cxx AS a_path,
           (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm)
               AS b_path,
           cxy / cxx AS total_c,
           (cxy * cmm - cmy * cxm) / (cxx * cmm - cxm * cxm)
               AS direct_c,
           (cxm / cxx)
           * ((cmy * cxx - cxy * cxm)
              / (cmm * cxx - cxm * cxm)) AS indirect_ab
    FROM cc
    """
    return q, sql


def build_wave196_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_partial_corr",) + _pcorr_query()))
    add(*(("orders_sobel_mediation",) + _mediation_query()))
    return queries, oracles
