"""Wave-241 query: bimodality coefficient.

orders_bimodality: the SAS bimodality coefficient
BC = (g1^2 + 1) / (g2 + 3(n-1)^2 / ((n-2)(n-3))) with the sample
skewness g1 and EXCESS kurtosis g2 built from exact integer
moments of order value in THOUSAND-dollar units (fourth powers of
cents would overflow int64): m_r = central moments from raw S1..S4
via the explicit binomial expansions, g1 = (k3 formula), g2 =
(k4 formula) — every float op a single division or spelled
product, identical on both sides. BC > 5/9 suggests bimodality.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def bimodality(n, s1, s2, s3, s4):
    """(g1, g2, bc) from raw integer power sums."""
    fn = float(n)
    m = s1 / n
    # central moments via explicit expansions (floats of exact
    # ints; all raw sums < 2^53 by the k$ scaling)
    m2 = (float(s2) - 2.0e0 * m * float(s1) + fn * m * m) / fn
    m3 = (float(s3) - 3.0e0 * m * float(s2)
          + 3.0e0 * m * m * float(s1) - fn * m * m * m) / fn
    m4 = (float(s4) - 4.0e0 * m * float(s3)
          + 6.0e0 * m * m * float(s2)
          - 4.0e0 * m * m * m * float(s1)
          + fn * m * m * m * m) / fn
    # sample skewness / excess kurtosis (adjusted)
    g1 = (math.sqrt(fn * (fn - 1.0e0)) / (fn - 2.0e0)) \
        * (m3 / (m2 * math.sqrt(m2)))
    g2 = ((fn - 1.0e0) / ((fn - 2.0e0) * (fn - 3.0e0))) \
        * ((fn + 1.0e0) * (m4 / (m2 * m2) - 3.0e0) + 6.0e0)
    bc = (g1 * g1 + 1.0e0) \
        / (g2 + 3.0e0 * ((fn - 1.0e0) * (fn - 1.0e0))
           / ((fn - 2.0e0) * (fn - 3.0e0)))
    return g1, g2, bc


# ------------------------------------------------- orders_bimodality
def _bimod_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            kd = (np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
                // 100000)
            vals = [kd.size, int(kd.sum()),
                    int((kd ** 2).sum()), int((kd ** 3).sum()),
                    int((kd.astype(object) ** 4).sum())]
            return pa.table({c: pa.array([v], type=pa.int64())
                             for c, v in zip(
                                 ("n", "s1", "s2", "s3", "s4"),
                                 vals)})

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array([int(t.column(c).to_numpy().sum())],
                            type=pa.int64())
                for c in ("n", "s1", "s2", "s3", "s4")
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas().iloc[0]
        g1, g2, bc = bimodality(int(mm["n"]), int(mm["s1"]),
                                int(mm["s2"]), int(mm["s3"]),
                                int(mm["s4"]))
        return pa.table({
            "skew_g1": pa.array([g1], type=pa.float64()),
            "exkurt_g2": pa.array([g2], type=pa.float64()),
            "bimodality_bc": pa.array([bc], type=pa.float64()),
        })

    sql = """
    WITH o AS (
        SELECT CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
               // 100000 AS v
        FROM orders
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(v * v) AS BIGINT) AS s2,
               CAST(sum(v * v * v) AS BIGINT) AS s3,
               CAST(sum(v * v * v * v) AS BIGINT) AS s4
        FROM o
    ),
    m AS (
        SELECT fn,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               CAST(s1 AS DOUBLE) AS f1,
               CAST(s2 AS DOUBLE) AS f2,
               CAST(s3 AS DOUBLE) AS f3,
               CAST(s4 AS DOUBLE) AS f4
        FROM s
    ),
    cm AS (
        SELECT fn,
               (f2 - 2.0e0 * mu * f1 + fn * mu * mu) / fn AS m2,
               (f3 - 3.0e0 * mu * f2 + 3.0e0 * mu * mu * f1
                - fn * mu * mu * mu) / fn AS m3,
               (f4 - 4.0e0 * mu * f3 + 6.0e0 * mu * mu * f2
                - 4.0e0 * mu * mu * mu * f1
                + fn * mu * mu * mu * mu) / fn AS m4
        FROM m
    ),
    gg AS (
        SELECT fn,
               (sqrt(fn * (fn - 1.0e0)) / (fn - 2.0e0))
               * (m3 / (m2 * sqrt(m2))) AS g1,
               ((fn - 1.0e0) / ((fn - 2.0e0) * (fn - 3.0e0)))
               * ((fn + 1.0e0) * (m4 / (m2 * m2) - 3.0e0)
                  + 6.0e0) AS g2
        FROM cm
    )
    SELECT g1 AS skew_g1, g2 AS exkurt_g2,
           (g1 * g1 + 1.0e0)
           / (g2 + 3.0e0 * ((fn - 1.0e0) * (fn - 1.0e0))
              / ((fn - 2.0e0) * (fn - 3.0e0)))
               AS bimodality_bc
    FROM gg
    """
    return q, sql


def build_wave241_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_bimodality",) + _bimod_query()))
    return queries, oracles
