"""Wave-226 query: Bowley skewness and Moors kurtosis.

customer_bowley_moors: the QUANTILE-based robust shape measures over
account-balance cents — Bowley (quartile) skewness
(q3 + q1 - 2 q2)/(q3 - q1) and Moors (octile) kurtosis
((e7 - e5) + (e3 - e1))/(e6 - e2). All octile fractions k/8 are
exact binary, so np.quantile's linear interpolation matches DuckDB
quantile_cont bitwise on integer inputs (the NOTES quarter-fraction
identity extends to any dyadic fraction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def bowley_moors(vals: np.ndarray):
    e = [float(np.quantile(vals, k / 8)) for k in range(1, 8)]
    q1, q2, q3 = e[1], e[3], e[5]
    bowley = (q3 + q1 - 2.0e0 * q2) / (q3 - q1)
    moors = ((e[6] - e[4]) + (e[2] - e[0])) / (e[5] - e[1])
    return bowley, moors


# ----------------------------------------------- customer_bowley_moors
def _bm_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("c_acctbal").to_numpy(
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
            read_cols(sf_dir, "customer", ["c_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        vals = np.repeat(h["v"].to_numpy(np.int64),
                         h["c"].to_numpy(np.int64))
        bowley, moors = bowley_moors(vals)
        return pa.table({
            "bowley_skew": pa.array([bowley],
                                    type=pa.float64()),
            "moors_kurt": pa.array([moors], type=pa.float64()),
        })

    octs = ", ".join(
        f"quantile_cont(v, {k}.0e0 / 8.0e0) AS e{k}"
        for k in range(1, 8))
    sql = f"""
    WITH c AS (
        SELECT CAST(round_even(c_acctbal * 100, 0) AS BIGINT)
                   AS v
        FROM customer
    ),
    qs AS (SELECT {octs} FROM c)
    SELECT (e6 + e2 - 2.0e0 * e4) / (e6 - e2) AS bowley_skew,
           ((e7 - e5) + (e3 - e1)) / (e6 - e2) AS moors_kurt
    FROM qs
    """
    return q, sql


def build_wave226_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_bowley_moors",) + _bm_query()))
    return queries, oracles
