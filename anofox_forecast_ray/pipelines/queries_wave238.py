"""Wave-238 query: expectile by fixed-point iteration.

events_value_expectile: the tau = 0.9 EXPECTILE of event values —
the asymmetric-least-squares risk measure (the coherent cousin of
VaR/CVaR already covered by events_var_cvar): the unique fixed
point of e = (tau * S_above + (1-tau) * S_below) / (tau * N_above
+ (1-tau) * N_below). Six unrolled iterations from the mean; at
each step the conditional sums/counts ABOVE the current float
threshold are EXACT int64 prefix sums from the bounded cents
histogram (integer-vs-float comparisons are deterministic), so the
whole replay is six divisions deep. Emits the expectile and the
final tail count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

TAU = 0.9e0
EXP_K = 6


def expectile_replay(values: np.ndarray, counts: np.ndarray,
                     tau: float = TAU, k: int = EXP_K):
    """(e, n_above) from the ascending cents histogram."""
    n = int(counts.sum())
    s = int((values * counts).sum())
    e = s / n
    n_above = 0
    for _ in range(k):
        above = values > e
        na = int(counts[above].sum())
        sa = int((values[above] * counts[above]).sum())
        nb = n - na
        sb = s - sa
        e = ((tau * sa + (1.0e0 - tau) * sb)
             / (tau * na + (1.0e0 - tau) * nb))
        n_above = na
    return e, n_above


# ------------------------------------------- events_value_expectile
def _expectile_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("value").to_numpy(
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
            read_cols(sf_dir, "events", ["value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        e, na = expectile_replay(h["v"].to_numpy(np.int64),
                                 h["c"].to_numpy(np.int64))
        return pa.table({
            "expectile_90": pa.array([e], type=pa.float64()),
            "n_above": pa.array([na], type=pa.int64()),
        })

    layers = ["""
    e0 AS MATERIALIZED (
        SELECT CAST((SELECT sum(v * c) FROM hist) AS DOUBLE)
               / CAST((SELECT sum(c) FROM hist) AS DOUBLE)
                   AS e
        FROM (SELECT 1)
    )"""]
    prev = "e0"
    for it in range(1, EXP_K + 1):
        layers.append(f"""
    e{it} AS MATERIALIZED (
        SELECT ({TAU!r} * CAST((SELECT coalesce(sum(v * c), 0)
                    FROM hist
                    WHERE CAST(v AS DOUBLE) > {prev}.e)
                    AS DOUBLE)
                + (1.0e0 - {TAU!r})
                  * (CAST((SELECT sum(v * c) FROM hist)
                     AS DOUBLE)
                     - CAST((SELECT coalesce(sum(v * c), 0)
                        FROM hist
                        WHERE CAST(v AS DOUBLE) > {prev}.e)
                        AS DOUBLE)))
               / ({TAU!r} * CAST((SELECT coalesce(sum(c), 0)
                      FROM hist
                      WHERE CAST(v AS DOUBLE) > {prev}.e)
                      AS DOUBLE)
                  + (1.0e0 - {TAU!r})
                    * (CAST((SELECT sum(c) FROM hist)
                       AS DOUBLE)
                       - CAST((SELECT coalesce(sum(c), 0)
                          FROM hist
                          WHERE CAST(v AS DOUBLE) > {prev}.e)
                          AS DOUBLE))) AS e,
               CAST((SELECT coalesce(sum(c), 0) FROM hist
                     WHERE CAST(v AS DOUBLE) > {prev}.e)
                    AS BIGINT) AS na
        FROM {prev}
    )""")
        prev = f"e{it}"

    sql = f"""
    WITH ev AS (
        SELECT CAST(round_even(value * 100, 0) AS BIGINT) AS v
        FROM events
    ),
    hist AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c
        FROM ev GROUP BY v
    ),
    {",".join(layers)}
    SELECT {prev}.e AS expectile_90, {prev}.na AS n_above
    FROM {prev}
    """
    return q, sql


def build_wave238_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_value_expectile",) + _expectile_query()))
    return queries, oracles
