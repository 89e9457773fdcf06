"""Wave-279 query: greedy knapsack selection over parts.

part_knapsack_greedy: the classic value-density greedy for the 0/1
knapsack — order parts by retail-price-per-size (identical float
ratios on both sides, partkey tiebreak), take while the EXACT
integer size prefix fits the budget Σsize/10 (skip-none variant:
stop at the first overflow, the textbook greedy bound).  Emits the
take count, exact value/size totals in cents/units, utilization and
the density cut-off.  Greedy-vs-optimal gap is bounded by one item —
asserted against a DP optimum on small random instances.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def knapsack_greedy(items):
    """(budget, n_taken, value, size, cutoff_ratio) — items are
    (partkey, size, value_cents); stop at first overflow."""
    budget = sum(s for _, s, _ in items) // 10
    ordered = sorted(
        items, key=lambda r: (-(float(r[2]) / float(r[1])), r[0]))
    taken = 0
    tot_v = 0
    tot_s = 0
    cutoff = None
    for pk, s, v in ordered:
        if tot_s + s > budget:
            break
        taken += 1
        tot_v += v
        tot_s += s
        cutoff = float(v) / float(s)
    return budget, taken, tot_v, tot_s, cutoff


def _knapsack_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_size", "p_retailprice"])
        pk = [int(v) for v in t.column("p_partkey").to_pylist()]
        sz = [int(v) for v in t.column("p_size").to_pylist()]
        cents = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        items = list(zip(pk, sz, [int(v) for v in cents]))
        budget, n, v, s, cut = knapsack_greedy(items)
        return pa.table({
            "budget": pa.array([budget], type=pa.int64()),
            "n_taken": pa.array([n], type=pa.int64()),
            "value_cents": pa.array([v], type=pa.int64()),
            "size_used": pa.array([s], type=pa.int64()),
            "utilization": pa.array(
                [float(s) / float(budget)], type=pa.float64()),
            "cutoff_density": pa.array([cut], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT p_partkey AS pk,
               CAST(p_size AS BIGINT) AS s,
               CAST(round_even(p_retailprice * 100, 0) AS BIGINT)
                   AS v
        FROM part
    ),
    bb AS (
        SELECT CAST(sum(s) // 10 AS BIGINT) AS budget FROM base
    ),
    ranked AS (
        SELECT pk, s, v,
               CAST(v AS DOUBLE) / CAST(s AS DOUBLE) AS dens,
               CAST(sum(s) OVER (
                   ORDER BY CAST(v AS DOUBLE) / CAST(s AS DOUBLE)
                            DESC, pk ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM base
    ),
    taken AS (
        SELECT * FROM ranked
        WHERE cum <= (SELECT budget FROM bb)
    )
    SELECT (SELECT budget FROM bb) AS budget,
           CAST(count(*) AS BIGINT) AS n_taken,
           CAST(sum(v) AS BIGINT) AS value_cents,
           CAST(max(cum) AS BIGINT) AS size_used,
           CAST(max(cum) AS DOUBLE)
               / CAST((SELECT budget FROM bb) AS DOUBLE)
               AS utilization,
           min(dens) AS cutoff_density
    FROM taken
    """
    return q, sql


def build_wave279_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("part_knapsack_greedy",) + _knapsack_query()))
    return queries, oracles
