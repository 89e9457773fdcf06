"""Round-3 scale hardening of extras/components.py (VERDICT r2 item 3):

- the distributed label-propagation path is bucket-VECTORIZED (two coarse
  groupbys per round, no per-node UDFs) — exercised here on a graph 10x+
  the wave-13 tests' node count with the fast path disabled;
- corpus assignment no longer builds a driver dict: broadcast path ships
  two sorted int64 arrays, and above ``broadcast_map_limit`` a bucketed
  groupby-join runs instead — both must agree bitwise.
"""

import numpy as np
import pyarrow as pa
import pytest


def _uf(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_table(pairs):
    return pa.table(
        {
            "doc_a": pa.array([str(a) for a, _ in pairs], type=pa.string()),
            "doc_b": pa.array([str(b) for _, b in pairs], type=pa.string()),
        }
    )


def _big_graph():
    """~3.3k nodes / 3.3k edges (>=10x the wave-13 graphs): 50-node chain
    (multi-round convergence), 100 cliques of 8, random background."""
    rng = np.random.default_rng(42)
    pairs = [(i, i + 1) for i in range(1000, 1050)]  # chain
    for c in range(100):  # cliques
        base = 10_000 + 100 * c
        members = [base + k for k in range(8)]
        pairs += [(members[i], members[j])
                  for i in range(8) for j in range(i + 1, 8)]
    ab = rng.choice(3000, size=(500, 2), replace=True)
    pairs += [(int(a), int(b)) for a, b in ab if a != b]
    return pairs


def test_cc_distributed_path_at_10x_scale(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.components import connected_components

    pairs = _big_graph()
    out = connected_components(
        rd.from_arrow(_pairs_table(pairs)),
        small_graph_limit=0,  # force bucket-vectorized propagation
        max_iters=64,         # 50-chain needs many rounds
    ).to_pandas()
    got = dict(zip(out["node"].astype(int), out["component"].astype(int)))
    assert got == _uf(pairs)
    # output is one row per node (no duplicate labels survive a round)
    assert out["node"].is_unique


def test_cc_pointer_doubling_chain_logn_rounds(ray_session):
    """VERDICT r4 item 1: a 1000-node chain (diameter 999) must converge
    in O(log n) rounds, not O(diameter) — the pointer-doubling shortcut
    is what makes a chain-shaped 100 TB dup graph feasible. Pin at
    ceil(log2(1000)) + 2 = 12 rounds."""
    import math

    import ray.data as rd

    from anofox_forecast_ray.extras.components import connected_components

    n = 1000
    pairs = [(i, i + 1) for i in range(n - 1)]
    stats = {}
    out = connected_components(
        rd.from_arrow(_pairs_table(pairs)),
        small_graph_limit=0,  # force the distributed path
        stats=stats,
    ).to_pandas()
    got = dict(zip(out["node"].astype(int), out["component"].astype(int)))
    assert got == {i: 0 for i in range(n)}
    assert out["node"].is_unique
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 2, stats


def test_assignment_paths_agree(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.components import (
        AssignComponents,
        _assign_by_groupby_join,
        connected_components,
    )
    import ray

    pairs = [(1, 2), (2, 3), (10, 11), (500, 501), (501, 502)]
    comp = connected_components(
        rd.from_arrow(_pairs_table(pairs))
    ).materialize()
    ids = pa.table(
        {"doc_id": pa.array(list(range(600)), type=pa.int64())}
    )

    # scale path: bucketed groupby-join
    got_join = (
        _assign_by_groupby_join(comp, rd.from_arrow(ids))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # broadcast path: sorted-array searchsorted stage
    tbl = pa.concat_tables(ray.get(comp.to_arrow_refs()))
    nodes = tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    comps = tbl.column("component").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], comps[order]))
    got_bcast = (
        rd.from_arrow(ids)
        .map_batches(AssignComponents, batch_format="pyarrow",
                     concurrency=2, fn_constructor_args=(ref,))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    assert got_join[["doc_id", "component", "keep"]].equals(
        got_bcast[["doc_id", "component", "keep"]]
    )
    # spot truths: 1-2-3 cluster keeps only 1; untouched docs keep
    m = got_join.set_index("doc_id")
    assert m.loc[2, "component"] == 1 and m.loc[2, "keep"] == 0
    assert m.loc[1, "keep"] == 1
    assert m.loc[400, "component"] == 400 and m.loc[400, "keep"] == 1
    assert m.loc[502, "component"] == 500


def test_assignment_empty_map(ray_session):
    """No duplicate pairs at all -> every doc keeps itself (empty sorted
    arrays must not crash the searchsorted stage)."""
    import ray
    import ray.data as rd

    from anofox_forecast_ray.extras.components import AssignComponents

    ids = pa.table({"doc_id": pa.array([5, 6], type=pa.int64())})
    ref = ray.put(
        (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    )
    out = (
        rd.from_arrow(ids)
        .map_batches(AssignComponents, batch_format="pyarrow",
                     concurrency=1, fn_constructor_args=(ref,))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["keep"].tolist() == [1, 1]
    assert out["component"].tolist() == [5, 6]
