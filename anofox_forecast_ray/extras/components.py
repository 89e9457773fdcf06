"""Connected components over near-duplicate pairs -> corpus dedup keep-list.

Completes the dedup family (extras/dedup.py: exact hash, MinHash/LSH,
SimHash, n-gram Jaccard pair finders): candidate PAIRS are only half the
job — a training-data pipeline must turn them into CLUSTERS and keep one
canonical document per cluster. The reference stops at pairwise
similarity scores (see the similarity tests around
tests/statsforecast_comparison.rs and src/preprocessing); the component
step is the scale extension a 100 TB corpus needs before dropping
duplicates.

Algorithm: iterative min-label propagation. Every node starts labelled
min(self, neighbours) (the first round is fused into initialisation);
each subsequent round every node takes the min of its own label and its
neighbours' labels. Monotone decreasing with fixpoint = component
minimum, reached in O(graph diameter) rounds — near-dup clusters are
dense (LSH buckets induce cliques), so 2–4 rounds in practice.

Scale shape per round: one groupby joins labels onto directed edges
(union + tag trick — Ray Data has no native join), one groupby takes the
per-node min, plus a scalar `sum` for the convergence check. Only
(int64, int64) rows ever shuffle — document text never moves. Labels
are materialized per round (iterative algorithm: without a checkpoint
each round would re-execute the whole prior lineage). The final cluster
map covers only documents that appear in some duplicate pair — a tiny
fraction of the corpus — so it broadcasts via ray.put and the
corpus-wide keep-list is a map_batches dictionary lookup, never a
corpus shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _directed_edges(pairs) -> "ray.data.Dataset":  # noqa: F821
    """(doc_a, doc_b) string pairs -> both-direction int64 (src, dst)."""

    def expand(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("doc_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate((a, b)), type=pa.int64()),
                "dst": pa.array(np.concatenate((b, a)), type=pa.int64()),
            }
        )

    return pairs.map_batches(expand, batch_format="pyarrow")


def _components_small(edges_df) -> "ray.data.Dataset":  # noqa: F821
    """Union-find over a driver-resident edge list. The duplicate-pair
    graph is orders of magnitude smaller than the corpus (only docs in
    >=1 near-dup pair appear), so below ``small_graph_limit`` edges we
    skip the per-round Ray shuffle overhead entirely — identical output
    to the distributed propagation (equality-tested)."""
    import ray.data as rd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_df["src"], edges_df["dst"]):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "component": pa.array(
                    [find(n) for n in nodes], type=pa.int64()
                ),
            }
        )
    )


def connected_components(pairs, max_iters: int = 16,
                         small_graph_limit: int = 2_000_000):
    """Dataset(doc_a, doc_b) -> Dataset(node int64, component int64).

    Only nodes that appear in some pair are returned. Graphs with at
    most ``small_graph_limit`` directed edges take the driver union-find
    fast path (the dup graph is the small side by construction; a round
    of distributed propagation costs several fixed-overhead shuffles).
    Larger graphs run iterated min-label propagation; RuntimeError if
    not converged after ``max_iters`` rounds (component diameter >
    max_iters; raise the cap for pathological chain-shaped graphs).
    """
    import pandas as pd

    edges = _directed_edges(pairs).materialize()
    if edges.count() <= small_graph_limit:
        return _components_small(edges.to_pandas())

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        node = int(g["src"].iloc[0])
        lbl = min(node, int(g["dst"].min()))
        return pd.DataFrame({"node": [node], "label": [lbl]})

    labels = (
        edges.groupby("src").map_groups(init_labels, batch_format="pandas")
    ).materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t.column("node").cast(pa.int64()),
                "other": pa.array(np.full(n, -1, dtype=np.int64)),
                "lbl": t.column("label").cast(pa.int64()),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t.column("src"),
                "other": t.column("dst"),
                "lbl": pa.array(np.full(n, -1, dtype=np.int64)),
            }
        )

    def relay(g: pd.DataFrame) -> pd.DataFrame:
        # exactly one label row (other == -1) per key by construction
        lbl = int(g.loc[g["other"] == -1, "lbl"].iloc[0])
        nbrs = g.loc[g["other"] != -1, "other"].to_numpy(np.int64)
        node = np.concatenate(([int(g["key"].iloc[0])], nbrs))
        cand = np.full(node.size, lbl, dtype=np.int64)
        is_self = np.zeros(node.size, dtype=np.int64)
        is_self[0] = 1
        return pd.DataFrame({"node": node, "cand": cand, "is_self": is_self})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        new = int(g["cand"].min())
        old = int(g.loc[g["is_self"] == 1, "cand"].iloc[0])
        return pd.DataFrame(
            {
                "node": [int(g["node"].iloc[0])],
                "label": [new],
                "changed": [1 if new < old else 0],
            }
        )

    for _ in range(max_iters):
        msgs = labels.map_batches(tag_labels, batch_format="pyarrow").union(
            edges.map_batches(tag_edges, batch_format="pyarrow")
        )
        relayed = msgs.groupby("key").map_groups(relay, batch_format="pandas")
        labels = (
            relayed.groupby("node").map_groups(combine, batch_format="pandas")
        ).materialize()
        if labels.sum("changed") == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: not converged in {max_iters} rounds"
        )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t.column("node"), "component": t.column("label")}
        )

    return labels.map_batches(project, batch_format="pyarrow")


class AssignComponents:
    """map_batches(pyarrow) actor stage: corpus docs -> (doc_id,
    component, keep). The cluster map arrives as an object-store ref
    (ray.put once, zero-copy read per actor) — the broadcast-small-side
    join discipline."""

    def __init__(self, comp_ref):
        import ray

        comp = ray.get(comp_ref)
        self.comp = comp  # dict[int, int]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        comp = self.comp
        out = np.fromiter(
            (comp.get(int(i), int(i)) for i in ids), dtype=np.int64,
            count=ids.size,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "component": pa.array(out, type=pa.int64()),
                "keep": pa.array(
                    (out == ids).astype(np.int32), type=pa.int32()
                ),
            }
        )


def dedup_components(docs_pairs, docs_ids, max_iters: int = 16):
    """Full dedup assignment: near-dup pairs -> clusters -> keep-list.

    docs_pairs: Dataset(doc_id, text) fed to the MinHash pair finder.
    docs_ids:   Dataset(doc_id) — the whole corpus (ids only; prune the
                read to this single column).
    Returns Dataset(doc_id, component, keep) over the WHOLE corpus:
    component = min doc_id of the near-dup cluster (own id when unique),
    keep = 1 iff this doc is its cluster's canonical representative.
    """
    import ray

    from .dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(
        docs_pairs, threshold=0.5, max_bucket=None
    )
    comp = connected_components(pairs, max_iters=max_iters)
    # the cluster map covers only docs in >=1 near-dup pair: the small
    # side by construction. Broadcast once, look up per batch.
    pdf = comp.to_pandas()
    comp_ref = ray.put(
        dict(
            zip(
                pdf["node"].astype(np.int64).tolist(),
                pdf["component"].astype(np.int64).tolist(),
            )
        )
    )
    return docs_ids.map_batches(
        AssignComponents,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_args=(comp_ref,),
    )


def dedup_components_sql(num_perm: int = 64, bands: int = 16,
                         seed: int = 42, threshold: float = 0.5,
                         shingle_k: int = 5) -> str:
    """DuckDB oracle: same MinHash pair SQL, then exact transitive
    closure by recursive CTE, min label per component, LEFT JOIN back to
    the corpus for the keep-list."""
    from .dedup import minhash_pairs_sql

    pairs = minhash_pairs_sql(num_perm, bands, seed, threshold, shingle_k)
    return f"""
    WITH RECURSIVE pr AS ({pairs}),
    e AS (
        SELECT CAST(doc_a AS BIGINT) AS a, CAST(doc_b AS BIGINT) AS b
        FROM pr
        UNION
        SELECT CAST(doc_b AS BIGINT), CAST(doc_a AS BIGINT) FROM pr
    ),
    reach(node, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, reach.r FROM e JOIN reach ON reach.node = e.b
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id AS doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """
