"""Connected components over near-duplicate pairs -> corpus dedup keep-list.

Completes the dedup family (extras/dedup.py: exact hash, MinHash/LSH,
SimHash, n-gram Jaccard pair finders): candidate PAIRS are only half the
job — a training-data pipeline must turn them into CLUSTERS and keep one
canonical document per cluster. The reference stops at pairwise
similarity scores (see the similarity tests around
tests/statsforecast_comparison.rs and src/preprocessing); the component
step is the scale extension a 100 TB corpus needs before dropping
duplicates.

Algorithm: min-label propagation interleaved with POINTER DOUBLING
(Shiloach-Vishkin style; cf. Kiveris et al., "Connected Components in
MapReduce and Beyond"). Every node starts labelled min(self,
neighbours) (the first round is fused into initialisation); each round
then (a) propagates: every node takes the min of its own label and its
neighbours' labels, and (b) shortcuts: ``label(v) = label(label(v))``
— a self-join of the label table on the label value. Propagation alone
is O(component diameter) rounds; the shortcut step doubles the distance
each label has travelled per round, so convergence is O(log diameter)
— a 1000-node chain converges in 10 rounds instead of ~999 (pinned by
tests/test_components_scale.py). Labels stay monotone decreasing with
fixpoint = component minimum.

Scale shape per round (the dedup.py coarse-bucket discipline — NO
per-node Python UDFs): three groupbys on ``n_buckets`` COARSE hash
buckets of int64 keys (two for propagate, one for the shortcut
self-join). Inside each bucket the label join is a sort +
``np.searchsorted`` gather and the min-combine is one vectorized
reduceat — ~3*n_buckets Python dispatches per round TOTAL, independent
of node count. Only (int64, int64) rows ever shuffle — document text
never moves. Labels are materialized per round (iterative algorithm:
without a checkpoint each round would re-execute the whole prior
lineage).

Component assignment back onto the corpus has two paths mirroring the
graph side: a broadcast of two SORTED int64 arrays (ray.put once,
searchsorted per batch — 16 bytes/entry, no Python dict) while the
cluster map is small, and a bucketed groupby-join (corpus doc_ids union
cluster rows, coarse-bucket vectorized merge) when it is not — a 100 TB
corpus with 30%+ duplication makes the map billions of entries, which no
driver dict can hold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    mix = keys.astype(np.uint64) * _GOLD
    return ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets


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


def connected_components(pairs, max_iters: int = 64,
                         small_graph_limit: int = 2_000_000,
                         n_buckets: int = 64, stats: dict | None = None):
    """Dataset(doc_a, doc_b) -> Dataset(node int64, component int64).

    Only nodes that appear in some pair are returned. Graphs with at
    most ``small_graph_limit`` directed edges take the driver union-find
    fast path (the dup graph is the small side by construction; a round
    of distributed propagation costs several fixed-overhead shuffles).
    Larger graphs run bucket-vectorized min-label propagation with a
    pointer-doubling shortcut each round, so convergence is O(log
    diameter): ``max_iters=64`` covers any graph that fits in int64 ids
    (the RuntimeError backstop below is unreachable for physical inputs
    and exists only to fail loudly over silently-wrong labels if an
    invariant ever breaks). ``stats``, when given, receives
    ``{"rounds": n}`` for the distributed path.
    """
    edges = _directed_edges(pairs).materialize()
    if edges.count() <= small_graph_limit:
        return _components_small(edges.to_pandas())

    def add_src_bucket(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_bucket_of(src, n_buckets))
        )

    # edges bucketed by src once; reused every round
    edges_b = edges.map_batches(
        add_src_bucket, batch_format="pyarrow"
    ).materialize()

    # ---- init (fused first round): label(node) = min(node, min(dst))
    # one vectorized sort+reduceat per coarse bucket (pyarrow-native)
    def init_bucket(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dst = g.column("dst").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(src, kind="stable")
        s, d = src[order], dst[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        nodes = s[starts]
        lbl = np.minimum(nodes, np.minimum.reduceat(d, starts))
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "label": pa.array(lbl, type=pa.int64()),
            }
        )

    labels = (
        edges_b.groupby("__bucket")
        .map_groups(init_bucket, batch_format="pyarrow")
    ).materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "key": pa.array(node, type=pa.int64()),
                "other": pa.array(np.full(n, -1, dtype=np.int64)),
                "lbl": t.column("label").cast(pa.int64()),
                "__bucket": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t.column("src"),
                "other": t.column("dst"),
                "lbl": pa.array(np.full(n, -1, dtype=np.int64)),
                "__bucket": t.column("__bucket"),
            }
        )

    def relay_bucket(g: pa.Table) -> pa.Table:
        """Per coarse bucket: gather label(src) onto every edge via
        sorted searchsorted (every key's label row hashes to this same
        bucket), emit (node=dst, cand=label(src)) candidate rows plus
        (node, cand=own label, is_self=1) carrier rows."""
        key = g.column("key").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        other = g.column("other").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lblv = g.column("lbl").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_lab = other == -1
        la_nodes = key[is_lab]
        la_lbl = lblv[is_lab]
        order = np.argsort(la_nodes, kind="stable")
        la_nodes, la_lbl = la_nodes[order], la_lbl[order]
        ed_src = key[~is_lab]
        ed_dst = other[~is_lab]
        idx = np.searchsorted(la_nodes, ed_src)
        node = np.concatenate((la_nodes, ed_dst))
        cand = np.concatenate((la_lbl, la_lbl[idx]))
        is_self = np.zeros(node.size, dtype=np.int64)
        is_self[: la_nodes.size] = 1
        return pa.table(
            {
                "node": pa.array(node, type=pa.int64()),
                "cand": pa.array(cand, type=pa.int64()),
                "is_self": pa.array(is_self, type=pa.int64()),
                "__bucket2": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def combine_bucket(g: pa.Table) -> pa.Table:
        """Per coarse bucket: one vectorized sort+reduceat min over all
        nodes in the bucket + changed flags vs the carried old labels.
        A node with no carrier row compares as unchanged — exactly the
        pandas reindex-NaN semantics this replaces."""
        node = g.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cand = g.column("cand").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        selfv = g.column("is_self").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.argsort(node, kind="stable")
        n_s, c_s = node[order], cand[order]
        starts = np.flatnonzero(
            np.concatenate(([True], n_s[1:] != n_s[:-1]))
        )
        uniq = n_s[starts]
        new_lbl = np.minimum.reduceat(c_s, starts)
        sn = node[selfv == 1]
        sc = cand[selfv == 1]
        so = np.argsort(sn, kind="stable")
        sn, sc = sn[so], sc[so]
        if sn.size:
            idx = np.clip(np.searchsorted(sn, uniq), 0, sn.size - 1)
            has_old = sn[idx] == uniq
            old_lbl = np.where(has_old, sc[idx],
                               np.iinfo(np.int64).min)
        else:
            old_lbl = np.full(uniq.size, np.iinfo(np.int64).min)
        return pa.table(
            {
                "node": pa.array(uniq, type=pa.int64()),
                "label": pa.array(new_lbl, type=pa.int64()),
                "changed": pa.array(
                    (new_lbl < old_lbl).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    def tag_sc_provider(t: pa.Table) -> pa.Table:
        """Label rows keyed by NODE: answer 'what is label(m)?' for any
        requester whose current label is m."""
        node = t.column("node").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "key": pa.array(node, type=pa.int64()),
                "val": t.column("label").cast(pa.int64()),
                "carry": pa.array(np.full(n, -1, dtype=np.int64)),
                "chg": pa.array(np.full(n, -1, dtype=np.int64)),
                "role": pa.array(np.ones(n, dtype=np.int64)),
                "__bucket": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def tag_sc_requester(t: pa.Table) -> pa.Table:
        """Label rows keyed by their LABEL value: route each node to the
        bucket holding its label's own label row; carry the propagate
        step's changed flag through."""
        lbl = t.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(lbl, type=pa.int64()),
                "val": t.column("node").cast(pa.int64()),
                "carry": pa.array(lbl, type=pa.int64()),
                "chg": t.column("changed").cast(pa.int64()),
                "role": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64)
                ),
                "__bucket": pa.array(_bucket_of(lbl, n_buckets)),
            }
        )

    def shortcut_bucket(g: pa.Table) -> pa.Table:
        """Pointer doubling: label(v) <- label(label(v)). Labels are
        monotone (label(m) <= m), so the gathered value replaces the
        carried one outright; a label with no provider row (cannot
        happen — every label value is a node id — but guarded) keeps
        its carried label. One requester row per node -> output stays
        one row per node."""
        key = g.column("key").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        val = g.column("val").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        carry = g.column("carry").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        chg = g.column("chg").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        role = g.column("role").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_prov = role == 1
        p_keys = key[is_prov]
        p_vals = val[is_prov]
        order = np.argsort(p_keys, kind="stable")
        p_keys, p_vals = p_keys[order], p_vals[order]
        r_node = val[~is_prov]
        r_lbl = carry[~is_prov]
        r_chg = chg[~is_prov]
        if p_keys.size:
            idx = np.clip(
                np.searchsorted(p_keys, r_lbl), 0, p_keys.size - 1
            )
            hit = p_keys[idx] == r_lbl
            new_lbl = np.where(hit, p_vals[idx], r_lbl)
        else:
            new_lbl = r_lbl
        return pa.table(
            {
                "node": pa.array(r_node, type=pa.int64()),
                "label": pa.array(new_lbl, type=pa.int64()),
                "changed": pa.array(
                    ((new_lbl < r_lbl) | (r_chg == 1)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    import os
    import time as _time

    _dbg = bool(os.environ.get("ANOFOX_CC_DEBUG"))
    # Bound the label table's block count: each round's two groupbys
    # roughly double the block count of their union input, and AllToAll
    # sort fan-out is per input block — without a coalesce the per-round
    # cost grows geometrically (measured 1.1 s -> 35 s by round 8 on a
    # 1000-chain). Coalesce (shuffle=False: cheap block merge, no data
    # movement) to the edge table's own block count — graph-size
    # proportional, stable across rounds.
    _lbl_blocks = max(4, edges_b.num_blocks())

    def _checkpoint(ds):
        """Round checkpoint that CUTS the plan/stats lineage. A plain
        ``materialize()`` carries the whole upstream DatasetStats tree
        into the new plan, and every downstream copy deep-copies it —
        with the per-round self-union that tree DOUBLES each round
        (measured: per-round wall 0.5 s -> 13.8 s by round 10 on a
        1000-chain with constant rows/blocks). Rebuilding from the
        executed block refs starts round r+1 from a fresh root."""
        import ray.data as rd

        return rd.from_arrow_refs(ds.to_arrow_refs())

    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        _t0 = _time.time()
        # (a) propagate: every node takes min over its neighbours' labels
        msgs = labels.map_batches(tag_labels, batch_format="pyarrow").union(
            edges_b.map_batches(tag_edges, batch_format="pyarrow")
        )
        relayed = msgs.groupby("__bucket").map_groups(
            relay_bucket, batch_format="pyarrow"
        )
        labels = _checkpoint(
            relayed.groupby("__bucket2")
            .map_groups(combine_bucket, batch_format="pyarrow")
            .repartition(_lbl_blocks, shuffle=False)
        )
        _t1 = _time.time()
        # (b) shortcut (pointer doubling): label(v) <- label(label(v)) —
        # a self-join of the label table on the label value; doubles the
        # distance every label has travelled, making rounds O(log diam)
        sc_msgs = labels.map_batches(
            tag_sc_provider, batch_format="pyarrow"
        ).union(
            labels.map_batches(tag_sc_requester, batch_format="pyarrow")
        )
        labels = _checkpoint(
            sc_msgs.groupby("__bucket")
            .map_groups(shortcut_bucket, batch_format="pyarrow")
            .repartition(_lbl_blocks, shuffle=False)
        )
        _t2 = _time.time()
        changed = labels.sum("changed")
        if _dbg:
            print(f"[cc] round {rounds}: prop={_t1 - _t0:.1f}s "
                  f"sc={_t2 - _t1:.1f}s sum={_time.time() - _t2:.1f}s "
                  f"changed={changed} blocks={labels.num_blocks()}",
                  flush=True)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: not converged in {max_iters} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t.column("node"), "component": t.column("label")}
        )

    return labels.map_batches(project, batch_format="pyarrow")


class AssignComponents:
    """map_batches(pyarrow) actor stage: corpus docs -> (doc_id,
    component, keep). The cluster map arrives as an object-store ref
    (ray.put once, zero-copy read per actor) holding two SORTED int64
    arrays — lookups are np.searchsorted gathers, no Python dict."""

    def __init__(self, comp_ref):
        import ray

        self.nodes, self.comps = ray.get(comp_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        idx = np.searchsorted(self.nodes, ids)
        idx_c = np.clip(idx, 0, max(self.nodes.size - 1, 0))
        if self.nodes.size:
            hit = self.nodes[idx_c] == ids
            out = np.where(hit, self.comps[idx_c], ids)
        else:
            out = ids
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "component": pa.array(out, type=pa.int64()),
                "keep": pa.array(
                    (out == ids).astype(np.int32), type=pa.int32()
                ),
            }
        )


def _assign_by_groupby_join(comp, docs_ids, n_buckets: int = 64):
    """Scale path: hash-bucket corpus doc_ids together with cluster rows
    and merge per bucket (sorted searchsorted gather) — only int64 ids
    shuffle, the cluster map never materializes anywhere whole."""

    def tag_ids(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = ids.size
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "comp": pa.array(np.full(n, -1, dtype=np.int64)),
                "is_map": pa.array(np.zeros(n, dtype=np.int64)),
                "__bucket": pa.array(_bucket_of(ids, n_buckets)),
            }
        )

    def tag_comp(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        n = node.size
        return pa.table(
            {
                "id": pa.array(node, type=pa.int64()),
                "comp": t.column("component").cast(pa.int64()),
                "is_map": pa.array(np.ones(n, dtype=np.int64)),
                "__bucket": pa.array(_bucket_of(node, n_buckets)),
            }
        )

    def join_bucket(g: pa.Table) -> pa.Table:
        idv = g.column("id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        compv = g.column("comp").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_map = g.column("is_map").to_numpy(
            zero_copy_only=False
        ).astype(np.int64) == 1
        m_nodes = idv[is_map]
        m_comps = compv[is_map]
        order = np.argsort(m_nodes, kind="stable")
        m_nodes, m_comps = m_nodes[order], m_comps[order]
        ids = idv[~is_map]
        if m_nodes.size:
            idx = np.clip(
                np.searchsorted(m_nodes, ids), 0, m_nodes.size - 1
            )
            hit = m_nodes[idx] == ids
            out = np.where(hit, m_comps[idx], ids)
        else:
            out = ids
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "component": pa.array(out, type=pa.int64()),
                "keep": pa.array(
                    (out == ids).astype(np.int32), type=pa.int32()
                ),
            }
        )

    merged = docs_ids.map_batches(tag_ids, batch_format="pyarrow").union(
        comp.map_batches(tag_comp, batch_format="pyarrow")
    )
    return merged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def dedup_components(docs_pairs, docs_ids, max_iters: int = 16,
                     small_graph_limit: int = 2_000_000,
                     broadcast_map_limit: int = 50_000_000):
    """Full dedup assignment: near-dup pairs -> clusters -> keep-list.

    docs_pairs: Dataset(doc_id, text) fed to the MinHash pair finder.
    docs_ids:   Dataset(doc_id) — the whole corpus (ids only; prune the
                read to this single column).
    Returns Dataset(doc_id, component, keep) over the WHOLE corpus:
    component = min doc_id of the near-dup cluster (own id when unique),
    keep = 1 iff this doc is its cluster's canonical representative.

    Cluster maps up to ``broadcast_map_limit`` entries broadcast as two
    sorted int64 arrays (~16 bytes/entry in every worker's object store);
    above that the assignment switches to the bucketed groupby-join so
    nothing ever holds the whole map.
    """
    import ray

    from .dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(
        docs_pairs, threshold=0.5, max_bucket=None,
        # bound the band-row sort-shuffle task count at test scale (the
        # coalesce is a no-op semantically; see minhash_candidate_pairs)
        shuffle_partitions=8,
    )
    comp = connected_components(
        pairs, max_iters=max_iters, small_graph_limit=small_graph_limit
    ).materialize()
    if comp.count() > broadcast_map_limit:
        return _assign_by_groupby_join(comp, docs_ids)
    # broadcast path: sorted arrays via ray.put once, searchsorted per
    # batch — no driver dict, no per-batch reshipping
    tbl = pa.concat_tables(
        ray.get(comp.to_arrow_refs()), promote_options="default"
    )
    nodes = tbl.column("node").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    comps = tbl.column("component").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(nodes, kind="stable")
    comp_ref = ray.put((nodes[order], comps[order]))

    # plain-task stage (not an actor pool): ray.get on a plasma ref is a
    # zero-copy read per task, and skipping actor spin-up saves ~1 s of
    # fixed latency at test scale. AssignComponents (the actor form)
    # remains for long-lived pipelines that reuse the pool.
    def assign(batch: pa.Table) -> pa.Table:
        m_nodes, m_comps = ray.get(comp_ref)
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if m_nodes.size:
            idx = np.clip(
                np.searchsorted(m_nodes, ids), 0, m_nodes.size - 1
            )
            hit = m_nodes[idx] == ids
            out = np.where(hit, m_comps[idx], ids)
        else:
            out = ids
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "component": pa.array(out, type=pa.int64()),
                "keep": pa.array(
                    (out == ids).astype(np.int32), type=pa.int32()
                ),
            }
        )

    return docs_ids.map_batches(assign, batch_format="pyarrow")


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
