"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — the baseline. Query matrix is
  broadcast ONCE via ray.put; each map_batches task computes a blocked
  matmul and emits only its local top-k per query; a tiny final reduce
  merges local top-ks (no all-to-all).
- ivf_topk: IVF-style scale path — k-means-lite centroids (fit on a
  sample, fixed iterations, seeded), assign each vector to its nearest
  centroid (stateless map), search only the ``n_probe`` closest lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat[offs[0]: offs[-1]].reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _LocalTopK:
    """Actor: holds the broadcast (normalized) query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        self.Q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = X @ self.Q.T  # (n_batch, n_queries)
        k = min(self.k, X.shape[0])
        out_q, out_id, out_s = [], [], []
        for q in range(self.Q.shape[0]):
            s = sims[:, q]
            idx = np.argpartition(s, -k)[-k:]
            out_q.extend([q] * k)
            out_id.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency=None):
    """Returns pa.Table (query_id, rank, vec_id, score), exact cosine.

    Plain TASK pool by default: the broadcast state is numpy (zero-copy
    plasma read per task), so actors bought nothing and their CPU
    reservation could starve the read stage on small clusters. Pass an
    int to pin an actor pool."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)
    if concurrency is not None:
        local = ds.map_batches(
            _LocalTopK,
            fn_constructor_args=(qref, k, id_col, vec_col),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        def topk(batch, _r=qref):
            return _LocalTopK(_r, k, id_col, vec_col)(batch)

        local = ds.map_batches(topk, batch_format="pyarrow")
    # final merge: local top-ks are tiny (k x queries x blocks)
    return _merge_topk(local.to_pandas(), k)


def _merge_topk(df, k: int) -> pa.Table:
    """Vectorized global top-k merge of per-block local top-ks:
    sort by (query, score desc, vec_id) -> head(k) per query -> cumcount
    ranks. Deterministic tie-break on vec_id."""
    import pandas as pd

    df = df.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    top = df.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    res = pd.DataFrame(
        {
            "query_id": top["query_id"].astype(np.int64),
            "rank": top["rank"].astype(np.int64),
            "vec_id": top["vec_id"].astype(np.int64),
            "score": top["score"].astype(np.float64),
        }
    )
    return pa.Table.from_pandas(res, preserve_index=False)


def kmeans_lite(X: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 42):
    """Seeded fixed-iteration Lloyd's on normalized vectors."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(X.shape[0], size=min(n_clusters, X.shape[0]), replace=False)
    C = X[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", sample_limit: int = 10000,
             seed: int = 42, concurrency=None):
    """IVF: centroids from a RANDOM sample (a limit() would take the
    first blocks only — biased centroids on sorted/clustered input);
    stateless assignment; search restricted to the n_probe nearest lists
    per query. ``n_probe >= n_clusters`` probes every list and is exactly
    brute force — the driver oracle checks that configuration."""
    import ray
    import pandas as pd

    cnt = ds.count()
    frac = min(1.0, sample_limit / max(cnt, 1))
    sample = (ds if frac >= 1.0
              else ds.random_sample(frac, seed=seed)).to_pandas()
    Xs = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    C = kmeans_lite(Xs, n_clusters, seed=seed)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    cref = ray.put((C, Q, probe))

    class AssignSearch:
        def __init__(self):
            self.C, self.Q, self.probe = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(_to_matrix(batch.column(vec_col)))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            assign = np.argmax(X @ self.C.T, axis=1)
            sims = X @ self.Q.T
            out_q, out_id, out_s = [], [], []
            for q in range(self.Q.shape[0]):
                mask = np.isin(assign, self.probe[q])
                if not mask.any():
                    continue
                s = sims[mask, q]
                sub_ids = ids[mask]
                kk = min(k, s.size)
                idx = np.argpartition(s, -kk)[-kk:]
                out_q.extend([q] * kk)
                out_id.extend(sub_ids[idx].tolist())
                out_s.extend(s[idx].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int32()),
                    "vec_id": pa.array(out_id, type=pa.int64()),
                    "score": pa.array(out_s, type=pa.float64()),
                }
            )

    if concurrency is not None:
        local = ds.map_batches(AssignSearch, batch_format="pyarrow",
                               concurrency=concurrency, num_cpus=1)
    else:
        # task pool (see brute_force_topk): build the searcher ONCE on
        # the driver — its state (centroids, queries, probe lists) is a
        # few KB, shipped once per task with the serialized callable
        local = ds.map_batches(AssignSearch(), batch_format="pyarrow")
    return _merge_topk(local.to_pandas(), k)


class _PairScan:
    """Block rows vs the broadcast normalized matrix: emit (id_a, id_b)
    with id_a < id_b and cosine >= threshold. Matrix fetched from the
    object store once per actor."""

    def __init__(self, mat_ref, ids_ref, threshold: float, id_col: str,
                 vec_col: str):
        import ray

        self.M = ray.get(mat_ref)          # (N, d) normalized, f64
        self.all_ids = ray.get(ids_ref)    # (N,) int64
        self.t = threshold
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sims = X @ self.M.T                       # (block, N)
        hit = sims >= self.t
        # strict upper triangle by GLOBAL id: each unordered pair is
        # emitted by exactly one block (the one holding the smaller id)
        hit &= ids[:, None] < self.all_ids[None, :]
        bi, gj = np.nonzero(hit)
        return pa.table(
            {
                "id_a": pa.array(ids[bi], type=pa.int64()),
                "id_b": pa.array(self.all_ids[gj], type=pa.int64()),
            }
        )


def embedding_cosine_pairs(ds, threshold: float = 0.45,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           concurrency=None):
    """EXACT cosine-similarity pair scan: all (a, b), a < b, with
    cosine >= threshold.

    Baseline path for corpora whose normalized matrix fits the object
    store (~1M x 256 f64 = 2 GB): one `ray.put` broadcast, then each
    block does a single (block x N) matmul — no shuffle, no driver
    materialization of results. Above that, use the banded-LSH
    ``extras.dedup.embedding_near_dups`` (same output contract,
    probabilistic recall) or IVF bucketing. SURVEY §2.8 near-dup family;
    cf. reference's exact dedup semantics.
    """
    import ray

    @ray.remote(num_returns=2)
    def _build(*tables):
        # matrix assembly runs in a worker: the driver only passes block
        # refs around and never holds the vectors
        full = pa.concat_tables(tables)
        M = _normalize(_to_matrix(full.column(vec_col)))
        ids = full.column(id_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return M, ids

    mat_ref, ids_ref = _build.remote(*ds.to_arrow_refs())
    if concurrency is not None:
        return ds.map_batches(
            _PairScan,
            fn_constructor_args=(mat_ref, ids_ref, threshold, id_col,
                                 vec_col),
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )

    # task pool: the (N, d) matrix is numpy in plasma — ray.get per task
    # maps it zero-copy, so there is no per-actor amortization to lose
    def scan(batch, _m=mat_ref, _i=ids_ref):
        return _PairScan(_m, _i, threshold, id_col, vec_col)(batch)

    return ds.map_batches(scan, batch_format="pyarrow")
