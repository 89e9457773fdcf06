"""Soak the two unit-forced scale fallbacks at real volume (VERDICT r3
next-round item 4):

1. **Component assignment past the broadcast limit**: a synthetic
   cluster map with >=60M entries plus an 80M-id corpus is pushed
   through BOTH assignment routes — the sorted-array broadcast and the
   bucketed groupby-join that `dedup_components` switches to above
   ``broadcast_map_limit`` (50M) — and the keep-lists must hash equal.
2. **Sharded LM merge past the partial-row threshold**: a synthetic
   wide-alphabet corpus producing >=10M observed bigrams is trained
   through BOTH merge routes (log-depth tree reduce and the
   hash-partitioned sharded groupby) and the assembled models must be
   bitwise identical; `LAST_MERGE_PATH` proves which route fired.

Run:  PYTHONPATH=/root/repo python tools/soak_scale_paths.py
Emits one JSON line; also exercised (smaller, env-gated) by
tests/test_soak_scale.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 in/out)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _hash_tables(refs) -> tuple[str, int]:
    """Partition- and order-independent content hash: per-row vectorized
    mix of all int columns, folded commutatively (XOR and sum)."""
    import ray

    acc_x = np.uint64(0)
    acc_s = np.uint64(0)
    rows = 0
    for r in refs:
        t = ray.get(r)
        rows += t.num_rows
        if t.num_rows == 0:
            continue
        cols = sorted(t.column_names)
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, c in enumerate(cols):
                v = t.column(c).to_numpy(zero_copy_only=False).astype(
                    np.int64
                ).view(np.uint64)
                h = _mix64(h * np.uint64(31) + _mix64(
                    v + np.uint64(i + 1) * np.uint64(0xA24BAED4963EE407)
                ))
            acc_x ^= np.bitwise_xor.reduce(h)
            acc_s += h.sum(dtype=np.uint64)
    return f"{int(acc_x):016x}{int(acc_s):016x}", rows


def soak_components(n_map: int = 60_000_000, n_ids: int = 80_000_000,
                    seed: int = 42) -> dict:
    """Both assignment routes over a >=60M-entry cluster map."""
    import ray
    import ray.data as rd

    from anofox_forecast_ray.extras.components import (
        AssignComponents,
        _assign_by_groupby_join,
    )

    rng = np.random.default_rng(seed)
    # cluster map: nodes are a random subset of the id space; component
    # = min doc id of the cluster (here: node - small offset, clamped)
    nodes = rng.choice(np.int64(n_ids), size=n_map, replace=False)
    comps = np.maximum(nodes - rng.integers(0, 1000, n_map), 0)
    t0 = time.time()
    order = np.argsort(nodes, kind="stable")
    nodes_s, comps_s = nodes[order], comps[order]
    comp_ref = ray.put((nodes_s, comps_s))

    n_blocks = 128
    ids_ds = rd.range(n_ids, override_num_blocks=n_blocks).map_batches(
        lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    bc = ids_ds.map_batches(
        AssignComponents,
        batch_format="pyarrow",
        concurrency=8,
        fn_constructor_args=(comp_ref,),
    )
    bc_hash, bc_rows = _hash_tables(bc.to_arrow_refs())
    t_broadcast = time.time() - t0

    t0 = time.time()
    comp_tbl = pa.table(
        {
            "node": pa.array(nodes, type=pa.int64()),
            "component": pa.array(comps, type=pa.int64()),
        }
    )
    comp_ds = rd.from_arrow(comp_tbl).repartition(n_blocks, shuffle=False)
    gj = _assign_by_groupby_join(comp_ds, ids_ds)
    gj_hash, gj_rows = _hash_tables(gj.to_arrow_refs())
    t_join = time.time() - t0

    return {
        "n_map": n_map,
        "n_ids": n_ids,
        "broadcast": {"hash": bc_hash, "rows": bc_rows,
                      "sec": round(t_broadcast, 2)},
        "groupby_join": {"hash": gj_hash, "rows": gj_rows,
                         "sec": round(t_join, 2)},
        "match": bc_hash == gj_hash and bc_rows == gj_rows,
    }


def soak_lm_merge(n_docs: int = 4000, doc_len: int = 12000,
                  vocab: int = 5000, seed: int = 42,
                  min_bigrams: int = 10_000_000) -> dict:
    """Both LM merge routes over >=10M observed bigrams."""
    import ray.data as rd

    from anofox_forecast_ray.extras.lm import (
        LAST_MERGE_PATH,
        train_bigram_model,
    )

    rng = np.random.default_rng(seed)
    flat = rng.integers(0, vocab, n_docs * doc_len).astype(np.int32)
    offsets = np.arange(0, (n_docs + 1) * doc_len, doc_len, dtype=np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    tbl = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(n_docs)],
                               type=pa.string()),
            "tokens": tokens,
        }
    )
    corpus = rd.from_arrow(tbl).repartition(64, shuffle=False)

    out = {}
    models = {}
    for label, threshold in (("sharded", 0), ("tree", 1 << 62)):
        t0 = time.time()
        m = train_bigram_model(corpus, shard_merge_threshold=threshold)
        sec = time.time() - t0
        path = LAST_MERGE_PATH["path"]
        models[label] = m
        keys, c2, a_keys, c1, v, ltab = m
        out[label] = {
            "path_fired": path,
            "partial_rows": LAST_MERGE_PATH["partial_rows"],
            "observed_bigrams": int(keys.size),
            "sec": round(sec, 2),
            "keys_sha": hashlib.sha256(
                np.ascontiguousarray(keys).tobytes()
            ).hexdigest()[:16],
            "cnt_sha": hashlib.sha256(
                np.ascontiguousarray(c2).tobytes()
            ).hexdigest()[:16],
            "ltab_sha": hashlib.sha256(
                np.ascontiguousarray(ltab).tobytes()
            ).hexdigest()[:16],
        }
    ms, mt = models["sharded"], models["tree"]
    bitwise = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(ms, mt)
    )
    out["match"] = (
        bitwise
        and out["sharded"]["path_fired"] == "sharded"
        and out["tree"]["path_fired"] == "tree"
        and out["sharded"]["observed_bigrams"] >= min_bigrams
    )
    return out


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    res = {
        "lm_merge": soak_lm_merge(),
        "components": soak_components(),
    }
    res["ok"] = bool(res["lm_merge"]["match"] and res["components"]["match"])
    print(json.dumps(res))
    ray.shutdown()
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
