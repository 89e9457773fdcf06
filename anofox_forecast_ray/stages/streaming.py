"""Incremental continuous aggregates via stateful Ray actors.

The reference is batch-only (SURVEY.md §2.10); this is the engine's
streaming-ingest shape for feeds that arrive as an ordered log: the ONE
place the Dataset API genuinely can't express the semantics (a shared
mutable index updated across arrivals), so it drops to raw Ray actors —
case (c) of the custom-operator hierarchy in the task brief.

Design: N ``RollupBucketActor``s, each owning ``hash(source) % N`` of the
key space (same partitioning key as the batch source_rollup). Batches are
routed by bucket and applied with the SAME vectorized combine kernel as
the batch path, so a snapshot after ingesting a prefix of the log equals
the batch aggregate over that prefix — bitwise (integer partials).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_source(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    # FNV-1a over the utf-8 bytes, stable across processes
    out = np.empty(arr.size, dtype=np.int64)
    for i, s in enumerate(arr):
        h = 0xCBF29CE484222325
        for b in str(s).encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h % n_buckets
    return out


class _BucketState:
    """Mergeable (source, tier, window) -> (cnt, sum, min, max) store."""

    def __init__(self):
        self.table: pa.Table | None = None

    def apply(self, t: pa.Table) -> None:
        from .source_rollup import _combine_partials_table

        if t.num_rows == 0:
            return
        parts = [x for x in (self.table, t) if x is not None and x.num_rows]
        self.table = _combine_partials_table(pa.concat_tables(parts))

    def snapshot(self) -> pa.Table:
        if self.table is None:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "tier": pa.array([], pa.string()),
                    "window_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sum": pa.array([], pa.int64()),
                    "min": pa.array([], pa.int32()),
                    "max": pa.array([], pa.int32()),
                }
            )
        return self.table


def make_bucket_actor_cls():
    import ray

    @ray.remote(num_cpus=1)
    class RollupBucketActor:
        def __init__(self):
            self.state = _BucketState()
            self.batches_seen = 0

        def ingest(self, t: pa.Table) -> int:
            self.state.apply(t)
            self.batches_seen += 1
            return self.batches_seen

        def snapshot(self) -> pa.Table:
            return self.state.snapshot()

    return RollupBucketActor


class StreamingSourceRollup:
    """Driver-side handle: route rollup-row batches to bucket actors,
    snapshot on demand."""

    def __init__(self, n_buckets: int = 4):
        import ray  # noqa: F401

        cls = make_bucket_actor_cls()
        self.actors = [cls.remote() for _ in range(n_buckets)]
        self.n = n_buckets

    def ingest(self, batch: pa.Table) -> None:
        import ray

        cols = batch.select(
            ["source", "tier", "window_id", "cnt", "sum", "min", "max"]
        )
        src = np.asarray(cols.column("source").to_pylist())
        bucket = _hash_source(src, self.n)
        refs = []
        for b in range(self.n):
            idx = np.flatnonzero(bucket == b)
            if idx.size:
                refs.append(self.actors[b].ingest.remote(cols.take(pa.array(idx))))
        ray.get(refs)  # ordered application per bucket

    def snapshot(self) -> pa.Table:
        import ray

        from .source_rollup import _combine_partials_table

        parts = [t for t in ray.get([a.snapshot.remote() for a in self.actors])
                 if t.num_rows]
        if not parts:
            return _BucketState().snapshot()
        merged = pa.concat_tables(parts)
        final = _combine_partials_table(merged)
        cnt = final.column("cnt").to_numpy(zero_copy_only=False)
        s = final.column("sum").to_numpy(zero_copy_only=False)
        return final.append_column(
            "mean", pa.array(s.astype(np.float64) / cnt, type=pa.float64())
        )

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
