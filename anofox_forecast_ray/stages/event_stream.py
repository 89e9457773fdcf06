"""Event-time tumbling windows with watermarks and a late-data policy.

The reference is batch-only (SURVEY.md §2.10); this extends the
actor-based streaming shape (stages/streaming.py) with the semantics a
real ingest feed needs: events arrive in ARRIVAL order, are assigned to
event-time tumbling windows, and a watermark (max event time seen minus
``allowed_lateness``) finalizes windows as it advances. Late events —
arriving after their window finalized — follow a policy:

- ``"upsert"``: merged into the finalized store as a correction. The
  final result is then BITWISE equal to the batch aggregate over the
  whole log (integer partials are order-free), regardless of arrival
  order — verified by the streaming_event_windows driver query against
  the events_minute_rollup SQL oracle.
- ``"drop"``: counted per bucket in ``late_dropped`` and discarded —
  the at-most-once accounting mode; the final result equals the batch
  aggregate over the NON-late prefix only.

Partitioning: N bucket actors own ``hash(key) % N`` key ranges (same
FNV routing as StreamingSourceRollup); state per actor is two mergeable
Arrow partial tables (open windows, finalized windows), combined with
vectorized Arrow group-aggregates — never Python-per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .streaming import _hash_source

_SCHEMA = {
    "key": pa.string(),
    "window_id": pa.int64(),
    "cnt": pa.int64(),
    "sum_cents": pa.int64(),
    "min_cents": pa.int64(),
    "max_cents": pa.int64(),
}


def _empty() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _SCHEMA.items()})


def _combine(t: pa.Table) -> pa.Table:
    """Merge partial rows per (key, window_id) — integer reductions, so
    any merge order yields the same bits."""
    if t.num_rows == 0:
        return _empty()
    g = t.group_by(["key", "window_id"]).aggregate(
        [("cnt", "sum"), ("sum_cents", "sum"),
         ("min_cents", "min"), ("max_cents", "max")]
    )
    return pa.table(
        {
            "key": g.column("key").cast(pa.string()),
            "window_id": g.column("window_id").cast(pa.int64()),
            "cnt": g.column("cnt_sum").cast(pa.int64()),
            "sum_cents": g.column("sum_cents_sum").cast(pa.int64()),
            "min_cents": g.column("min_cents_min").cast(pa.int64()),
            "max_cents": g.column("max_cents_max").cast(pa.int64()),
        }
    )


def partials_from_events(t: pa.Table, window_us: int,
                         slide_us: int | None = None) -> pa.Table:
    """(key, ts_us, cents) event rows -> per-(key, window) partials.

    Tumbling by default; with ``slide_us`` (hopping windows, window a
    multiple of slide) each event lands in window_us/slide_us windows —
    window w covers [w*slide, w*slide + window)."""
    if t.num_rows == 0:
        return _empty()
    ts = t.column("ts_us").to_numpy(zero_copy_only=False)
    cents = t.column("cents").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    keys = t.column("key").cast(pa.string())
    if slide_us is None:
        wid = ts // window_us
        key_arr, cents_rep = keys, cents
    else:
        if window_us % slide_us:
            raise ValueError("window_us must be a multiple of slide_us")
        k = window_us // slide_us
        hi = ts // slide_us
        wid = (np.repeat(hi, k).reshape(-1, k)
               - np.arange(k - 1, -1, -1)[None, :]).ravel()
        idx = pa.array(np.repeat(np.arange(len(ts)), k))
        key_arr = keys.take(idx)
        cents_rep = np.repeat(cents, k)
    raw = pa.table(
        {
            "key": key_arr,
            "window_id": pa.array(wid.astype(np.int64), type=pa.int64()),
            "cnt": pa.array(np.ones(len(cents_rep), dtype=np.int64)),
            "sum_cents": pa.array(cents_rep),
            "min_cents": pa.array(cents_rep),
            "max_cents": pa.array(cents_rep),
        }
    )
    return _combine(raw)


class _WindowState:
    def __init__(self, window_us: int, policy: str,
                 slide_us: int | None = None):
        self.window_us = window_us
        self.slide_us = slide_us if slide_us is not None else window_us
        self.policy = policy
        self.open = _empty()
        self.closed = _empty()
        self.late_dropped = 0

    def apply(self, partials: pa.Table, watermark_us: int) -> None:
        if partials.num_rows:
            wid = partials.column("window_id").to_numpy(
                zero_copy_only=False
            )
            # a window [w*S, w*S + W) is finalized once its END has
            # passed the watermark (S = W for tumbling)
            is_late = (wid * self.slide_us + self.window_us
                       <= watermark_us)
            late = partials.filter(pa.array(is_late))
            fresh = partials.filter(pa.array(~is_late))
            if fresh.num_rows:
                self.open = _combine(
                    pa.concat_tables([self.open, fresh])
                )
            if late.num_rows:
                if self.policy == "upsert":
                    self.closed = _combine(
                        pa.concat_tables([self.closed, late])
                    )
                else:
                    self.late_dropped += int(
                        late.column("cnt").to_numpy(
                            zero_copy_only=False
                        ).sum()
                    )
        # advance: finalize open windows that fell behind the watermark
        if self.open.num_rows:
            wid = self.open.column("window_id").to_numpy(
                zero_copy_only=False
            )
            done = (wid * self.slide_us + self.window_us
                    <= watermark_us)
            if done.any():
                self.closed = _combine(pa.concat_tables(
                    [self.closed, self.open.filter(pa.array(done))]
                ))
                self.open = self.open.filter(pa.array(~done))

    def flush(self) -> pa.Table:
        return _combine(pa.concat_tables([self.closed, self.open]))


def make_window_actor_cls():
    import ray

    @ray.remote(num_cpus=1)
    class EventWindowActor:
        def __init__(self, window_us: int, policy: str,
                     slide_us: int | None = None):
            self.state = _WindowState(window_us, policy, slide_us)

        def ingest(self, partials: pa.Table, watermark_us: int) -> None:
            self.state.apply(partials, watermark_us)

        def finalized_count(self) -> int:
            return self.state.closed.num_rows

        def late_dropped(self) -> int:
            return self.state.late_dropped

        def flush(self) -> pa.Table:
            return self.state.flush()

    return EventWindowActor


class StreamingEventWindows:
    """Driver-side handle: route event batches by key hash, track the
    watermark, flush the (finalized + still-open) windows on demand."""

    def __init__(self, window_us: int, allowed_lateness_us: int = 0,
                 n_buckets: int = 4, policy: str = "upsert",
                 slide_us: int | None = None):
        if policy not in ("upsert", "drop"):
            raise ValueError(policy)
        cls = make_window_actor_cls()
        self.actors = [cls.remote(window_us, policy, slide_us)
                       for _ in range(n_buckets)]
        self.n = n_buckets
        self.window_us = window_us
        self.slide_us = slide_us
        self.lateness_us = allowed_lateness_us
        self.max_ts = -(1 << 62)

    @property
    def watermark_us(self) -> int:
        return self.max_ts - self.lateness_us

    def ingest(self, batch: pa.Table) -> None:
        """batch: (key:string, ts_us:int64, cents:int64) in arrival
        order. The watermark advances to max event time seen BEFORE this
        batch is applied (a batch cannot be late against itself)."""
        import ray

        if batch.num_rows == 0:
            return
        wm = self.watermark_us
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        self.max_ts = max(self.max_ts, int(ts.max()))
        keys = np.asarray(batch.column("key").to_pylist())
        bucket = _hash_source(keys, self.n)
        refs = []
        for b in range(self.n):
            idx = np.flatnonzero(bucket == b)
            if idx.size:
                part = partials_from_events(
                    batch.take(pa.array(idx)), self.window_us,
                    self.slide_us,
                )
                refs.append(self.actors[b].ingest.remote(part, wm))
        ray.get(refs)  # ordered application per bucket

    def late_dropped(self) -> int:
        import ray

        return sum(ray.get([a.late_dropped.remote() for a in self.actors]))

    def finalized_count(self) -> int:
        import ray

        return sum(ray.get([a.finalized_count.remote()
                            for a in self.actors]))

    def flush(self) -> pa.Table:
        import ray

        parts = [t for t in ray.get([a.flush.remote()
                                     for a in self.actors])
                 if t.num_rows]
        if not parts:
            return _empty()
        return _combine(pa.concat_tables(parts))

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
