"""As-of and range joins — the two ordered-join shapes Ray Data lacks.

Broadcast implementation: the small (right) side is collected once,
sorted into a per-key index, shipped via ``ray.put`` and rebuilt ONCE PER
ACTOR in ``__init__``; each left batch then resolves matches with
``np.searchsorted`` — no shuffle of the big side at all. This is the
standard distributed as-of shape when the right side fits in memory
(orders/checkpoints/config tables against an event stream). When it does
not, the fallback is the co-partition shape already used by the events
family: union both sides tagged with a side column, ``groupby(key)``,
sorted merge inside ``map_groups`` — only (key, ts, payload) columns
shuffle, never the wide left rows.

Semantics (deterministic, oracle-replayable):
- ``asof``: for each left row, the right row of the same key with the
  greatest ``ts`` strictly before the left ``ts`` (DuckDB
  ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts > r.ts``); misses are
  filled with sentinel values so the output is null-free and hashable.
- ``range_count``: number of right rows of the same key with
  ``l.ts - window <= r.ts < l.ts`` — a streaming-friendly interval join
  reduced to two binary searches per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def build_asof_index(table: pa.Table, key: str, ts: str,
                     payload: list[str]):
    """Sort the right side by (key, ts) and slice per key.

    Returns {key_value: (ts_int64_sorted, {col: np.ndarray})}.
    """
    t = table.sort_by([(key, "ascending"), (ts, "ascending")])
    keys = np.asarray(t.column(key).to_pylist(), dtype=np.int64)
    tsv = t.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    cols = {
        c: t.column(c).to_numpy(zero_copy_only=False) for c in payload
    }
    index = {}
    if keys.size:
        bounds = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        ends = np.concatenate((bounds[1:], [keys.size]))
        for s0, s1 in zip(bounds, ends):
            index[int(keys[s0])] = (
                tsv[s0:s1],
                {c: v[s0:s1] for c, v in cols.items()},
            )
    return index


class BroadcastAsofJoiner:
    """Actor-pool stage: strict as-of join of each batch against the
    broadcast right index. Misses fill with the given sentinels."""

    def __init__(self, right_ref, key: str, ts: str,
                 payload: dict[str, object], gap_col: str | None = None):
        import ray

        self.index = ray.get(right_ref)  # built once per actor
        self.key, self.ts = key, ts
        self.payload = payload  # {right_col: sentinel}
        self.gap_col = gap_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(self.key).to_pylist(),
                          dtype=np.int64)
        tsv = batch.column(self.ts).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = keys.size
        out = {c: np.full(n, s, dtype=np.asarray(s).dtype)
               for c, s in self.payload.items()}
        gap = np.full(n, -1, dtype=np.int64)
        for k in np.unique(keys):
            entry = self.index.get(int(k))
            if entry is None:
                continue
            r_ts, r_cols = entry
            rows = np.flatnonzero(keys == k)
            # greatest right ts strictly below each left ts
            pos = np.searchsorted(r_ts, tsv[rows], side="left") - 1
            hit = pos >= 0
            hrows, hpos = rows[hit], pos[hit]
            for c in self.payload:
                out[c][hrows] = r_cols[c][hpos]
            gap[hrows] = tsv[hrows] - r_ts[hpos]
        cols = {c: batch.column(c) for c in batch.column_names}
        for c, vals in out.items():
            cols[c] = pa.array(vals)
        if self.gap_col:
            cols[self.gap_col] = pa.array(gap)
        return pa.table(cols)


class BroadcastRangeCounter:
    """Actor-pool stage: per-row count of right rows of the same key in
    [ts - window, ts) — two searchsorted calls per key group."""

    def __init__(self, right_ref, key: str, ts: str, window_us: int,
                 out_col: str):
        import ray

        self.index = ray.get(right_ref)
        self.key, self.ts = key, ts
        self.window_us = int(window_us)
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(self.key).to_pylist(),
                          dtype=np.int64)
        tsv = batch.column(self.ts).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cnt = np.zeros(keys.size, dtype=np.int64)
        for k in np.unique(keys):
            entry = self.index.get(int(k))
            if entry is None:
                continue
            r_ts, _ = entry
            rows = np.flatnonzero(keys == k)
            hi = np.searchsorted(r_ts, tsv[rows], side="left")
            lo = np.searchsorted(r_ts, tsv[rows] - self.window_us,
                                 side="left")
            cnt[rows] = hi - lo
        cols = {c: batch.column(c) for c in batch.column_names}
        cols[self.out_col] = pa.array(cnt)
        return pa.table(cols)


def asof_join_broadcast(left, right_table: pa.Table, key: str, ts: str,
                        payload: dict[str, object],
                        gap_col: str | None = None, concurrency: int = 2):
    """Left Dataset -> as-of joined Dataset (broadcast right side)."""
    import ray

    idx = build_asof_index(right_table, key, ts, list(payload))
    ref = ray.put(idx)
    return left.map_batches(
        BroadcastAsofJoiner,
        fn_constructor_kwargs={"right_ref": ref, "key": key, "ts": ts,
                               "payload": payload, "gap_col": gap_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def range_count_broadcast(left, right_table: pa.Table, key: str, ts: str,
                          window_us: int, out_col: str,
                          concurrency: int = 2):
    import ray

    idx = build_asof_index(right_table, key, ts, [])
    ref = ray.put(idx)
    return left.map_batches(
        BroadcastRangeCounter,
        fn_constructor_kwargs={"right_ref": ref, "key": key, "ts": ts,
                               "window_us": window_us,
                               "out_col": out_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
