"""As-of and range joins — the two ordered-join shapes Ray Data lacks.

Broadcast implementation: the small (right) side is collected once,
sorted into a per-key index, shipped via ``ray.put`` and rebuilt ONCE PER
ACTOR in ``__init__``; each left batch then resolves matches with
``np.searchsorted`` — no shuffle of the big side at all. This is the
standard distributed as-of shape when the right side fits in memory
(orders/checkpoints/config tables against an event stream).

Co-partitioned implementation (``asof_join_copart`` /
``range_count_copart``): when the right side outgrows broadcast, both
sides are tagged with a side column, hash-bucketed on the join key into
``n_buckets`` COARSE buckets (the components.py/dedup.py discipline — a
bounded number of vectorized per-bucket merges, NOT one Python dispatch
per key), unioned, and merged per bucket with a rank-composite
``np.searchsorted``: key and ts values are densified to per-bucket ranks
over the COMBINED domain (including ``ts - window`` for the range join,
so window arithmetic stays exact under the rank transform), composed as
``key_rank * (n_ts_ranks + 1) + ts_rank`` int64 keys, and every left row
resolves its strict-predecessor / interval bounds with one or two binary
searches — zero per-row or per-key Python. Only the join key, int64
timestamps, requested left pass-through columns and right payload
columns shuffle. ``asof_join_auto`` switches between the two paths on a
right-side row-count threshold.

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


# ---------------------------------------------------------------------------
# Co-partitioned path: right side too big to broadcast
# ---------------------------------------------------------------------------

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    mix = keys.astype(np.uint64) * _GOLD
    return ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets


def _tagged_union(left, right, key: str, ts: str, left_cols: list[str],
                  payload_cols: list[str], left_types: dict,
                  payload_types: dict, n_buckets: int):
    """Union both sides under ONE schema: [__k, __t, __side, __bucket,
    *left_cols, *payload_cols]; columns a side does not own are typed
    nulls (never emitted — per-bucket merge reads each column from its
    owning side only)."""

    def tag_left(t: pa.Table) -> pa.Table:
        k = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            "__k": pa.array(k, type=pa.int64()),
            "__t": t.column(ts).cast(pa.int64()),
            "__side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            "__bucket": pa.array(_bucket_of(k, n_buckets)),
        }
        for c in left_cols:
            cols[c] = t.column(c)
        for c in payload_cols:
            cols[c] = pa.nulls(t.num_rows, type=payload_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cols = {
            "__k": pa.array(k, type=pa.int64()),
            "__t": t.column(ts).cast(pa.int64()),
            "__side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            "__bucket": pa.array(_bucket_of(k, n_buckets)),
        }
        for c in left_cols:
            cols[c] = pa.nulls(t.num_rows, type=left_types[c])
        for c in payload_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )


def _rank_composites(lk, lt, rk, rt, extra_ts=None):
    """Densify key/ts to per-bucket ranks over the combined domain and
    compose int64 sort keys. Rank products stay far inside int64 for any
    realistic bucket (ranks < bucket row count)."""
    uk = np.unique(np.concatenate((lk, rk)))
    ts_domain = [lt, rt] if extra_ts is None else [lt, rt, extra_ts]
    ut = np.unique(np.concatenate(ts_domain))
    m = np.int64(ut.size + 1)
    lkr = np.searchsorted(uk, lk)
    rkr = np.searchsorted(uk, rk)
    ltr = np.searchsorted(ut, lt)
    rtr = np.searchsorted(ut, rt)
    extra = None
    if extra_ts is not None:
        extra = lkr * m + np.searchsorted(ut, extra_ts)
    return lkr * m + ltr, rkr * m + rtr, extra


def asof_join_copart(left, right, key: str, ts: str,
                     payload: dict[str, object],
                     gap_col: str | None = None,
                     left_cols: list[str] | None = None,
                     n_buckets: int = 64):
    """Strict as-of join with BOTH sides as Datasets (co-partition
    shape). Semantics identical to ``asof_join_broadcast`` (equality is
    oracle-tested); output columns are ``left_cols`` (default: all left
    columns) + payload (+ ``gap_col``). Only key/ts/pass-through/payload
    columns shuffle, bucketed by join key."""
    left_schema = left.schema()  # ray.data.Schema: .names / .types
    right_schema = right.schema()
    if left_cols is None:
        left_cols = list(left_schema.names)
    payload_cols = list(payload)
    lt_all = dict(zip(left_schema.names, left_schema.types))
    rt_all = dict(zip(right_schema.names, right_schema.types))
    left_types = {c: lt_all[c] for c in left_cols}
    payload_types = {c: rt_all[c] for c in payload_cols}
    merged = _tagged_union(left, right, key, ts, left_cols, payload_cols,
                           left_types, payload_types, n_buckets)

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        ltbl = g.filter(pa.array(lmask))
        rtbl = g.filter(pa.array(~lmask))
        lk = ltbl.column("__k").to_numpy(zero_copy_only=False)
        lt = ltbl.column("__t").to_numpy(zero_copy_only=False)
        rk = rtbl.column("__k").to_numpy(zero_copy_only=False)
        rt = rtbl.column("__t").to_numpy(zero_copy_only=False)
        n = lk.size
        out = {c: ltbl.column(c) for c in left_cols}
        vals = {c: np.full(n, s, dtype=np.asarray(s).dtype)
                for c, s in payload.items()}
        gap = np.full(n, -1, dtype=np.int64)
        if rk.size and n:
            lcomp, rcomp, _ = _rank_composites(lk, lt, rk, rt)
            order = np.argsort(rcomp, kind="stable")
            rcomp_s = rcomp[order]
            rk_s = rk[order]
            rt_s = rt[order]
            pos = np.searchsorted(rcomp_s, lcomp, side="left") - 1
            hit = pos >= 0
            hit[hit] &= rk_s[pos[hit]] == lk[hit]
            hpos = pos[hit]
            for c in payload:
                rv = rtbl.column(c).to_numpy(zero_copy_only=False)
                vals[c][hit] = rv[order][hpos]
            gap[hit] = lt[hit] - rt_s[hpos]
        for c in payload:
            out[c] = pa.array(vals[c])
        if gap_col:
            out[gap_col] = pa.array(gap)
        return pa.table(out)

    return merged.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def range_count_copart(left, right, key: str, ts: str, window_us: int,
                       out_col: str, left_cols: list[str] | None = None,
                       n_buckets: int = 64):
    """Interval-count join with both sides as Datasets. Semantics
    identical to ``range_count_broadcast``; ``ts - window`` values join
    the rank domain so the window bound stays exact under the rank
    transform."""
    left_schema = left.schema()
    if left_cols is None:
        left_cols = list(left_schema.names)
    lt_all = dict(zip(left_schema.names, left_schema.types))
    left_types = {c: lt_all[c] for c in left_cols}
    merged = _tagged_union(left, right, key, ts, left_cols, [],
                           left_types, {}, n_buckets)
    window_us = int(window_us)

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        ltbl = g.filter(pa.array(lmask))
        rtbl = g.filter(pa.array(~lmask))
        lk = ltbl.column("__k").to_numpy(zero_copy_only=False)
        lt = ltbl.column("__t").to_numpy(zero_copy_only=False)
        rk = rtbl.column("__k").to_numpy(zero_copy_only=False)
        rt = rtbl.column("__t").to_numpy(zero_copy_only=False)
        cnt = np.zeros(lk.size, dtype=np.int64)
        if rk.size and lk.size:
            lcomp, rcomp, locomp = _rank_composites(
                lk, lt, rk, rt, extra_ts=lt - window_us
            )
            rcomp_s = np.sort(rcomp, kind="stable")
            hi = np.searchsorted(rcomp_s, lcomp, side="left")
            lo = np.searchsorted(rcomp_s, locomp, side="left")
            cnt = hi - lo
        out = {c: ltbl.column(c) for c in left_cols}
        out[out_col] = pa.array(cnt, type=pa.int64())
        return pa.table(out)

    return merged.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def asof_join_auto(left, right, key: str, ts: str,
                   payload: dict[str, object],
                   gap_col: str | None = None,
                   broadcast_limit_rows: int = 5_000_000,
                   concurrency: int = 2, n_buckets: int = 64):
    """Size-switched as-of join: a right side at most
    ``broadcast_limit_rows`` broadcasts (one sorted index via ray.put);
    anything larger takes the co-partitioned bucket merge so no single
    process ever holds the whole right side. ``right`` may be a
    pyarrow Table or a Dataset."""
    import ray.data as rd

    if isinstance(right, pa.Table):
        if right.num_rows <= broadcast_limit_rows:
            return asof_join_broadcast(
                left, right, key, ts, payload, gap_col=gap_col,
                concurrency=concurrency,
            )
        right = rd.from_arrow(right)
        return asof_join_copart(left, right, key, ts, payload,
                                gap_col=gap_col, n_buckets=n_buckets)
    if right.count() <= broadcast_limit_rows:
        import ray

        tbl = pa.concat_tables(
            ray.get(right.to_arrow_refs()), promote_options="default"
        )
        return asof_join_broadcast(left, tbl, key, ts, payload,
                                   gap_col=gap_col,
                                   concurrency=concurrency)
    return asof_join_copart(left, right, key, ts, payload,
                            gap_col=gap_col, n_buckets=n_buckets)
