"""Generic bucketed shuffle equi-join for big x big tables.

Ray Data has no native join; the broadcast pattern (stages/asof.py,
extras/ann.py) covers big x small. This stage covers the remaining case:
both sides large. Classic hash-partitioned join — each side tags rows
with hash(key) % n_buckets, ONE groupby co-locates every bucket, and a
per-bucket vectorized merge (sort the right side once, searchsorted
each left key, repeat/arange M:N expansion over Arrow takes) runs at C
level. Only the projected columns ever shuffle; callers project both
sides to exactly the needed columns first (the prune-at-the-read
discipline). Pure Arrow end to end: int64 columns stay int64 (the
earlier pandas-merge implementation needed a per-side conversion dance
to avoid null-driven float64 promotion).

Skew: a hot key lands in one bucket; raise n_buckets (bucket count just
needs to exceed cluster parallelism) and, for a single pathological hot
key, pre-salt the small(er) side as in stages/salted.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    mix = keys.astype(np.uint64) * _MIX
    return ((mix >> np.uint64(48)).astype(np.int64)) % n_buckets


def bucketed_equi_join(left, right, key: str, n_buckets: int = 64):
    """Inner equi-join of two Datasets on int64 column ``key``. Column
    names must be disjoint apart from ``key`` (rename beforehand).
    Returns the joined rows; push aggregates into a subsequent per-batch
    partial combine rather than shuffling the join output again."""
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lnames = [f.name for f in lschema]
    rnames = [f.name for f in rschema if f.name != key]
    overlap = set(lnames) & set(rnames)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    def prep(kind: int, own: pa.Schema, other_payload: list):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for f in own:
                cols[f.name] = t.column(f.name)
            for f in other_payload:
                cols[f.name] = pa.nulls(n, type=f.type)
            k = t.column(key).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cols["__kind"] = pa.array(
                np.full(n, kind, dtype=np.int8), type=pa.int8()
            )
            cols["__bucket"] = pa.array(_bucket_of(k, n_buckets))
            return pa.table(cols)

        return fn

    rpayload = [f for f in rschema if f.name != key]
    lpayload = [f for f in lschema if f.name != key]
    tagged = left.map_batches(
        prep(0, lschema, rpayload), batch_format="pyarrow"
    ).union(
        right.map_batches(prep(1, rschema, lpayload), batch_format="pyarrow")
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kind = t.column("__kind")
        lt = t.filter(pc.equal(kind, 0)).select(lnames)
        rt = t.filter(pc.equal(kind, 1)).select([key] + rnames)
        return join_bucket_tables(lt, rt, key, lnames, rnames)

    return (
        tagged.groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def join_bucket_tables(lt: pa.Table, rt: pa.Table, key: str,
                       lnames: list[str], rnames: list[str]) -> pa.Table:
    """Vectorized M:N inner join of one bucket: sort the right side by
    key once (STABLE), searchsorted each left key into it, expand
    matches with the repeat/arange trick. Pure Arrow take — int64
    columns stay int64 without the pandas per-side conversion dance.

    Row order WITHIN the bucket reproduces pandas merge on the same two
    tables exactly: left order outer, right rows in their input order
    within each match group (order-asserted by
    tests/test_join_property.py::test_join_bucket_row_order). Order
    ACROSS buckets follows the groupby's block order, so whole-join
    consumers should treat the result as a multiset."""
    lk = lt.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rk = rt.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
    if lk.size == 0 or rk.size == 0:  # a bucket with one side empty
        empty = pa.array([], type=pa.int64())
        lt0 = lt.take(empty)
        rt0 = rt.take(empty)
        cols = {n: lt0.column(n) for n in lnames}
        for n in rnames:
            cols[n] = rt0.column(n)
        return pa.table(cols)
    r_order = np.argsort(rk, kind="stable")
    rks = rk[r_order]
    lo = np.searchsorted(rks, lk, side="left")
    hi = np.searchsorted(rks, lk, side="right")
    cnts = hi - lo
    total = int(cnts.sum())
    l_idx = np.repeat(np.arange(lk.size, dtype=np.int64), cnts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnts)[:-1])), cnts
    )
    r_idx = r_order[np.repeat(lo, cnts) + offs]
    left_taken = lt.take(pa.array(l_idx, type=pa.int64()))
    right_taken = rt.take(pa.array(r_idx, type=pa.int64()))
    cols = {n: left_taken.column(n) for n in lnames}
    for n in rnames:
        cols[n] = right_taken.column(n)
    return pa.table(cols)
