"""Distributed EXACT quantiles without a global sort.

The naive way to get percentiles of a 100 TB column is sort + index —
an all-to-all shuffle of every row. This stage does it with two
bounded passes instead:

  pass 1: per-batch counts per coarse range bucket (cents // 256),
          tree-reduced — bucket space is value-range/256, bounded for
          any bounded-range measure column;
  pass 2: for only the buckets containing the target ranks, per-batch
          (exact value, count) partials — at most 256 DISTINCT values
          per bucket by construction, so the result stays tiny under
          ANY skew (a billion duplicates of one price is one row).

The driver then reads the target ranks out of the count tables and
interpolates. Values are integer cents (np.round == DuckDB round_even)
and the quantile fractions are quarters, so lo + (hi-lo)*g is exact
dyadic float math and the result matches DuckDB quantile_cont
bit-for-bit (the repo's established np.quantile/quantile_cont
equivalence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BUCKET_W = 256  # cents per coarse bucket


def _cents_batch(col: str):
    def fn(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        cents = np.round(v * 100.0).astype(np.int64)
        return pa.table({"cents": pa.array(cents, type=pa.int64())})

    return fn


def _count_partial(key_fn):
    def fn(t: pa.Table) -> pa.Table:
        k = key_fn(t.column("cents").to_numpy(zero_copy_only=False))
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    return fn


def _merge_counts(t: pa.Table) -> pa.Table:
    if "key" not in t.column_names:  # Ray skips UDFs on empty blocks,
        # so an all-empty input arrives as a schemaless empty table
        return pa.table({"key": pa.array([], type=pa.int64()),
                         "cnt": pa.array([], type=pa.int64())})
    k = t.column("key").to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    uk, start = np.unique(k[order], return_index=True)
    return pa.table(
        {
            "key": pa.array(uk, type=pa.int64()),
            "cnt": pa.array(
                np.add.reduceat(c[order], start).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )


def _tree_counts(ds) -> tuple[np.ndarray, np.ndarray]:
    from .source_rollup import tree_reduce_tables

    refs = list(ds.to_arrow_refs())
    if not refs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = tree_reduce_tables(refs, _merge_counts)
    return (
        t.column("key").to_numpy(zero_copy_only=False),
        t.column("cnt").to_numpy(zero_copy_only=False),
    )


def exact_quantiles(make_cents_ds, qs=(0.25, 0.5, 0.75)):
    """make_cents_ds: zero-arg callable returning a Dataset with an
    int64 ``cents`` column (called once per pass — each pass streams the
    input; nothing corpus-sized is ever collected).
    Returns a pyarrow Table (q, value) matching quantile_cont."""
    # pass 1: coarse bucket counts
    bkeys, bcnts = _tree_counts(
        make_cents_ds().map_batches(
            _count_partial(lambda c: c // BUCKET_W), batch_format="pyarrow"
        )
    )
    n = int(bcnts.sum())
    if n == 0:
        return pa.table({"q": pa.array(list(qs), type=pa.float64()),
                         "value": pa.array([float("nan")] * len(qs),
                                           type=pa.float64())})
    cum = np.cumsum(bcnts)

    # target global ranks (0-based, quantile_cont definition)
    targets: dict[int, None] = {}
    for q in qs:
        h = (n - 1) * q
        targets[int(np.floor(h))] = None
        targets[int(np.ceil(h))] = None
    ranks = sorted(targets)

    # which coarse buckets hold those ranks
    bucket_idx = np.searchsorted(cum, np.asarray(ranks), side="right")
    needed = set(int(bkeys[i]) for i in bucket_idx)

    # pass 2: exact value counts inside only the needed buckets
    needed_arr = np.asarray(sorted(needed), dtype=np.int64)

    def filter_needed(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        keep = np.isin(c // BUCKET_W, needed_arr)
        return pa.table({"cents": pa.array(c[keep], type=pa.int64())})

    vkeys, vcnts = _tree_counts(
        make_cents_ds()
        .map_batches(filter_needed, batch_format="pyarrow")
        .map_batches(_count_partial(lambda c: c), batch_format="pyarrow")
    )
    # global rank of the first occurrence of each distinct needed value:
    # ranks below its bucket + ranks of smaller values within needed set
    below = {}
    for b in needed:
        i = int(np.searchsorted(bkeys, b))
        below[b] = int(cum[i - 1]) if i > 0 else 0
    val_rank_start = {}
    run = {}
    for v, c in zip(vkeys, vcnts):  # vkeys ascending
        b = int(v) // BUCKET_W
        start = below[b] + run.get(b, 0)
        val_rank_start[int(v)] = start
        run[b] = run.get(b, 0) + int(c)

    def value_at(rank: int) -> int:
        # last value whose start <= rank
        vs = vkeys
        starts = np.asarray([val_rank_start[int(v)] for v in vs])
        i = int(np.searchsorted(starts, rank, side="right")) - 1
        return int(vs[i])

    out_q, out_v = [], []
    for q in qs:
        h = (n - 1) * q
        lo = value_at(int(np.floor(h)))
        hi = value_at(int(np.ceil(h)))
        g = h - np.floor(h)
        out_q.append(float(q))
        out_v.append(float(lo) + (float(hi) - float(lo)) * float(g))
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})


def events_value_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75)):
    """Quantiles of round_even(events.value * 100) cents."""
    import ray.data as rd

    from ..pipelines.queries import _num_read_blocks

    def mk():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["value"],
            override_num_blocks=_num_read_blocks(),
        ).map_batches(_cents_batch("value"), batch_format="pyarrow")

    return exact_quantiles(mk, qs)


def events_value_quantiles_sql(qs=(0.25, 0.5, 0.75)) -> str:
    qlist = ", ".join(str(q) for q in qs)
    return f"""
    WITH c AS (
        SELECT CAST(round_even(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    agg AS (SELECT quantile_cont(cents, [{qlist}]) AS vs FROM c)
    SELECT unnest([{qlist}]) AS q, unnest(vs) AS value FROM agg
    """


# ------------------------------------------------ float order statistics
_F64_FLIP = np.int64(0x7FFFFFFFFFFFFFFF)


def float_order_keys(x: np.ndarray) -> np.ndarray:
    """IEEE double -> int64, total-order preserving (an involution):
    non-negative doubles keep their bit pattern (already ascending as
    int64); negative doubles flip their magnitude bits so more-negative
    sorts lower. Lets the integer selection machinery run on floats."""
    i = np.ascontiguousarray(x, dtype=np.float64).view(np.int64)
    return np.where(i >= 0, i, i ^ _F64_FLIP)


def keys_to_float(k: np.ndarray) -> np.ndarray:
    """Inverse of float_order_keys (same involution)."""
    i = np.where(k >= 0, k, k ^ _F64_FLIP)
    return np.ascontiguousarray(i, dtype=np.int64).view(np.float64)


SHIFT_COARSE = 40  # coarse bucket = key >> 40 (arithmetic, order-safe)


def exact_order_stats(make_keys_ds, ranks) -> dict[int, int]:
    """Exact k-th order statistics (0-based ascending ranks) of an int64
    ``key`` column, without a global sort: coarse bucket counts (key >>
    40, only populated buckets materialize), then exact counts inside
    only the buckets containing the target ranks. make_keys_ds is a
    zero-arg callable returning the Dataset fresh per pass."""
    ranks = sorted(set(int(r) for r in ranks))

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"cents": t.column("key").cast(pa.int64())})

    bkeys, bcnts = _tree_counts(
        make_keys_ds()
        .map_batches(to_cents, batch_format="pyarrow")
        .map_batches(
            _count_partial(lambda c: c >> SHIFT_COARSE),
            batch_format="pyarrow",
        )
    )
    n = int(bcnts.sum())
    if n == 0 or ranks[-1] >= n or ranks[0] < 0:
        raise ValueError(f"ranks {ranks} out of range for n={n}")
    cum = np.cumsum(bcnts)
    bucket_idx = np.searchsorted(cum, np.asarray(ranks), side="right")
    needed = sorted(set(int(bkeys[i]) for i in bucket_idx))
    needed_arr = np.asarray(needed, dtype=np.int64)

    def filter_needed(t: pa.Table) -> pa.Table:
        c = t.column("key").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.isin(c >> SHIFT_COARSE, needed_arr)
        return pa.table({"cents": pa.array(c[keep], type=pa.int64())})

    vkeys, vcnts = _tree_counts(
        make_keys_ds()
        .map_batches(filter_needed, batch_format="pyarrow")
        .map_batches(_count_partial(lambda c: c), batch_format="pyarrow")
    )
    below = {}
    for b in needed:
        i = int(np.searchsorted(bkeys, b))
        below[b] = int(cum[i - 1]) if i > 0 else 0
    starts = np.empty(vkeys.size, dtype=np.int64)
    run: dict[int, int] = {}
    for j, (v, c) in enumerate(zip(vkeys, vcnts)):  # ascending
        b = int(v) >> SHIFT_COARSE
        starts[j] = below[b] + run.get(b, 0)
        run[b] = run.get(b, 0) + int(c)
    out = {}
    for r in ranks:
        i = int(np.searchsorted(starts, r, side="right")) - 1
        out[r] = int(vkeys[i])
    return out


# ------------------------------------------------ per-group exact quantiles

def grouped_exact_quantiles(make_ds, group_col: str, qs=(0.25, 0.5, 0.75)):
    """Exact per-group quantiles with NO global sort and NO per-group
    gather — the groupwise generalization of ``exact_quantiles`` for a
    bounded set of groups (event types, sources, tiers):

      pass 0: distinct groups (per-block unique partials, tree-reduced);
      pass 1: counts per (group, coarse bucket) composite int64 key —
              gid·2^32 + cents//256 keeps (group, bucket) order;
      pass 2: exact value counts only for the (group, bucket) pairs
              straddling that group's target ranks.

    ``make_ds``: zero-arg callable returning a Dataset with columns
    ``group_col`` (string) and ``cents`` (int64, |cents| < 2^31). Each
    pass streams; only bounded partials are collected.
    Returns a pyarrow Table (group, q, value) matching quantile_cont.
    """
    import pyarrow.compute as pc

    from .source_rollup import tree_reduce_tables

    def gpartial(t: pa.Table) -> pa.Table:
        if group_col not in t.column_names:  # schemaless empty block
            return pa.table({"g": pa.array([], type=pa.string())})
        return pa.table({"g": pc.unique(t.column(group_col))})

    def gmerge(t: pa.Table) -> pa.Table:
        if "g" not in t.column_names:
            return pa.table({"g": pa.array([], type=pa.string())})
        return pa.table({"g": pc.unique(t.column("g"))})

    refs = list(
        make_ds().map_batches(gpartial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    if not refs:
        return pa.table({"group": pa.array([], type=pa.string()),
                         "q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    gt = tree_reduce_tables(refs, gmerge)
    groups = sorted(
        gt.column("g").to_pylist() if "g" in gt.column_names else []
    )
    if not groups:
        return pa.table({"group": pa.array([], type=pa.string()),
                         "q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    gid = {g: i for i, g in enumerate(groups)}
    STRIDE = np.int64(1) << np.int64(32)

    def composite(key_of_cents):
        def fn(t: pa.Table) -> pa.Table:
            c = t.column("cents").to_numpy(zero_copy_only=False)
            gs = t.column(group_col).to_pylist()
            gi = np.fromiter((gid[g] for g in gs), dtype=np.int64,
                             count=len(gs))
            k = gi * STRIDE + key_of_cents(c)
            uk, cnt = np.unique(k, return_counts=True)
            return pa.table(
                {"key": pa.array(uk, type=pa.int64()),
                 "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())}
            )

        return fn

    def tree(ds):
        refs = list(ds.to_arrow_refs())
        t = tree_reduce_tables(refs, _merge_counts)
        return (t.column("key").to_numpy(zero_copy_only=False),
                t.column("cnt").to_numpy(zero_copy_only=False))

    # pass 1: (group, coarse bucket) counts
    bkeys, bcnts = tree(
        make_ds().map_batches(composite(lambda c: c // BUCKET_W),
                              batch_format="pyarrow")
    )
    bg = (bkeys // STRIDE).astype(np.int64)
    bbuck = bkeys - bg * STRIDE

    # per-group targets and needed buckets
    needed_keys = []
    group_meta = {}
    for g in groups:
        i = gid[g]
        sel = bg == i
        cnts = bcnts[sel]
        bucks = bbuck[sel]              # ascending within group
        n = int(cnts.sum())
        if n == 0:
            continue
        cum = np.cumsum(cnts)
        targets = sorted({int(np.floor((n - 1) * q)) for q in qs}
                         | {int(np.ceil((n - 1) * q)) for q in qs})
        bidx = np.searchsorted(cum, np.asarray(targets), side="right")
        nb = sorted({int(bucks[j]) for j in bidx})
        group_meta[i] = (n, bucks, cum, set(nb))
        needed_keys.extend(i * int(STRIDE) + b for b in nb)
    needed_arr = np.asarray(sorted(needed_keys), dtype=np.int64)

    def filter_needed(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        gs = t.column(group_col).to_pylist()
        gi = np.fromiter((gid[g] for g in gs), dtype=np.int64,
                         count=len(gs))
        keep = np.isin(gi * STRIDE + c // BUCKET_W, needed_arr)
        ka = pa.array(keep)
        return pa.table({group_col: t.column(group_col).filter(ka),
                         "cents": pa.array(c[keep], type=pa.int64())})

    vkeys, vcnts = tree(
        make_ds()
        .map_batches(filter_needed, batch_format="pyarrow")
        .map_batches(composite(lambda c: c), batch_format="pyarrow")
    )
    vg = (vkeys // STRIDE).astype(np.int64)
    vval = vkeys - vg * STRIDE

    out_g, out_q, out_v = [], [], []
    for g in groups:
        i = gid[g]
        if i not in group_meta:
            continue
        n, bucks, cum, _nb = group_meta[i]
        sel = vg == i
        vs = vval[sel]
        cs = vcnts[sel]
        # rank of first occurrence of each distinct value in this group
        below = {int(b): (int(cum[j - 1]) if j > 0 else 0)
                 for j, b in enumerate(bucks)}
        starts = np.empty(vs.size, dtype=np.int64)
        run: dict[int, int] = {}
        for j, (v, c) in enumerate(zip(vs, cs)):
            b = int(v) // BUCKET_W
            starts[j] = below[b] + run.get(b, 0)
            run[b] = run.get(b, 0) + int(c)

        def value_at(rank: int) -> int:
            j = int(np.searchsorted(starts, rank, side="right")) - 1
            return int(vs[j])

        for q in qs:
            h = (n - 1) * q
            lo = value_at(int(np.floor(h)))
            hi = value_at(int(np.ceil(h)))
            gg = h - np.floor(h)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(float(lo) + (float(hi) - float(lo)) * float(gg))
    return pa.table({"group": pa.array(out_g, type=pa.string()),
                     "q": pa.array(out_q, type=pa.float64()),
                     "value": pa.array(out_v, type=pa.float64())})
