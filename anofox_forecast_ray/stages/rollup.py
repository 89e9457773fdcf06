"""Ray Data rollup stages: corpus -> tiered continuous aggregates.

Design (SURVEY.md §7.1, rethought Ray-Data-first):

A doc's whole token series lives inside its own row, and every tier width
divides the chunk stride — so ALL per-doc tiers are computed *inside one
``map_batches`` call* with zero shuffle. The only genuine all-to-all
exchange in the engine is the cross-doc ``source_rollup`` (groupby on
(source, tier, window_id)), which is pre-aggregated per batch first so the
shuffle moves partial rows, not token rows.

Long-doc skew (one doc with 10^8 tokens) is handled *before* rollup by
``explode_chunks``: the list column is split into chunk rows on boundaries
aligned to the coarsest tier width, so every output window of every tier is
wholly contained in one chunk -> chunk outputs concatenate with NO merge
step and remain bitwise identical to the unchunked path. window_ids are
offset by the chunk's base position.

Output schema per tier (FIXTURES.md §2):
  doc_id:string, tier:string, window_id:int64, cnt:int64, sum:int64,
  min:int32, max:int32, mean:float64, source:string (kept for the
  source_rollup pre-aggregation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, TierSpec
from ..kernels.rollup import rollup_flat, rollup_flat_tiers


def _dict_encode(col, enable: bool = True):
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not enable or pa.types.is_dictionary(arr.type):
        return arr
    return arr.dictionary_encode()


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy flat values + per-row lengths from the tokens list column."""
    col = batch.column("tokens")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    # arr.offsets includes the slice offset; normalize with arr.values
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    # slice values to the window this array actually covers
    values = values[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return values, lengths


class ExplodeChunks:
    """map_batches(pyarrow) stage: split long docs into aligned chunk rows.

    Adds a ``pos0:int64`` column = absolute position of the chunk's first
    token within its doc (multiple of ``stride``). Docs shorter than the
    stride pass through with pos0=0. Downstream window_ids are computed as
    ``(pos0 + local_pos) // width`` — exact because stride % width == 0 for
    every tier width.
    """

    def __init__(self, stride: int):
        self.stride = int(stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, lengths = _flat_tokens(batch)
        stride = self.stride
        if (lengths <= stride).all():
            # fast path: nothing to split — avoid the full token gather
            return batch.append_column(
                "pos0", pa.array(np.zeros(lengths.size, dtype=np.int64))
            )
        n_chunks = np.maximum(1, (lengths + stride - 1) // stride)
        row_idx = np.repeat(np.arange(lengths.size, dtype=np.int64), n_chunks)
        first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        local_chunk = np.arange(row_idx.size, dtype=np.int64) - np.repeat(first, n_chunks)
        pos0 = local_chunk * stride
        chunk_len = np.minimum(stride, lengths[row_idx] - pos0)
        chunk_len = np.maximum(chunk_len, 0)
        doc_starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
        seg_start = doc_starts[row_idx] + pos0
        # build the chunked list column
        new_offsets = np.concatenate(([0], np.cumsum(chunk_len)))
        take_idx = np.repeat(seg_start, chunk_len) + (
            np.arange(int(chunk_len.sum()), dtype=np.int64)
            - np.repeat(new_offsets[:-1], chunk_len)
        )
        flat = values[take_idx]
        tokens = pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32))
            if new_offsets[-1] < 2**31
            else pa.array(new_offsets),
            pa.array(flat, type=pa.int32()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(row_idx)),
                "tokens": tokens,
                "n_tok": batch.column("n_tok").take(pa.array(row_idx)),
                "source": batch.column("source").take(pa.array(row_idx)),
                "pos0": pa.array(pos0),
            }
        )


def make_tier_rollup_fn(tiers: tuple[TierSpec, ...], include_raw: bool = False,
                        dict_keys: bool = False):
    """Returns a map_batches(pyarrow) fn: corpus rows -> tier rollup rows.

    Works on plain corpus batches (no pos0) and chunked batches (pos0
    present). Emits every tier from each batch in one pass — reading the
    flat token buffer once per tier via ``np.*.reduceat`` (vectorized).
    """
    tier_list = list(tiers)
    if include_raw:
        tier_list = [TierSpec("raw", 1)] + tier_list

    def rollup_batch(batch: pa.Table) -> pa.Table:
        values, lengths = _flat_tokens(batch)
        has_pos0 = "pos0" in batch.column_names
        pos0 = (
            batch.column("pos0").to_numpy(zero_copy_only=False)
            if has_pos0
            else np.zeros(lengths.size, dtype=np.int64)
        )
        # dictionary-encode the repeated string keys once per batch: takes
        # then move int32 indices, and parquet writes stay dictionary-
        # encoded (large rollup outputs: millions of rows per batch)
        doc_ids = _dict_encode(batch.column("doc_id"), dict_keys)
        sources = _dict_encode(batch.column("source"), dict_keys)
        outs = []
        # one raw pass for the finest tier; coarser tiers compose from it
        # (bitwise-identical int semigroup — kernels/rollup.py)
        by_width = rollup_flat_tiers(
            values, lengths, [t.width for t in tier_list]
        )
        for tier in tier_list:
            r = by_width[tier.width]
            ridx = r["row_idx"]
            if ridx.size == 0:
                continue
            win = r["window_id"] + pos0[ridx] // tier.width
            take = pa.array(ridx)
            outs.append(
                pa.table(
                    {
                        "doc_id": doc_ids.take(take),
                        "source": sources.take(take),
                        "tier": pa.repeat(tier.name, ridx.size),
                        "window_id": pa.array(win),
                        "cnt": pa.array(r["cnt"]),
                        "sum": pa.array(r["sum"]),
                        "min": pa.array(r["min"]),
                        "max": pa.array(r["max"]),
                        "mean": pa.array(
                            r["sum"].astype(np.float64) / r["cnt"]
                        ),
                    }
                )
            )
        if not outs:
            return _empty_rollup_table(dict_keys)
        return pa.concat_tables(outs)

    return rollup_batch


def make_filtered_rollup_fn(tiers: tuple[TierSpec, ...], predicate):
    """Rollup over only the tokens where ``predicate(values)->bool mask``.

    Windows stay defined on ORIGINAL positions; windows with zero
    qualifying tokens are dropped (they are the "gaps" the gap-fill stage
    later densifies — this is the engine's sparse-series producer).
    """
    from ..kernels.rollup import rollup_flat_masked

    def rollup_batch(batch: pa.Table) -> pa.Table:
        values, lengths = _flat_tokens(batch)
        mask = predicate(values)
        has_pos0 = "pos0" in batch.column_names
        pos0 = (
            batch.column("pos0").to_numpy(zero_copy_only=False)
            if has_pos0
            else np.zeros(lengths.size, dtype=np.int64)
        )
        doc_ids = _dict_encode(batch.column("doc_id"), False)
        sources = _dict_encode(batch.column("source"), False)
        outs = []
        for tier in tiers:
            r = rollup_flat_masked(values, lengths, tier.width, mask)
            keep = r["cnt"] > 0
            ridx = r["row_idx"][keep]
            if ridx.size == 0:
                continue
            win = r["window_id"][keep] + pos0[ridx] // tier.width
            take = pa.array(ridx)
            cnt = r["cnt"][keep]
            s = r["sum"][keep]
            outs.append(
                pa.table(
                    {
                        "doc_id": doc_ids.take(take),
                        "source": sources.take(take),
                        "tier": pa.repeat(tier.name, ridx.size),
                        "window_id": pa.array(win),
                        "cnt": pa.array(cnt),
                        "sum": pa.array(s),
                        "min": pa.array(r["min"][keep]),
                        "max": pa.array(r["max"][keep]),
                        "mean": pa.array(s.astype(np.float64) / cnt),
                    }
                )
            )
        if not outs:
            return _empty_rollup_table()
        return pa.concat_tables(outs)

    return rollup_batch


def _empty_rollup_table(dict_keys: bool = False) -> pa.Table:
    key_t = (
        pa.dictionary(pa.int32(), pa.string()) if dict_keys else pa.string()
    )
    return pa.table(
        {
            "doc_id": pa.array([], type=key_t),
            "source": pa.array([], type=key_t),
            "tier": pa.array([], type=pa.string()),
            "window_id": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
            "sum": pa.array([], type=pa.int64()),
            "min": pa.array([], type=pa.int32()),
            "max": pa.array([], type=pa.int32()),
            "mean": pa.array([], type=pa.float64()),
        }
    )


def rollup_dataset(ds, cfg: EngineConfig, *, chunk_long_docs: bool = True):
    """corpus Dataset -> tier rollup Dataset (no shuffle).

    ``chunk_long_docs`` inserts the aligned ExplodeChunks stage so a single
    giant doc cannot pin one task (SURVEY.md §7.4 long-token skew).
    """
    if chunk_long_docs:
        ds = ds.map_batches(
            ExplodeChunks(cfg.chunk_stride),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    # dict-encoded keys: the flagship consumes this output via
    # write_parquet + the tree-reduce source rollup (both dictionary-safe);
    # NOTE Ray's groupby cannot sort dictionary columns — use
    # make_tier_rollup_fn(dict_keys=False) before groupby stages
    return ds.map_batches(
        make_tier_rollup_fn(cfg.tiers, cfg.include_raw, dict_keys=True),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def make_incremental_refresh_fn(width: int, num: int = 3, den: int = 4):
    """map_batches(pyarrow) stage: incremental continuous-aggregate
    refresh — the TimescaleDB-style "only dirty windows" update the
    north star's retention engine needs for late-arriving appends.

    Each doc is split deterministically at ``split = n_tok*num//den``
    into a BASE prefix (simulating the stored aggregate: its rollup rows
    are computed once and never touched again) and a DELTA suffix
    (tokens appended later, landing mid-window). The delta is rolled up
    at its absolute offset (`rollup_flat_at`) — first window partial —
    and merged into the base rows purely through the (cnt,sum,min,max)
    semigroup (`merge_window_rows`): base raw tokens are never re-read,
    only the boundary window's stored partial row changes, and the
    result is bitwise what a full recompute over all tokens emits
    (associativity of integer partials). Oracle = the direct full-rollup
    SQL.
    """

    def refresh(batch: pa.Table) -> pa.Table:
        from ..kernels.rollup import merge_window_rows, rollup_flat_at

        values, lengths = _flat_tokens(batch)
        starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
        split = (lengths * num) // den
        dlen = lengths - split
        # ragged gathers for the two halves
        b_off = np.concatenate(([0], np.cumsum(split)))
        b_take = np.repeat(starts, split) + (
            np.arange(int(b_off[-1]), dtype=np.int64)
            - np.repeat(b_off[:-1], split)
        )
        d_off = np.concatenate(([0], np.cumsum(dlen)))
        d_take = np.repeat(starts + split, dlen) + (
            np.arange(int(d_off[-1]), dtype=np.int64)
            - np.repeat(d_off[:-1], dlen)
        )
        base = rollup_flat(values[b_take], split, width)
        delta = rollup_flat_at(values[d_take], dlen, split, width)
        ridx, win, cnt, s, mn, mx = merge_window_rows(
            np.concatenate((base["row_idx"], delta["row_idx"])),
            np.concatenate((base["window_id"], delta["window_id"])),
            np.concatenate((base["cnt"], delta["cnt"])),
            np.concatenate((base["sum"], delta["sum"])),
            np.concatenate((base["min"], delta["min"])),
            np.concatenate((base["max"], delta["max"])),
        )
        if ridx.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "window_id": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "sum": pa.array([], type=pa.int64()),
                    "min": pa.array([], type=pa.int32()),
                    "max": pa.array([], type=pa.int32()),
                    "mean": pa.array([], type=pa.float64()),
                }
            )
        doc_ids = _dict_encode(batch.column("doc_id"), False)
        return pa.table(
            {
                "doc_id": doc_ids.take(pa.array(ridx)),
                "window_id": pa.array(win),
                "cnt": pa.array(cnt),
                "sum": pa.array(s),
                "min": pa.array(mn),
                "max": pa.array(mx),
                "mean": pa.array(s.astype(np.float64) / cnt),
            }
        )

    return refresh


def make_compact_fn(factor: int, out_tier: str):
    """map_batches(pyarrow) stage: FINE-tier rollup rows -> COARSE-tier
    rows (window_id // factor), without touching raw tokens — the
    retention compaction step (raw can be expired; coarser tiers keep
    deriving from finer ones).

    Shuffle-free by the tier-nesting invariant: a rollup batch holds
    each doc-chunk's fine windows contiguously and chunk boundaries are
    aligned to a multiple of every tier width, so all ``factor`` fine
    rows of a coarse window sit adjacent in the same batch. Aggregates
    compose exactly: cnt/sum add, min/max fold, mean re-derives as one
    f64 division of the composed int64s — bitwise what a direct
    coarse-tier rollup emits.
    """
    import pyarrow.compute as pc

    def compact(t: pa.Table) -> pa.Table:
        n = t.num_rows
        doc = t.column("doc_id")
        doc = doc.combine_chunks() if isinstance(doc, pa.ChunkedArray) else doc
        if pa.types.is_dictionary(doc.type):
            doc = doc.cast(pa.string())
        src = t.column("source")
        src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        if pa.types.is_dictionary(src.type):
            src = src.cast(pa.string())
        win = t.column("window_id").to_numpy(zero_copy_only=False)
        if n == 0:
            return _empty_rollup_table()
        cwin = win // factor
        if n == 1:
            new = np.array([True])
        else:
            diff_doc = pc.not_equal(
                doc.slice(1), doc.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            new = np.concatenate(
                ([True], diff_doc | (cwin[1:] != cwin[:-1]))
            )
        start = np.flatnonzero(new)
        cnt = np.add.reduceat(
            t.column("cnt").to_numpy(zero_copy_only=False), start
        ).astype(np.int64)
        s = np.add.reduceat(
            t.column("sum").to_numpy(zero_copy_only=False), start
        ).astype(np.int64)
        mn = np.minimum.reduceat(
            t.column("min").to_numpy(zero_copy_only=False), start
        )
        mx = np.maximum.reduceat(
            t.column("max").to_numpy(zero_copy_only=False), start
        )
        take = pa.array(start)
        return pa.table(
            {
                "doc_id": doc.take(take),
                "source": src.take(take),
                "tier": pa.repeat(out_tier, start.size),
                "window_id": pa.array(cwin[start], type=pa.int64()),
                "cnt": pa.array(cnt),
                "sum": pa.array(s),
                "min": pa.array(mn.astype(np.int32, copy=False)),
                "max": pa.array(mx.astype(np.int32, copy=False)),
                "mean": pa.array(s.astype(np.float64) / cnt),
            }
        )

    return compact
