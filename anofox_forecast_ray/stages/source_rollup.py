"""Cross-doc aggregates keyed by source.

Two outputs (FIXTURES.md §2 source_rollup):

1. ``source_window_rollup`` — token aggregates per (source, tier,
   window_id). The key cardinality is BOUNDED (|sources| x |tiers| x
   |windows in the covered time range|) and independent of corpus size, so
   an all-to-all shuffle is the wrong physical plan: we combine partials
   per block inside ``map_batches`` (vectorized: dictionary-encoded keys
   packed into one int64, np.unique + reduceat), then tree-reduce the
   per-block partial tables with raw Ray tasks (fan-in 8). This is the
   documented "drop to Ray tasks where the Dataset API can't express it"
   case (SURVEY.md §4.2): a bounded-output aggregation over unbounded
   input with no shuffle.

2. ``source_doc_stats`` — per-source n_tok aggregates via the same tree.

Partitioning assumption: the merged partial table (one row per distinct
key) fits in one task's memory — holds by construction for low-cardinality
``source`` and time-bounded windows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _combine_partials_table(t: pa.Table) -> pa.Table:
    """Vectorized per-table combine: one row per (source, tier, window_id)."""
    if t.num_rows == 0:
        return t.select(["source", "tier", "window_id", "cnt", "sum", "min", "max"])
    def _as_dict(col):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_dictionary(arr.type):
            return arr
        return arr.dictionary_encode()

    src_d = _as_dict(t.column("source"))
    tier_d = _as_dict(t.column("tier"))
    si = src_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ti = tier_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    win = t.column("window_id").to_numpy(zero_copy_only=False)
    n_tier = len(tier_d.dictionary)
    # packed key: window-major so np.unique's sort groups windows together
    key = (si * n_tier + ti) * (int(win.max()) + 1) + win
    uniq, inverse = np.unique(key, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    seg = np.flatnonzero(np.concatenate(([True], inv_sorted[1:] != inv_sorted[:-1])))

    def agg(col, red, dtype=None):
        v = t.column(col).to_numpy(zero_copy_only=False)[order]
        out = red(v, seg)
        return out if dtype is None else out.astype(dtype, copy=False)

    cnt = agg("cnt", np.add.reduceat)
    s = agg("sum", np.add.reduceat)
    mn = agg("min", np.minimum.reduceat)
    mx = agg("max", np.maximum.reduceat)
    first = order[seg]
    return pa.table(
        {
            "source": src_d.take(pa.array(first)).cast(pa.string()),
            "tier": tier_d.take(pa.array(first)).cast(pa.string()),
            "window_id": pa.array(win[first]),
            "cnt": pa.array(cnt),
            "sum": pa.array(s),
            "min": pa.array(mn),
            "max": pa.array(mx),
        }
    )


def _partial_combine_batch(batch: pa.Table) -> pa.Table:
    return _combine_partials_table(
        batch.select(["source", "tier", "window_id", "cnt", "sum", "min", "max"])
    )


def tree_reduce_tables(refs, merge_fn, fanin: int = 8):
    """Tree-reduce a list of object refs of pyarrow Tables with Ray tasks."""
    import ray

    @ray.remote(num_cpus=1)
    def merge(*tables):
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            # Ray skips UDFs on empty blocks, so a fan-in group can be
            # all (possibly schemaless) empties — propagate one instead
            # of calling concat_tables([]) (ArrowInvalid)
            return tables[0]
        return merge_fn(pa.concat_tables(nonempty))

    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)
        ]
    import ray as _r

    return _r.get(refs[0])


def _empty_source_partial() -> pa.Table:
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


def source_window_partials(rollup_ds) -> pa.Table:
    """Bounded INT partial table (no mean) for one rollup Dataset —
    one row per distinct (source, tier, window_id). The int semigroup
    makes shard partials merge bitwise-exactly: the flagship computes
    one partial per shard (from the in-memory shared corpus) and
    ``finalize_source_window`` folds them, instead of re-reading every
    shard's written rollup rows at the end of the run."""
    partials = rollup_ds.map_batches(
        _partial_combine_batch, batch_format="pyarrow", batch_size=None
    )
    refs = partials.to_arrow_refs()
    if not refs:
        return _empty_source_partial()
    return tree_reduce_tables(list(refs), _combine_partials_table)


def finalize_source_window(partial_tables, as_dataset: bool = True):
    """Merge per-shard int partials and derive mean (a single f64
    division of identical ints — last, so the result is bitwise-equal
    to aggregating all rollup rows in one pass)."""
    tables = [t for t in partial_tables if t.num_rows] or [
        _empty_source_partial()
    ]
    final = _combine_partials_table(
        pa.concat_tables(tables).combine_chunks()
    )
    cnt = final.column("cnt").to_numpy(zero_copy_only=False)
    s = final.column("sum").to_numpy(zero_copy_only=False)
    final = final.append_column(
        "mean", pa.array(s.astype(np.float64) / cnt, type=pa.float64())
    )
    if as_dataset:
        import ray.data as rd

        return rd.from_arrow(final)
    return final


def source_window_rollup(rollup_ds, as_dataset: bool = True):
    """rollup rows -> (source, tier, window_id) aggregates. No shuffle:
    per-block combine + tree reduce."""
    return finalize_source_window(
        [source_window_partials(rollup_ds)], as_dataset=as_dataset
    )


def source_doc_stats(corpus_ds, as_dataset: bool = True):
    """corpus -> per-source doc/n_tok aggregates (tiny result), same tree."""

    _EMPTY = pa.table(
        {
            "source": pa.array([], type=pa.string()),
            "cnt_docs": pa.array([], type=pa.int64()),
            "sum_n_tok": pa.array([], type=pa.int64()),
            "min_n_tok": pa.array([], type=pa.int64()),
            "max_n_tok": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        src = batch.column("source")
        src_d = (
            src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        ).dictionary_encode()
        si = src_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(si, kind="stable")
        ss = si[order]
        seg = np.flatnonzero(np.concatenate(([True], ss[1:] != ss[:-1])))
        v = ntok[order]
        return pa.table(
            {
                "source": src_d.take(pa.array(order[seg])).cast(pa.string()),
                "cnt_docs": pa.array(
                    np.add.reduceat(np.ones_like(v), seg)
                ),
                "sum_n_tok": pa.array(np.add.reduceat(v, seg)),
                "min_n_tok": pa.array(np.minimum.reduceat(v, seg)),
                "max_n_tok": pa.array(np.maximum.reduceat(v, seg)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        # the zero-blocks fallback feeds a constructed 0-row table here;
        # the boundary trick below would index into an empty array
        # (review r4 #2: the pandas groupby this replaced handled empty)
        if t.num_rows == 0:
            return _EMPTY
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        order = np.argsort(src, kind="stable")
        s = src[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))

        def col(name):
            return t.column(name).to_numpy(zero_copy_only=False).astype(
                np.int64
            )[order]

        return pa.table(
            {
                "source": pa.array(s[starts].tolist(), type=pa.string()),
                "cnt_docs": pa.array(
                    np.add.reduceat(col("cnt_docs"), starts),
                    type=pa.int64(),
                ),
                "sum_n_tok": pa.array(
                    np.add.reduceat(col("sum_n_tok"), starts),
                    type=pa.int64(),
                ),
                "min_n_tok": pa.array(
                    np.minimum.reduceat(col("min_n_tok"), starts),
                    type=pa.int64(),
                ),
                "max_n_tok": pa.array(
                    np.maximum.reduceat(col("max_n_tok"), starts),
                    type=pa.int64(),
                ),
            }
        )

    partials = corpus_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    refs = list(partials.to_arrow_refs())
    final = merge(
        pa.concat_tables([__import__("ray").get(r) for r in refs])
        if refs
        else pa.table(
            {
                "source": pa.array([], pa.string()),
                "cnt_docs": pa.array([], pa.int64()),
                "sum_n_tok": pa.array([], pa.int64()),
                "min_n_tok": pa.array([], pa.int64()),
                "max_n_tok": pa.array([], pa.int64()),
            }
        )
    )
    cd = final.column("cnt_docs").to_numpy(zero_copy_only=False)
    sn = final.column("sum_n_tok").to_numpy(zero_copy_only=False)
    final = final.append_column(
        "mean_n_tok", pa.array(sn.astype(np.float64) / cd, type=pa.float64())
    )
    if as_dataset:
        import ray.data as rd

        return rd.from_arrow(final)
    return final
