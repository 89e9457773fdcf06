"""Gap-fill stage: densify sparse per-series window grids (GB-map).

Reference semantics: fill_gaps (src/core/time_series.rs:871-932) + LOCF
(sanitized ForwardFill, :673-702) / linear interpolation
(interpolate_series, :1063-1117), applied per series on the window grid.

This is the engine's per-series shuffle: ``groupby(keys).map_groups`` so
each series' full grid is visible to one UDF call. The group UDF is
vectorized NumPy (no Python loop over windows). Partition key: the series
key (doc_id / user_id) — the ONE partitioning key reused across per-series
stages (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np

from ..kernels.fillna import gap_fill_series


def make_gapfill_group_fn(
    keys=("doc_id", "tier"),
    value_col: str = "mean",
    method: str = "locf",
    start: int | None = 0,
    stop: int | None = None,
    drop_leading_nan: bool = False,
):
    """Per-group (one series) pandas UDF: sparse windows -> dense grid.

    ``start=0`` anchors the grid at window 0; ``stop=None`` ends at the
    series' max observed window (reference first..last semantics).
    ``drop_leading_nan`` removes grid rows before the first observation
    (LOCF cannot fill them — reference leaves leading NaN).

    Output: key cols + window_id, <value_col>, filled:bool.
    """

    import pyarrow as pa

    def fill_group(g: pa.Table) -> pa.Table:
        wid = g.column("window_id").to_numpy(zero_copy_only=False)
        order = np.argsort(wid, kind="stable")
        grid, dense, filled = gap_fill_series(
            wid[order],
            g.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[order],
            method=method,
            start=start,
            stop=stop,
        )
        if drop_leading_nan:
            ok = np.isfinite(dense)
            grid, dense, filled = grid[ok], dense[ok], filled[ok]
        cols = {
            "window_id": pa.array(grid, type=pa.int64()),
            value_col: pa.array(dense, type=pa.float64()),
            "filled": pa.array(filled, type=pa.bool_()),
        }
        for k in keys:
            if k in g.column_names:
                col = g.column(k)
                cols[k] = pa.array(
                    [col[0].as_py()] * len(grid), type=col.type
                )
        return pa.table(cols)

    return fill_group


def make_filtered_gapfill_fn(
    width: int,
    predicate,
    method: str = "locf",
    drop_leading_nan: bool = True,
):
    """Fused in-row operator: tokens -> filtered windows -> dense
    gap-filled grid, all inside one ``map_batches`` call (no shuffle).

    Identical results to ``make_filtered_rollup_fn`` + ``gapfill_dataset``
    (the groupby path) because each doc's windows already live in its own
    row — operator fusion, not a semantics change. Output: doc_id,
    window_id, mean, filled.
    """
    import pyarrow as pa

    from ..kernels.rollup import rollup_flat_masked

    def fn(batch: pa.Table) -> pa.Table:
        from .rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        mask = predicate(values)
        r = rollup_flat_masked(values, lengths, width, mask)
        ids = batch.column("doc_id").to_pylist()
        out_doc, out_wid, out_mean, out_filled = [], [], [], []
        ridx = r["row_idx"]
        if ridx.size:
            keep = r["cnt"] > 0
            bounds = np.flatnonzero(
                np.concatenate(([True], ridx[1:] != ridx[:-1]))
            )
            ends = np.concatenate((bounds[1:], [ridx.size]))
            for s0, s1 in zip(bounds, ends):
                k = keep[s0:s1]
                if not k.any():
                    continue
                wid = r["window_id"][s0:s1][k]
                mean = (
                    r["sum"][s0:s1][k].astype(np.float64) / r["cnt"][s0:s1][k]
                )
                grid, dense, filled = gap_fill_series(
                    wid, mean, method=method, start=0
                )
                if drop_leading_nan:
                    ok = np.isfinite(dense)
                    grid, dense, filled = grid[ok], dense[ok], filled[ok]
                out_doc.extend([ids[ridx[s0]]] * grid.size)
                out_wid.extend(grid.tolist())
                out_mean.extend(dense.tolist())
                out_filled.extend(filled.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "window_id": pa.array(out_wid, type=pa.int64()),
                "mean": pa.array(out_mean, type=pa.float64()),
                "filled": pa.array(out_filled, type=pa.bool_()),
            }
        )

    return fn


def gapfill_dataset(
    ds,
    keys=("doc_id", "tier"),
    value_col: str = "mean",
    method: str = "locf",
    start: int | None = 0,
    drop_leading_nan: bool = False,
):
    """rollup Dataset (sparse) -> dense gap-filled Dataset, grouped by keys."""
    return ds.groupby(list(keys)).map_groups(
        make_gapfill_group_fn(
            keys=keys,
            value_col=value_col,
            method=method,
            start=start,
            drop_leading_nan=drop_leading_nan,
        ),
        batch_format="pyarrow",
    )


def events_user_gapfill_fused(ds, n_buckets: int = 64,
                              shuffle_partitions: int | None = None):
    """events(user_id, window_id, cents) -> dense per-user hourly LOCF
    grid in ONE shuffle: per-block partial (user, window) integer
    combine, hash-bucket exchange, then final combine + vectorized
    multi-group LOCF inside each bucket group.

    The unfused path (groupby(user, window).aggregate -> groupby(user)
    .map_groups) is TWO all-to-all exchanges; partial pre-aggregation
    also shrinks the shuffled bytes by the events-per-(user, hour) ratio,
    which is the property that matters at 100x scale."""
    import pyarrow as pa

    from ..kernels.groupfill import locf_fill_multi

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("window_id").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w, c = u[order], w[order], c[order]
        new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1]))
        )
        starts = np.flatnonzero(new)
        s = np.add.reduceat(c, starts)
        cnt = np.diff(np.concatenate((starts, [u.size])))
        uu = u[starts]
        bucket = (uu.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                  >> np.uint64(48)).astype(np.int64) % n_buckets
        return pa.table(
            {
                "user_id": pa.array(uu),
                "window_id": pa.array(w[starts]),
                "s": pa.array(s),
                "cnt": pa.array(cnt.astype(np.int64)),
                "__bucket": pa.array(bucket),
            }
        )

    def fill_bucket(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        w = g.column("window_id").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w, s, cnt = u[order], w[order], s[order], cnt[order]
        # final combine of cross-block partials (exact integer sums)
        new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1]))
        )
        starts = np.flatnonzero(new)
        s = np.add.reduceat(s, starts)
        cnt = np.add.reduceat(cnt, starts)
        u, w = u[starts], w[starts]
        mean = s.astype(np.float64) / cnt
        row_idx, wid, val, filled = locf_fill_multi(
            u, w, mean, start=None, drop_leading_nan=True
        )
        return pa.table(
            {
                "user_id": pa.array(u[row_idx], type=pa.int64()),
                "window_id": pa.array(wid, type=pa.int64()),
                "mean_cents": pa.array(val, type=pa.float64()),
                "filled": pa.array(filled, type=pa.bool_()),
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow")
    if shuffle_partitions is not None:
        # bound the sort-shuffle task count for small inputs (see
        # gapfill_dataset_bucketed)
        out = out.repartition(shuffle_partitions, shuffle=False)
    return (
        out.groupby("__bucket")
        .map_groups(fill_bucket, batch_format="pyarrow")
    )


def gapfill_dataset_bucketed(
    ds,
    key: str = "user_id",
    value_col: str = "mean",
    start: int | None = None,
    drop_leading_nan: bool = True,
    n_buckets: int = 64,
    shuffle_partitions: int | None = None,
):
    """LOCF gap-fill grouped by a HASH BUCKET of an integer key: the same
    single shuffle as the per-key groupby, but ~n_buckets pandas calls
    instead of one per series — inside each call the vectorized
    multi-group kernel fills every series at once
    (kernels/groupfill.locf_fill_multi). Identical rows/values to
    ``gapfill_dataset`` (oracle-hash-equal)."""
    import pyarrow as pa

    from ..kernels.groupfill import locf_fill_multi

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t.column(key)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # vectorized string hash (polars/ahash, deterministic for a
            # given polars build — bucket ids only need run-consistency)
            import polars as pl

            h = pl.from_arrow(
                col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
            ).hash().to_numpy()
            bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        else:
            k = col.to_numpy(zero_copy_only=False)
            bucket = (
                (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 >> np.uint64(48)).astype(np.int64) % n_buckets
            )
        return t.append_column("__bucket", pa.array(bucket))

    def fill_bucket(g: pa.Table) -> pa.Table:
        codes = g.column(key).to_numpy(zero_copy_only=False)
        w = g.column("window_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, codes))
        codes, w = codes[order], w[order]
        row_idx, wid, val, filled = locf_fill_multi(
            codes,
            w,
            g.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[order],
            start=start,
            drop_leading_nan=drop_leading_nan,
        )
        return pa.table(
            {
                key: pa.array(codes[row_idx], type=g.column(key).type),
                "window_id": pa.array(wid, type=pa.int64()),
                value_col: pa.array(val, type=pa.float64()),
                "filled": pa.array(filled, type=pa.bool_()),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    if shuffle_partitions is not None:
        # Ray's sort-shuffle spawns one map+reduce task pair per input
        # block; for sub-GB inputs that coordination dominates the actual
        # exchange (measured 4.2s -> 1.9s at sf0.1). Coalescing (no
        # all-to-all, shuffle=False) bounds the task count. Leave None at
        # real scale where block count should track data volume.
        bucketed = bucketed.repartition(shuffle_partitions, shuffle=False)
    return (
        bucketed
        .groupby("__bucket")
        .map_groups(fill_bucket, batch_format="pyarrow")
    )
