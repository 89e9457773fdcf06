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
import pandas as pd

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

    def fill_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("window_id")
        grid, dense, filled = gap_fill_series(
            g["window_id"].to_numpy(),
            g[value_col].to_numpy(dtype=np.float64),
            method=method,
            start=start,
            stop=stop,
        )
        out = pd.DataFrame({"window_id": grid, value_col: dense, "filled": filled})
        for k in keys:
            if k in g.columns:
                out[k] = g[k].iloc[0]
        if drop_leading_nan:
            out = out[np.isfinite(out[value_col].to_numpy())]
        return out

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
        batch_format="pandas",
    )
