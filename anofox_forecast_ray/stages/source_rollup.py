"""Cross-doc aggregates keyed by source: the engine's genuine shuffle.

Two outputs (FIXTURES.md §2 source_rollup):

1. ``source_window_rollup`` — token aggregates per (source, tier,
   window_id), combining the per-doc rollup partials with a
   ``groupby().aggregate`` (algebraic: cnt/sum add, min/max extremize,
   mean derived at emission). The input is already pre-aggregated to one
   row per (doc, window) by the rollup stage, so the shuffle moves partial
   rows, not token rows (SURVEY.md §4.2 pre-aggregation rule).

2. ``source_doc_stats`` — per-source n_tok aggregates straight off the
   corpus (cnt_docs, sum/min/max/mean of n_tok).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _partial_combine_batch(batch: pa.Table) -> pa.Table:
    """In-batch combiner: collapse rollup rows to one partial per
    (source, tier, window_id) before the global shuffle."""
    import pandas as pd

    df = batch.select(["source", "tier", "window_id", "cnt", "sum", "min", "max"]).to_pandas()
    g = df.groupby(["source", "tier", "window_id"], sort=False, as_index=False).agg(
        cnt=("cnt", "sum"),
        sum=("sum", "sum"),
        min=("min", "min"),
        max=("max", "max"),
    )
    return pa.Table.from_pandas(g, preserve_index=False).cast(
        pa.schema(
            [
                ("source", pa.string()),
                ("tier", pa.string()),
                ("window_id", pa.int64()),
                ("cnt", pa.int64()),
                ("sum", pa.int64()),
                ("min", pa.int32()),
                ("max", pa.int32()),
            ]
        )
    )


def source_window_rollup(rollup_ds):
    """rollup rows -> (source, tier, window_id) aggregates. One shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    partials = rollup_ds.map_batches(_partial_combine_batch, batch_format="pyarrow")
    agg = partials.groupby(["source", "tier", "window_id"]).aggregate(
        Sum("cnt", alias_name="cnt"),
        Sum("sum", alias_name="sum"),
        Min("min", alias_name="min"),
        Max("max", alias_name="max"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        s = batch.column("sum").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "mean", pa.array(s.astype(np.float64) / cnt, type=pa.float64())
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def source_doc_stats(corpus_ds):
    """corpus -> per-source doc/n_tok aggregates (tiny result)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    return corpus_ds.groupby("source").aggregate(
        Count(alias_name="cnt_docs"),
        Sum("n_tok", alias_name="sum_n_tok"),
        Min("n_tok", alias_name="min_n_tok"),
        Max("n_tok", alias_name="max_n_tok"),
        Mean("n_tok", alias_name="mean_n_tok"),
    )
