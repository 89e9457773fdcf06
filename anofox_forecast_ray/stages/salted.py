"""Salted two-phase aggregation for skewed keys.

The north rule names salted repartitioning as the skew strategy. For the
flagship's own per-doc rollup we do better — chunk boundaries aligned to
tier widths make the work shuffle-free (stages/rollup.ExplodeChunks). This
module is the GENERAL tool for aggregations whose keys are hot enough to
pin a reducer (SURVEY.md §4.2 "salt hot keys"):

    phase 1: groupby((key, salt)) with salt = hash(row) % buckets —
             spreads each hot key over ``buckets`` reducers
    phase 2: groupby(key) over the (tiny) per-salt partials

Only algebraic aggregates compose across phases (count/sum/min/max; mean
is carried as sum+count and derived at the end) — the same associativity
discipline that makes the tier rollups bitwise-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

def salted_groupby_aggregate(
    ds,
    key: str,
    value: str,
    salt_buckets: int = 16,
    with_mean: bool = True,
):
    """Two-phase skew-resistant aggregate.

    Returns a Dataset with columns: key, cnt, sum, min, max [, mean].
    Values must be numeric; sums accumulate in int64/float64 as given.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # deterministic per-row salt: row position hash — spreads every
        # key's rows regardless of content
        salt = (np.arange(n, dtype=np.int64) * 2654435761) % salt_buckets
        return t.append_column("_salt", pa.array(salt))

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(
            Count(alias_name="cnt"),
            Sum(value, alias_name="sum"),
            Min(value, alias_name="min"),
            Max(value, alias_name="max"),
        )
    )
    phase2 = phase1.groupby(key).aggregate(
        Sum("cnt", alias_name="cnt"),
        Sum("sum", alias_name="sum"),
        Min("min", alias_name="min"),
        Max("max", alias_name="max"),
    )
    if not with_mean:
        return phase2

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("sum").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        return t.append_column(
            "mean", pa.array(s.astype(np.float64) / c, type=pa.float64())
        )

    return phase2.map_batches(finalize, batch_format="pyarrow")
