"""CSV series loading — the reference harness's ingestion format.

The reference loads `timestamp,value` CSVs from validation/data/*.csv
(tests/statsforecast_comparison.rs:21-57). Here: a Ray reader returning a
(series_id, ts:int64 epoch-seconds, value:float64) Dataset, plus a driver
helper for fixture-sized files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv


def load_series_csv(path: str, series_id: str | None = None) -> pa.Table:
    """One `timestamp,value` CSV -> (series_id, ts, value) table."""
    t = pacsv.read_csv(path)
    cols = {c.lower(): c for c in t.column_names}
    ts = t.column(cols["timestamp"])
    if pa.types.is_timestamp(ts.type):
        epoch = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        unit = ts.type.unit
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        epoch = epoch // div
    else:
        # string timestamps: let arrow parse
        parsed = ts.cast(pa.timestamp("s"))
        epoch = parsed.cast(pa.int64()).to_numpy(zero_copy_only=False)
    values = t.column(cols["value"]).cast(pa.float64())
    sid = series_id or path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    n = t.num_rows
    return pa.table(
        {
            "series_id": pa.array([sid] * n, type=pa.string()),
            "ts": pa.array(epoch.astype(np.int64)),
            "value": values,
        }
    )


def read_series_csvs(paths: list[str]):
    """Ray Dataset over many series CSVs (one series per file)."""
    import ray.data as rd

    tables = [load_series_csv(p) for p in paths]
    return rd.from_arrow(pa.concat_tables(tables))
