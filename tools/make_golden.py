"""Generate golden-verified parquet snapshots for the non-SQL queries.

For each target query and scale factor:
  1. run the engine query,
  2. verify it against its INDEPENDENT sequential golden check
     (tools/golden_oracles.py) — generation aborts on any failure,
  3. stamp the verified rows with ``golden_corpus_key`` (the total
     character count of the documents corpus, which disambiguates scale
     factors — the doc COUNT is 500 at both sf0.001 and sf0.01) and write
     all stamped row-sets to tests/golden/snapshots/<name>.parquet.

The committed snapshot then serves as the driver-visible oracle via
pipelines/golden_snapshots.py.  Re-run this tool whenever a snapshotted
kernel's semantics legitimately change.

Usage:
  PYTHONPATH=/root/repo python tools/make_golden.py [name ...]
  (default: every name in SNAPSHOT_QUERIES; sf dirs sf0.001 + sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def result_to_table(res) -> pa.Table:
    import pandas as pd
    import ray

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    tbls = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows > 0]
    if not tbls:
        raise ValueError("query returned zero rows")
    return pa.concat_tables(tbls)


def main():
    import ray

    from anofox_forecast_ray.pipelines.golden_snapshots import (
        SNAPSHOT_DIR,
        SNAPSHOT_QUERIES,
        snapshot_path,
    )
    from tools.golden_oracles import GOLDEN_CHECKS

    names = sys.argv[1:] or [
        n for n in SNAPSHOT_QUERIES
    ]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from anofox_forecast_ray.pipelines.queries import build_queries

    queries, _ = build_queries()
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)

    failed = []
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in queries()")
            failed.append(name)
            continue
        if name not in GOLDEN_CHECKS:
            print(f"SKIP {name}: no independent golden check — refusing to "
                  f"snapshot an unverified result")
            failed.append(name)
            continue
        parts = []
        ok_all = True
        for sf_dir in SF_DIRS:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            try:
                tbl = result_to_table(queries[name](sf_dir))
                ok, detail = GOLDEN_CHECKS[name](
                    sf_dir, tbl.to_pandas(), con
                )
            except Exception as e:
                ok, detail = False, f"raised {type(e).__name__}: {e}"
                tbl = None
            if not ok:
                print(f"FAIL {name} @ {sf_dir}: {detail}")
                ok_all = False
                break
            key = con.execute(
                "SELECT CAST(sum(length(text)) AS BIGINT) FROM documents"
            ).fetchone()[0]
            stamped = tbl.append_column(
                "golden_corpus_key",
                pa.array([int(key)] * tbl.num_rows, type=pa.int64()),
            )
            parts.append(stamped)
            print(f"  ok {name} @ {os.path.basename(sf_dir)}: "
                  f"{tbl.num_rows} rows golden-verified ({detail})")
            con.close()
        if not ok_all:
            failed.append(name)
            continue
        out = pa.concat_tables(parts)
        pq.write_table(out, snapshot_path(name))
        print(f"WROTE {snapshot_path(name)} ({out.num_rows} rows)")

    ray.shutdown()
    if failed:
        print(f"\nFAILED: {failed}")
        sys.exit(1)
    print("\nall snapshots golden-verified and written")


if __name__ == "__main__":
    main()
