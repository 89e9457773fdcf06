"""Driver-style correctness harness: run every queries() entry and compare
to its oracle_sql() via DuckDB (row count + sorted-column value hash).

Usage: PYTHONPATH=/root/repo python tools/check_queries.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

try:
    from golden_oracles import GOLDEN_CHECKS
except ImportError:  # run as a module from elsewhere
    from tools.golden_oracles import GOLDEN_CHECKS


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    except TypeError:
        df = df.sort_values(
            [c for c in sort_cols if df[c].dtype != object]
        ).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype == np.float64:
            h.update(col.to_numpy().tobytes())
        elif col.dtype == object:
            h.update("\x1f".join("" if v is None else str(v) for v in col).encode())
        else:
            h.update(col.to_numpy().tobytes())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    unknown = only - set(qs)
    if unknown:
        print(f"UNKNOWN query names (not in queries()): {sorted(unknown)}")
        sys.exit(2)

    failures = []
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(q(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            if name in GOLDEN_CHECKS:
                t1 = time.time()
                try:
                    ok, detail = GOLDEN_CHECKS[name](sf_dir, got, con)
                except Exception as e:
                    ok, detail = False, f"golden raised {type(e).__name__}: {e}"
                status = "GOLDEN-OK" if ok else "FAIL"
                if not ok:
                    failures.append(name)
                print(f"{status}  {name}: {len(got)} rows, {detail} "
                      f"({dt:.1f}s + {time.time() - t1:.1f}s golden)")
            else:
                print(f"rows-only  {name}: {len(got)} rows, {dt:.1f}s")
            continue
        try:
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        gh, wh = value_hash(got), value_hash(want)
        status = "OK" if (ok_rows and ok_schema and gh == wh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(got)}/{len(want)} "
            f"schema_eq={ok_schema} hash {gh}/{wh} ({dt:.1f}s)"
        )
        if status == "FAIL" and ok_rows and ok_schema:
            # first differing column for debugging
            for c in got.columns:
                a, b = got[c], want[c]
                if a.dtype == np.float64:
                    neq = ~(
                        (a.to_numpy() == b.to_numpy())
                        | (np.isnan(a.to_numpy()) & np.isnan(b.to_numpy()))
                    )
                else:
                    neq = a.astype(str).to_numpy() != b.astype(str).to_numpy()
                if neq.any():
                    i = int(np.flatnonzero(neq)[0])
                    print(f"   first diff col={c} row={i}: "
                          f"engine={a.iloc[i]!r} oracle={b.iloc[i]!r}")
                    break
        elif status == "FAIL":
            print(f"   engine cols {list(got.columns)}")
            print(f"   oracle cols {list(want.columns)}")

    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries consistent")


if __name__ == "__main__":
    main()
