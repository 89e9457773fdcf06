"""The golden-snapshot oracle bridge (pipelines/golden_snapshots.py):
every declared snapshot query must have its parquet committed and its
oracle attached — a missing file would silently regress the driver gate
back to no_oracle."""

import os

import duckdb
import pyarrow.parquet as pq


def test_every_snapshot_query_has_committed_oracle():
    from anofox_forecast_ray.pipelines.golden_snapshots import (
        SNAPSHOT_QUERIES,
        snapshot_path,
        snapshot_sql,
    )
    from anofox_forecast_ray.pipelines.queries import build_queries

    queries, oracles = build_queries()
    for name in SNAPSHOT_QUERIES:
        assert name in queries, name
        assert os.path.exists(snapshot_path(name)), (
            f"{name}: snapshot parquet missing — run tools/make_golden.py"
        )
        assert oracles.get(name) == snapshot_sql(name), name
    # and globally: zero queries without an oracle
    assert [k for k in queries if k not in oracles] == []


def test_snapshots_cover_both_test_scale_factors():
    """Each snapshot must carry a row-set for sf0.001 AND sf0.01 (the
    corpus-key values of both committed test inputs)."""
    from anofox_forecast_ray.pipelines.golden_snapshots import (
        SNAPSHOT_QUERIES,
        snapshot_path,
    )

    keys = {}
    for sf in ("sf0.001", "sf0.01"):
        k = duckdb.sql(
            f"SELECT CAST(sum(length(text)) AS BIGINT) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        keys[sf] = int(k)
    assert keys["sf0.001"] != keys["sf0.01"]  # the key must discriminate
    for name in SNAPSHOT_QUERIES:
        t = pq.read_table(snapshot_path(name), columns=["golden_corpus_key"])
        present = set(t.column("golden_corpus_key").to_pylist())
        assert set(keys.values()) <= present, (name, present, keys)
