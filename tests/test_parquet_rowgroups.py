"""Row-group-parallel parquet reader: row equivalence with read_parquet,
column pruning, and the directory fallback."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anofox_forecast_ray.sources.parquet_rowgroups import (
    read_parquet_rowgroups,
    rowgroup_manifest,
)


@pytest.fixture(scope="module")
def single_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rg") / "one.parquet")
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:05d}" for i in range(3000)]),
            "n_tok": pa.array(rng.integers(1, 100, 3000), type=pa.int32()),
            "source": pa.array([f"s{i % 7}" for i in range(3000)]),
        }
    )
    pq.write_table(t, p, row_group_size=100)  # 30 row groups
    return p


def test_manifest_covers_all_rowgroups(single_file):
    units = rowgroup_manifest([single_file], target_units=8)
    assert len(units) >= 8
    covered = []
    for u in units:
        assert u["rg_lo"] < u["rg_hi"]
        covered.extend(range(u["rg_lo"], u["rg_hi"]))
    assert covered == list(range(30))  # contiguous, disjoint, complete


def test_rows_equal_read_parquet(ray_session, single_file):
    got = (
        read_parquet_rowgroups(single_file, target_units=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        pq.read_table(single_file)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert ref.equals(got)


def test_column_pruning(ray_session, single_file):
    ds = read_parquet_rowgroups(
        single_file, columns=["doc_id", "n_tok"], target_units=4
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["doc_id", "n_tok"]
    assert len(df) == 3000


def test_directory_fallback_keeps_hive_columns(ray_session, tmp_path):
    base = tmp_path / "hive"
    for part in ("a", "b"):
        d = base / f"tier={part}"
        os.makedirs(d)
        pq.write_table(
            pa.table({"x": pa.array([1, 2], type=pa.int64())}),
            str(d / "f.parquet"),
        )
    df = read_parquet_rowgroups(str(base), target_units=4).to_pandas()
    assert sorted(df["tier"].astype(str).unique()) == ["a", "b"]
    assert len(df) == 4
