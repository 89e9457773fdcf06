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


def test_multifile_ragged_rowgroups(ray_session, tmp_path):
    """Multiple files with UNEQUAL row-group sizes: the manifest must
    cover every row exactly once and the read must equal read_parquet
    row-for-row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from anofox_forecast_ray.sources.parquet_rowgroups import (
        read_parquet_rowgroups,
        rowgroup_manifest,
    )

    rng = np.random.default_rng(13)
    files = []
    total = 0
    for i, (n, rg) in enumerate([(10, 3), (1, 1), (57, 10), (24, 24)]):
        t = pa.table(
            {
                "id": pa.array(np.arange(total, total + n),
                               type=pa.int64()),
                "v": pa.array(rng.normal(0, 1, n)),
            }
        )
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(t, p, row_group_size=rg)
        files.append(p)
        total += n
    units = rowgroup_manifest(files, target_units=7)
    # every row group of every file appears exactly once
    seen = {}
    for u in units:
        for g in range(u["rg_lo"], u["rg_hi"]):
            key = (u["path"], g)
            assert key not in seen, f"duplicate unit {key}"
            seen[key] = True
    for f in files:
        with pq.ParquetFile(f) as pf:
            for g in range(pf.metadata.num_row_groups):
                assert (f, g) in seen, f"missing ({f}, {g})"

    got = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     read_parquet_rowgroups(files).to_arrow_refs())
         if t.num_columns > 0]
    ).sort_by("id")
    ref = pa.concat_tables(
        [ray.get(r) for r in rd.read_parquet(files).to_arrow_refs()]
    ).sort_by("id")
    assert got.equals(ref)
    assert got.num_rows == total
