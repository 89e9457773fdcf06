"""Tier compaction: fine->coarse rollup composition must be bitwise
equal to direct coarse rollup, including through the chunked
(ExplodeChunks) path and when chained w8 -> w32 -> w128."""

import numpy as np
import pyarrow as pa

from anofox_forecast_ray.config import TierSpec
from anofox_forecast_ray.stages.rollup import (
    ExplodeChunks,
    make_compact_fn,
    make_tier_rollup_fn,
)


def _corpus_table(seed=5, n=60, max_len=700):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, max_len, n)
    toks = [rng.integers(0, 50000, l).astype(np.int32).tolist()
            for l in lens]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )


def _sorted(df):
    return df.sort_values(["doc_id", "window_id"]).reset_index(drop=True)


def _run(ds):
    return _sorted(ds.to_pandas())


def test_compact_matches_direct_w32(ray_session):
    import ray.data as rd

    t = _corpus_table()
    ds = rd.from_arrow(t)
    direct = _run(
        ds.map_batches(
            make_tier_rollup_fn((TierSpec("w32", 32),)),
            batch_format="pyarrow",
        )
    )
    compacted = _run(
        rd.from_arrow(t)
        .map_batches(
            make_tier_rollup_fn((TierSpec("w8", 8),)),
            batch_format="pyarrow",
        )
        .map_batches(make_compact_fn(4, "w32"), batch_format="pyarrow")
    )
    assert direct.equals(compacted)


def test_compact_chained_and_chunked(ray_session):
    import ray.data as rd

    t = _corpus_table(seed=9, n=30, max_len=3000)  # forces chunk splits
    stride = 128 * 2  # multiple of the coarsest width (128)
    base = rd.from_arrow(t).map_batches(
        ExplodeChunks(stride), batch_format="pyarrow"
    )
    direct = _run(
        base.map_batches(
            make_tier_rollup_fn((TierSpec("w128", 128),)),
            batch_format="pyarrow",
        )
    )
    chained = _run(
        rd.from_arrow(t)
        .map_batches(ExplodeChunks(stride), batch_format="pyarrow")
        .map_batches(
            make_tier_rollup_fn((TierSpec("w8", 8),)),
            batch_format="pyarrow",
        )
        .map_batches(make_compact_fn(4, "w32"), batch_format="pyarrow")
        .map_batches(make_compact_fn(4, "w128"), batch_format="pyarrow")
    )
    assert direct.equals(chained)
    # means are f64 divisions of composed ints -> bitwise
    assert (direct["mean"].to_numpy() == chained["mean"].to_numpy()).all()


def test_compact_empty_batch(ray_session):
    fn = make_compact_fn(4, "w32")
    empty = make_tier_rollup_fn((TierSpec("w8", 8),))(
        _corpus_table().slice(0, 0)
    )
    out = fn(empty)
    assert out.num_rows == 0
    assert "window_id" in out.column_names
