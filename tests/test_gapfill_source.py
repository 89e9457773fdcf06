"""Gap-fill + source_rollup stage tests over a local Ray session."""

import numpy as np
import pandas as pd
import pytest

from anofox_forecast_ray.config import SMALL_TIERS
from anofox_forecast_ray.corpus import generate_corpus
from anofox_forecast_ray.stages.gapfill import gapfill_dataset
from anofox_forecast_ray.stages.rollup import (
    make_filtered_rollup_fn,
    make_tier_rollup_fn,
)
from anofox_forecast_ray.stages.source_rollup import (
    source_doc_stats,
    source_window_rollup,
)


def _corpus():
    return generate_corpus(40, seed=3, mean_len=150, sigma=1.0, n_heavy=1,
                           heavy_factor=30)


def test_filtered_rollup_drops_empty_windows():
    corpus = _corpus()
    fn = make_filtered_rollup_fn(SMALL_TIERS, lambda v: v % 7 == 0)
    df = fn(corpus).to_pandas()
    assert (df["cnt"] > 0).all()
    # oracle for one doc, tier w8
    toks = np.asarray(corpus.column("tokens")[0].as_py())
    doc = corpus.column("doc_id")[0].as_py()
    sub = df[(df.doc_id == doc) & (df.tier == "w8")].set_index("window_id")
    for k in range((len(toks) + 7) // 8):
        seg = toks[k * 8 : (k + 1) * 8]
        qual = seg[seg % 7 == 0]
        if len(qual) == 0:
            assert k not in sub.index
        else:
            assert sub.loc[k, "cnt"] == len(qual)
            assert sub.loc[k, "sum"] == int(qual.astype(np.int64).sum())
            assert sub.loc[k, "min"] == int(qual.min())
            assert sub.loc[k, "max"] == int(qual.max())


@pytest.mark.usefixtures("ray_session")
def test_gapfill_dataset_densifies():
    import ray.data as rd

    corpus = _corpus()
    sparse = make_filtered_rollup_fn(SMALL_TIERS[:1], lambda v: v % 13 == 0)(corpus)
    ds = rd.from_arrow(sparse)
    out = gapfill_dataset(ds, keys=("doc_id", "tier"), method="locf").to_pandas()
    # grid is dense 0..max per (doc, tier)
    for (doc, tier), g in out.groupby(["doc_id", "tier"]):
        wid = np.sort(g["window_id"].to_numpy())
        assert wid.tolist() == list(range(wid.max() + 1))
        g = g.sort_values("window_id")
        m = g["mean"].to_numpy()
        f = g["filled"].to_numpy()
        # after locf, NaNs only allowed on a leading filled prefix
        nan_idx = np.flatnonzero(np.isnan(m))
        assert all(f[i] for i in nan_idx)
        if nan_idx.size:
            assert nan_idx.max() < np.flatnonzero(~np.isnan(m)).min()


@pytest.mark.usefixtures("ray_session")
def test_source_rollup_matches_pandas():
    import ray.data as rd

    corpus = _corpus()
    rollup = make_tier_rollup_fn(SMALL_TIERS)(corpus)
    ds = rd.from_arrow(rollup)
    got = (
        source_window_rollup(ds)
        .to_pandas()
        .sort_values(["source", "tier", "window_id"])
        .reset_index(drop=True)
    )
    df = rollup.to_pandas()
    want = (
        df.groupby(["source", "tier", "window_id"], as_index=False)
        .agg(cnt=("cnt", "sum"), sum=("sum", "sum"), min=("min", "min"),
             max=("max", "max"))
        .sort_values(["source", "tier", "window_id"])
        .reset_index(drop=True)
    )
    want["mean"] = want["sum"].astype(np.float64) / want["cnt"]
    for c in ["cnt", "sum", "min", "max"]:
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    assert got["mean"].tolist() == want["mean"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_source_doc_stats():
    import ray.data as rd

    corpus = _corpus()
    got = source_doc_stats(rd.from_arrow(corpus)).to_pandas().set_index("source")
    df = corpus.to_pandas()
    want = df.groupby("source")["n_tok"].agg(["count", "sum", "min", "max", "mean"])
    for s, row in want.iterrows():
        assert got.loc[s, "cnt_docs"] == row["count"]
        assert got.loc[s, "sum_n_tok"] == row["sum"]
        assert got.loc[s, "min_n_tok"] == row["min"]
        assert got.loc[s, "max_n_tok"] == row["max"]
        assert got.loc[s, "mean_n_tok"] == pytest.approx(row["mean"], rel=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_salted_groupby_matches_plain():
    """Salted two-phase aggregate == plain aggregate on a skewed key set
    (one key holds 90% of rows)."""
    import pyarrow as pa
    import ray.data as rd

    from anofox_forecast_ray.stages.salted import salted_groupby_aggregate

    rng = np.random.default_rng(17)
    n = 20000
    keys = np.array([
        "hot" if r < 0.9 else f"cold-{i % 7}"
        for i, r in enumerate(rng.random(n))
    ])
    vals = rng.integers(0, 1000, n)
    t = pa.table({"k": pa.array(keys.tolist()), "v": pa.array(vals)})
    got = (
        salted_groupby_aggregate(rd.from_arrow(t), "k", "v", salt_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    want = (
        df.groupby("k", as_index=False)
        .agg(cnt=("v", "size"), sum=("v", "sum"), min=("v", "min"),
             max=("v", "max"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["cnt"].tolist() == want["cnt"].tolist()
    assert got["sum"].tolist() == want["sum"].tolist()
    assert got["min"].tolist() == want["min"].tolist()
    assert got["max"].tolist() == want["max"].tolist()
    np.testing.assert_allclose(
        got["mean"], want["sum"] / want["cnt"], rtol=0, atol=0
    )


@pytest.mark.usefixtures("ray_session")
def test_corpus_validation_guards():
    import pyarrow as pa
    import ray.data as rd

    from anofox_forecast_ray.stages.validate import (
        corpus_violations,
        duplicate_doc_ids,
    )

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "a", "c"]),
            "tokens": pa.array(
                [[1, 2], [3], [4, 5, 6], [7]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([2, 99, 3, 1], type=pa.int32()),
            "source": pa.array(["s"] * 4),
        }
    )
    ds = rd.from_arrow(t)
    dups = duplicate_doc_ids(ds).to_pandas()
    assert dups["doc_id"].tolist() == ["a"] and dups["dup_count"].tolist() == [2]
    bad = corpus_violations(ds).to_pandas()
    assert bad["doc_id"].tolist() == ["b"]
    assert bad["expected"].tolist() == [99] and bad["actual"].tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_streaming_rollup_matches_batch():
    """Incremental actor-based source rollup == batch tree-reduce result
    after ingesting the full log (and is queryable mid-stream)."""
    import pyarrow as pa
    import ray.data as rd

    from anofox_forecast_ray.stages.source_rollup import source_window_rollup
    from anofox_forecast_ray.stages.streaming import StreamingSourceRollup

    corpus = _corpus()
    rollup = make_tier_rollup_fn(SMALL_TIERS)(corpus)
    stream = StreamingSourceRollup(n_buckets=3)
    try:
        # feed the log in 5 ordered chunks
        step = max(1, rollup.num_rows // 5)
        seen = 0
        for off in range(0, rollup.num_rows, step):
            stream.ingest(rollup.slice(off, step))
            seen += min(step, rollup.num_rows - off)
            snap = stream.snapshot()  # mid-stream query works
            assert snap.num_rows > 0
        got = (
            stream.snapshot().to_pandas()
            .sort_values(["source", "tier", "window_id"]).reset_index(drop=True)
        )
    finally:
        stream.shutdown()
    want = (
        source_window_rollup(rd.from_arrow(rollup)).to_pandas()
        .sort_values(["source", "tier", "window_id"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("cnt", "sum", "min", "max"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    assert got["mean"].tolist() == want["mean"].tolist()
