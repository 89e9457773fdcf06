"""Rollup kernel + stage correctness vs the sequential NumPy oracle.

Reference semantics: tumbling continuous aggregates composed from
src/transform/window.rs + src/features/basic.rs (see SURVEY.md §2.3);
bitwise equality contract per FIXTURES.md §2.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anofox_forecast_ray.config import EngineConfig, SMALL_TIERS, TierSpec
from anofox_forecast_ray.corpus import generate_corpus, tokens_from_text_batch
from anofox_forecast_ray.kernels.rollup import (
    compact_partials,
    rollup_flat,
    window_segments,
)
from anofox_forecast_ray.stages.rollup import (
    ExplodeChunks,
    make_tier_rollup_fn,
    rollup_dataset,
)

from .oracle import oracle_rollup, sort_rollup


def test_window_segments_basic():
    row_idx, win, start, seglen = window_segments(np.array([5, 0, 3]), 2)
    assert row_idx.tolist() == [0, 0, 0, 2, 2]
    assert win.tolist() == [0, 1, 2, 0, 1]
    assert start.tolist() == [0, 2, 4, 5, 7]
    assert seglen.tolist() == [2, 2, 1, 2, 1]


def test_rollup_flat_matches_manual():
    values = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)
    r = rollup_flat(values, np.array([5, 3]), 2)
    assert r["cnt"].tolist() == [2, 2, 1, 2, 1]
    assert r["sum"].tolist() == [4, 5, 5, 11, 6]
    assert r["min"].tolist() == [1, 1, 5, 2, 6]
    assert r["max"].tolist() == [3, 4, 5, 9, 6]


def test_compact_partials_matches_direct():
    rng = np.random.default_rng(0)
    values = rng.integers(0, 1000, 1000, dtype=np.int32)
    lengths = np.array([137, 263, 0, 600])
    fine = rollup_flat(values, lengths, 8)
    # per-series fine-window counts
    n_fine = np.bincount(fine["row_idx"], minlength=4)
    ridx, coarse_id, cnt, s, mn, mx = compact_partials(
        fine["window_id"], fine["cnt"], fine["sum"], fine["min"], fine["max"],
        n_fine, 4,
    )
    direct = rollup_flat(values, lengths, 32)
    assert coarse_id.tolist() == direct["window_id"].tolist()
    assert cnt.tolist() == direct["cnt"].tolist()
    assert s.tolist() == direct["sum"].tolist()
    assert mn.tolist() == direct["min"].tolist()
    assert mx.tolist() == direct["max"].tolist()


def _corpus_table():
    return generate_corpus(
        60, seed=7, mean_len=200, sigma=1.2, n_heavy=2, heavy_factor=50
    )


def test_batch_rollup_vs_oracle():
    corpus = _corpus_table()
    tiers = SMALL_TIERS
    fn = make_tier_rollup_fn(tiers)
    got = sort_rollup(fn(corpus).to_pandas())
    want = sort_rollup(oracle_rollup(corpus, tiers))
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_exact=True
    )


def test_chunked_rollup_bitwise_equals_unchunked():
    corpus = _corpus_table()
    tiers = SMALL_TIERS
    stride = tiers[-1].width * 2  # 256: forces many chunks on heavy docs
    chunked = ExplodeChunks(stride)(corpus)
    assert chunked.num_rows > corpus.num_rows
    fn = make_tier_rollup_fn(tiers)
    got = sort_rollup(fn(chunked).to_pandas())
    want = sort_rollup(fn(corpus).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want, check_exact=True)


def test_tokens_roundtrip_passthrough():
    """Per-row invariant (BASELINE.json): token arrays survive exactly."""
    corpus = _corpus_table()
    stride = 128
    chunked = ExplodeChunks(stride)(corpus)
    df = chunked.to_pandas()
    rebuilt = (
        df.sort_values(["doc_id", "pos0"])
        .groupby("doc_id")["tokens"]
        .apply(lambda ls: np.concatenate([np.asarray(x) for x in ls]))
    )
    orig = corpus.to_pandas().set_index("doc_id")["tokens"]
    for doc_id, toks in orig.items():
        assert np.array_equal(rebuilt[doc_id], np.asarray(toks)), doc_id


def test_tokens_from_text_batch():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["abc", "Ω x"]),
            "source": pa.array(["s1", "s2"]),
        }
    )
    out = tokens_from_text_batch(t)
    assert out.column("doc_id").to_pylist() == ["1", "2"]
    assert out.column("tokens").to_pylist() == [
        [97, 98, 99],
        [0x3A9, 32, 120],
    ]
    assert out.column("n_tok").to_pylist() == [3, 3]


@pytest.mark.usefixtures("ray_session")
def test_rollup_dataset_e2e_vs_oracle():
    import ray.data as rd

    corpus = _corpus_table()
    cfg = EngineConfig(tiers=SMALL_TIERS, chunk_stride_windows=2)
    ds = rd.from_arrow(corpus)
    out = rollup_dataset(ds, cfg)
    got = out.to_pandas()
    # flagship rollup dict-encodes string keys for the write path
    for c in ("doc_id", "source", "tier"):
        got[c] = got[c].astype(str)
    got = sort_rollup(got)
    want = sort_rollup(oracle_rollup(corpus, SMALL_TIERS))
    pd.testing.assert_frame_equal(got[want.columns], want, check_exact=True)


def test_tokens_from_text_astral_plane():
    """Codepoints beyond the BMP (surrogate-pair territory in UTF-16)
    must tokenize as single codepoints (UTF-32 path)."""
    t = pa.table(
        {
            "doc_id": pa.array([7], type=pa.int64()),
            "text": pa.array(["a\U0001F600b"]),  # emoji U+1F600
            "source": pa.array(["s"]),
        }
    )
    out = tokens_from_text_batch(t)
    assert out.column("tokens").to_pylist() == [[97, 0x1F600, 98]]
    assert out.column("n_tok").to_pylist() == [3]


def test_default_production_tiers_vs_oracle():
    """DEFAULT_TIERS (1m/1h/1d = 60/3600/86400) on long series incl. a
    doc spanning multiple 1d windows."""
    from anofox_forecast_ray.config import DEFAULT_TIERS

    corpus = generate_corpus(
        8, seed=13, mean_len=30000, sigma=0.6, n_heavy=1, heavy_factor=8
    )
    fn = make_tier_rollup_fn(DEFAULT_TIERS)
    got = sort_rollup(fn(corpus).to_pandas())
    want = sort_rollup(oracle_rollup(corpus, DEFAULT_TIERS))
    pd.testing.assert_frame_equal(got[want.columns], want, check_exact=True)
    # the heavy doc must span >1 one-day window
    assert (got[got.tier == "1d"].groupby("doc_id").size() > 1).any()


@pytest.mark.usefixtures("ray_session")
def test_monster_doc_skew_end_to_end():
    """A single doc 100x larger than the rest of the corpus combined must
    flow through chunking + rollup with bitwise-correct windows."""
    import ray.data as rd

    rng = np.random.default_rng(99)
    normal = generate_corpus(50, seed=99, mean_len=100, sigma=0.5, n_heavy=0)
    monster_tokens = rng.integers(0, 50257, 1_000_000, dtype=np.int32)
    monster = pa.table(
        {
            "doc_id": pa.array(["monster-0"]),
            "tokens": pa.array(
                [monster_tokens.tolist()], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([1_000_000], type=pa.int32()),
            "source": pa.array(["web"]),
        }
    )
    corpus = pa.concat_tables([normal, monster])
    cfg = EngineConfig(tiers=SMALL_TIERS, chunk_stride_windows=4,
                       batch_size=16)
    out = rollup_dataset(rd.from_arrow(corpus), cfg).to_pandas()
    out["tier"] = out["tier"].astype(str)
    out["doc_id"] = out["doc_id"].astype(str)
    m = out[(out.doc_id == "monster-0") & (out.tier == "w128")]
    assert len(m) == (1_000_000 + 127) // 128
    assert int(m["cnt"].sum()) == 1_000_000
    k = 4321
    seg = monster_tokens[k * 128 : (k + 1) * 128].astype(np.int64)
    row = m[m.window_id == k]
    assert int(row["sum"].iloc[0]) == int(seg.sum())
    assert int(row["min"].iloc[0]) == int(seg.min())


def test_rollup_flat_tiers_bitwise_equals_per_tier():
    """Cascaded tier composition (finest from raw, coarser from partials)
    is bitwise-identical to computing every tier from raw — the int
    (cnt,sum,min,max) semigroup plus tier nesting. Includes the raw tier
    (width 1), ragged tails, empty rows, and a non-nesting width set
    that must fall back to the raw path."""
    from anofox_forecast_ray.kernels.rollup import (rollup_flat,
                                                    rollup_flat_tiers)

    rng = np.random.default_rng(7)
    for trial in range(50):
        n_rows = int(rng.integers(0, 20))
        lengths = rng.integers(0, 300, n_rows)
        values = rng.integers(
            -(2**31), 2**31, int(lengths.sum()), dtype=np.int64
        ).astype(np.int32)
        widths = [[8, 32, 128], [1, 8, 32, 128], [7, 13, 28]][trial % 3]
        res = rollup_flat_tiers(values, lengths, widths)
        for w in widths:
            ref = rollup_flat(values, lengths, w)
            got = res[w]
            for k in ("row_idx", "window_id", "cnt", "sum", "min", "max"):
                assert got[k].dtype == ref[k].dtype
                assert np.array_equal(got[k], ref[k]), (trial, w, k)
