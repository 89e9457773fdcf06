"""Wave-12: sequence packing, deterministic sampling, per-source quotas.

The oracle gate covers bitwise parity on the synthetic corpus; these
tests cover the registry plus packing edge cases the corpus never hits
(zero-token docs, docs spanning many sequences, bucket boundaries) using
a tiny in-session Ray dataset."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def test_wave12_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave12 import (
        build_wave12_queries,
    )

    q, o = build_wave12_queries()
    assert set(q) == {"doc_pack_sequences", "doc_hash_sample",
                      "source_quota_sample", "events_asof_purchase",
                      "events_range_purchase_count",
                      "doc_m4_downsample_w32", "events_value_delta",
                      "source_distinct_tokens_hll",
                      "source_distinct_tokens_exact"}
    assert set(o) == set(q)  # every wave-12 query is SQL-oracled


def _pack(docs, **kw):
    import ray.data as rd

    from anofox_forecast_ray.extras.packing import pack_sequences

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(
                    [docs[d] for d in docs], type=pa.string()
                ),
            }
        )
    )
    out = pack_sequences(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_pack_sequences_edges(ray_session):
    # doc 0: 3 tokens; doc 1: empty; doc 2: 10 tokens spanning seqs;
    # doc 70: second bucket (bucket_size=64) exercises the offset scan
    docs = {0: "a b c", 1: "", 2: " ".join("t" * 10 for _ in range(10)),
            70: "x y"}
    out = _pack(docs, seq_len=4, bucket_size=64)

    assert list(out["doc_id"]) == [0, 1, 2, 70]
    assert list(out["n_tok"]) == [3, 0, 10, 2]
    # global concatenation order: starts are the exclusive prefix sum
    assert list(out["tok_start"]) == [0, 3, 3, 13]
    # doc 0 occupies tokens [0,3) -> seq 0 only
    assert out.loc[0, ["seq_first", "seq_last", "n_seqs"]].tolist() == \
        [0, 0, 1]
    # empty doc: zero sequences, anchored at its start position
    assert out.loc[1, ["seq_first", "seq_last", "n_seqs"]].tolist() == \
        [0, 0, 0]
    # doc 2 occupies [3,13) -> seqs 0..3 with seq_len=4
    assert out.loc[2, ["seq_first", "seq_last", "n_seqs",
                       "seq_offset"]].tolist() == [0, 3, 4, 3]
    # doc 70 (new bucket) continues the global stream: [13,15) -> seq 3
    assert out.loc[3, ["seq_first", "seq_last", "n_seqs",
                       "seq_offset"]].tolist() == [3, 3, 1, 1]


def test_pack_bucket_invariance(ray_session):
    """The global assignment must not depend on bucket_size."""
    rng = np.random.default_rng(7)
    docs = {int(i): " ".join(["w"] * int(rng.integers(0, 9)))
            for i in rng.choice(500, size=40, replace=False)}
    a = _pack(docs, seq_len=8, bucket_size=4)
    b = _pack(docs, seq_len=8, bucket_size=1000)
    for col in ["tok_start", "seq_first", "seq_last", "n_seqs",
                "seq_offset"]:
        assert list(a[col]) == list(b[col]), col


def test_hash_sample_deterministic(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.packing import hash_sample

    t = pa.table({"doc_id": pa.array(range(200), type=pa.int64())})
    kept = hash_sample(rd.from_arrow(t), keep_hex="80").to_pandas()
    expect = [i for i in range(200)
              if hashlib.sha256(str(i).encode()).hexdigest()[:2] < "80"]
    assert sorted(kept["doc_id"]) == expect
    # ~50% keep rate at the 0x80 threshold
    assert 0.35 < len(expect) / 200 < 0.65


def _mk_right():
    return pa.table(
        {
            "user_id": pa.array([1, 1, 2], type=pa.int64()),
            "ts": pa.array([100, 300, 50], type=pa.timestamp("us")),
            "pid": pa.array([10, 11, 20], type=pa.int64()),
            "pval": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
        }
    )


def test_asof_strict_before_semantics(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import asof_join_broadcast

    left = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
            # ts==100 must NOT match the ts==100 right row (strict >)
            "ts": pa.array([99, 100, 301, 60, 10],
                           type=pa.timestamp("us")),
        }
    )
    out = (
        asof_join_broadcast(
            rd.from_arrow(left), _mk_right(), key="user_id", ts="ts",
            payload={"pid": -1, "pval": -1.0}, gap_col="gap_us",
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # event 0: before any purchase -> sentinel; event 1: ts==100 strict
    assert list(out["pid"]) == [-1, -1, 11, 20, -1]
    assert list(out["gap_us"]) == [-1, -1, 1, 10, -1]
    assert list(out["pval"]) == [-1.0, -1.0, 2.5, 3.5, -1.0]


def test_range_count_boundaries(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import range_count_broadcast

    left = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 9], type=pa.int64()),
            # window [ts-100, ts): ts=200 -> right ts 100 included
            # (>= 100 bound); ts=300 -> [200,300) catches nothing (300
            # fails the strict < ts end); ts=400 -> 300 included
            "ts": pa.array([200, 300, 400, 100], type=pa.timestamp("us")),
        }
    )
    out = (
        range_count_broadcast(
            rd.from_arrow(left), _mk_right(), key="user_id", ts="ts",
            window_us=100, out_col="n",
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert list(out["n"]) == [1, 0, 1, 0]


def test_m4_flat_ties_and_short_windows():
    from anofox_forecast_ray.kernels.rollup import m4_flat

    # row 0: [5, 3, 3, 9, 9, 1], width 4 -> windows [5,3,3,9], [9,1]
    # min tie at value 3 (pos 1,2) -> first occurrence pos 1
    # max 9 unique in w0 at pos 3; w1: min 1 pos 1, max 9 pos 0
    vals = np.array([5, 3, 3, 9, 9, 1], dtype=np.int32)
    r = m4_flat(vals, np.array([6]), 4)
    assert list(r["window_id"]) == [0, 1]
    assert list(r["first_val"]) == [5, 9]
    assert list(r["last_val"]) == [9, 1]
    assert list(r["min_val"]) == [3, 1]
    assert list(r["min_pos"]) == [1, 1]
    assert list(r["max_val"]) == [9, 9]
    assert list(r["max_pos"]) == [3, 0]

    # max tie: [7, 7] -> first occurrence pos 0
    r2 = m4_flat(np.array([7, 7], dtype=np.int32), np.array([2]), 4)
    assert list(r2["max_pos"]) == [0]
    assert list(r2["min_pos"]) == [0]

    # empty input
    r3 = m4_flat(np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int64), 4)
    assert r3["row_idx"].size == 0


def test_hll_accuracy_and_merge():
    from anofox_forecast_ray.extras.sketches import (
        M, HLLPartialStage, hll_estimate,
    )

    # 5000 distinct tokens in one doc: estimate within HLL's ~1.04/sqrt(m)
    # error band (m=256 -> ~6.5%; allow 3 sigma)
    toks = [f"tok{i}" for i in range(5000)]
    batch = pa.table({"source": ["s"], "text": [" ".join(toks)]})
    rows = HLLPartialStage()(batch)
    dense = np.zeros(M, dtype=np.int64)
    dense[rows.column("register").to_numpy()] = rows.column(
        "rank").to_numpy()
    est, zeros = hll_estimate(dense)
    assert abs(est - 5000) / 5000 < 0.20

    # merge = elementwise max: two half-batches combine to the full sketch
    b1 = pa.table({"source": ["s"], "text": [" ".join(toks[:2500])]})
    b2 = pa.table({"source": ["s"], "text": [" ".join(toks[2500:])]})
    merged = np.zeros(M, dtype=np.int64)
    for b in (b1, b2):
        r = HLLPartialStage()(b)
        np.maximum.at(merged, r.column("register").to_numpy(),
                      r.column("rank").to_numpy())
    assert (merged == dense).all()


def test_hll_linear_counting_small_range():
    from anofox_forecast_ray.extras.sketches import (
        M, HLLPartialStage, hll_estimate,
    )

    batch = pa.table({"source": ["s"], "text": ["a b c d e"]})
    rows = HLLPartialStage()(batch)
    dense = np.zeros(M, dtype=np.int64)
    dense[rows.column("register").to_numpy()] = rows.column(
        "rank").to_numpy()
    est, zeros = hll_estimate(dense)
    assert zeros >= M - 5
    assert abs(est - 5) < 1.0   # linear counting is near-exact here


def test_pack_property_vs_numpy_reference(ray_session):
    """Property (post one-shuffle rewrite): for random docs — including
    empty docs, single-token docs, and ids straddling many buckets — the
    distributed pack equals a direct numpy prefix-sum reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 2000),
            st.integers(0, 40),  # token count per doc
            min_size=1, max_size=60,
        ),
        st.sampled_from([4, 8, 512]),
        st.sampled_from([1, 64, 10**6]),
    )
    def check(lengths, seq_len, bucket_size):
        docs = {d: " ".join(["w"] * n) for d, n in lengths.items()}
        out = _pack(docs, seq_len=seq_len, bucket_size=bucket_size)
        ids = sorted(lengths)
        n = np.array([lengths[d] for d in ids], dtype=np.int64)
        start = np.concatenate(([0], np.cumsum(n)[:-1]))
        last = start + np.maximum(n, 1) - 1
        sf, sl = start // seq_len, last // seq_len
        assert list(out["doc_id"]) == ids
        assert list(out["n_tok"]) == n.tolist()
        assert list(out["tok_start"]) == start.tolist()
        assert list(out["seq_first"]) == sf.tolist()
        assert list(out["seq_last"]) == sl.tolist()
        assert list(out["n_seqs"]) == np.where(n > 0, sl - sf + 1,
                                               0).tolist()
        assert list(out["seq_offset"]) == (start % seq_len).tolist()

    check()
