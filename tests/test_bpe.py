"""BPE trainer: greedy-overlap parity, doc-boundary isolation, and
distributed-vs-sequential rule parity on a random corpus."""

import numpy as np
import pyarrow as pa

from anofox_forecast_ray.extras.bpe import (
    NEW_ID_BASE,
    bpe_merges_sequential,
    merge_pair_flat,
    train_bpe,
)


def test_merge_overlapping_run_parity():
    # "aaaa" with pair (a,a): greedy takes offsets 0 and 2
    v = np.array([7, 7, 7, 7], dtype=np.int32)
    nv, nl = merge_pair_flat(v, np.array([4]), 7, 7, 99)
    assert nv.tolist() == [99, 99] and nl.tolist() == [2]
    # "aaaaa": merges at 0, 2; trailing single a survives
    v = np.array([7] * 5, dtype=np.int32)
    nv, nl = merge_pair_flat(v, np.array([5]), 7, 7, 99)
    assert nv.tolist() == [99, 99, 7] and nl.tolist() == [3]


def test_merge_does_not_cross_doc_boundary():
    # doc1 = [1, 2], doc2 = [2, 3]: pair (2, 2) spans the boundary only
    v = np.array([1, 2, 2, 3], dtype=np.int32)
    nv, nl = merge_pair_flat(v, np.array([2, 2]), 2, 2, 99)
    assert nv.tolist() == [1, 2, 2, 3] and nl.tolist() == [2, 2]
    # pair (1, 2) merges in doc1 only
    v2 = np.array([1, 2, 1, 2], dtype=np.int32)
    nv, nl = merge_pair_flat(v2, np.array([2, 2]), 1, 2, 98)
    assert nv.tolist() == [98, 98] and nl.tolist() == [1, 1]


def test_train_bpe_matches_sequential_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    texts = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 4, int(n)))
        for n in rng.integers(0, 60, 40)
    ]
    table = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(texts))]),
            "tokens": pa.array(
                [[ord(ch) for ch in t] for t in texts],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(
                [len(t) for t in texts], type=pa.int32()
            ),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    rules, final = train_bpe(rd.from_arrow(table), k=5)
    want_rules, want_docs = bpe_merges_sequential(texts, k=5)
    assert rules == want_rules
    assert rules[0][2] == NEW_ID_BASE
    assert int(final.sum("n_tok")) == sum(len(d) for d in want_docs)
