"""Property-based tests for the late-round-2 kernels: BPE greedy merge
vs a sequential scan, float order-key total order, and compaction
composition — pure NumPy, no Ray."""

import numpy as np
from hypothesis import given, settings, strategies as st

from anofox_forecast_ray.extras.bpe import merge_pair_flat
from anofox_forecast_ray.stages.quantile import (
    float_order_keys,
    keys_to_float,
)

ragged = st.lists(
    st.lists(st.integers(min_value=0, max_value=3), min_size=0,
             max_size=30),
    min_size=1, max_size=8,
)


def _seq_merge(doc, a, b, new_id):
    out, j = [], 0
    while j < len(doc):
        if j + 1 < len(doc) and doc[j] == a and doc[j + 1] == b:
            out.append(new_id)
            j += 2
        else:
            out.append(doc[j])
            j += 1
    return out


@settings(max_examples=200, deadline=None)
@given(ragged, st.integers(0, 3), st.integers(0, 3))
def test_merge_pair_flat_equals_sequential_scan(docs, a, b):
    flat = np.array([t for d in docs for t in d], dtype=np.int32)
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    nv, nl = merge_pair_flat(flat, lengths, a, b, 99)
    want = [_seq_merge(d, a, b, 99) for d in docs]
    assert nl.tolist() == [len(w) for w in want]
    assert nv.tolist() == [t for w in want for t in w]


floats64 = st.floats(allow_nan=False, allow_infinity=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(floats64, min_size=1, max_size=60))
def test_float_order_keys_total_order(xs):
    x = np.array(xs, dtype=np.float64)
    k = float_order_keys(x)
    # involution
    assert np.array_equal(keys_to_float(k), x)
    # order preserved (modulo -0.0 == 0.0 ties)
    xs_sorted = x[np.argsort(k, kind="stable")]
    assert (np.diff(xs_sorted) >= 0).all()
    # key comparison == float comparison for strict inequalities
    for i in range(min(len(xs), 10) - 1):
        if x[i] < x[i + 1]:
            assert k[i] < k[i + 1]
        elif x[i] > x[i + 1]:
            assert k[i] > k[i + 1]
