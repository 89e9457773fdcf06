"""The round-4 lockstep MinHashStage (one product+mod per batch with
per-doc segment mins) must be bitwise-identical to the per-doc
reference path (MinHasher.signature + scalar band-hash fold) for any
input — unicode text, sub-shingle docs, empty batches."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from anofox_forecast_ray.extras.dedup import MinHasher, MinHashStage


def _reference_rows(doc_ids, texts, num_perm=64, bands=16, seed=42, k=5):
    """The pre-vectorization per-doc path, reproduced verbatim."""
    hasher = MinHasher(num_perm, seed, k)
    rpb = num_perm // bands
    rows = []
    for doc, text in zip(doc_ids, texts):
        sig = hasher.signature(text or "")
        if sig is None:
            continue
        b2 = sig.reshape(bands, rpb)
        bh = np.zeros(bands, dtype=np.uint64)
        for j in range(rpb):
            bh = bh * np.uint64(1099511628211) + b2[:, j].astype(np.uint64)
        for b in range(bands):
            rows.append((str(doc), b,
                         int(bh[b] & np.uint64(0x7FFFFFFFFFFFFFFF)),
                         sig.tobytes()))
    return rows


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-32-le", blacklist_categories=("Cs",)
            ),
            max_size=40,
        ),
        max_size=12,
    )
)
def test_lockstep_equals_per_doc(texts):
    doc_ids = [str(i) for i in range(len(texts))]
    batch = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = MinHashStage(64, 16, 42, 5)(batch)
    got = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("band_id").to_pylist(),
            out.column("band_hash").to_pylist(),
            out.column("sig").to_pylist(),
        )
    )
    assert got == _reference_rows(doc_ids, texts)
