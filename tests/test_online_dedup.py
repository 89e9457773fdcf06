"""Online LSH dedup: the one-doc-at-a-time index must make exactly the
same keep/dup decisions as the batch-shaped distributed formulation."""

import numpy as np
import pyarrow as pa
import pytest

from anofox_forecast_ray.extras.dedup import (
    MinHasher,
    OnlineLSHIndex,
    minhash_online_dedup,
)


def _corpus(n=60, seed=5):
    """Synthetic docs with planted near-duplicates: every 7th doc is a
    lightly-edited copy of an earlier one."""
    rng = np.random.default_rng(seed)
    alpha = "abcdefghij "
    docs = []
    for i in range(n):
        if i % 7 == 3 and i > 7:
            src = docs[i - 7][1]
            # change a couple of chars
            s = list(src)
            for p in rng.integers(0, len(s), size=2):
                s[p] = alpha[rng.integers(0, len(alpha))]
            docs.append((i, "".join(s)))
        else:
            docs.append(
                (i, "".join(alpha[k] for k in rng.integers(0, len(alpha),
                                                           size=80)))
            )
    return docs


def test_online_equals_batch(ray_session):
    import ray.data as rd

    docs = _corpus()
    table = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
        }
    )
    batch = (
        minhash_online_dedup(rd.from_arrow(table))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    idx = OnlineLSHIndex()
    online = []
    for doc_id, text in docs:  # already ascending
        is_dup, dup_of = idx.offer(doc_id, text)
        if is_dup:
            online.append((doc_id, dup_of))

    assert list(zip(batch.doc_id, batch.dup_of)) == online
    assert len(online) > 0  # the planted dups were actually found


def test_online_dedup_finds_planted_pairs(ray_session):
    idx = OnlineLSHIndex()
    docs = _corpus()
    planted = {i for i in range(len(docs)) if i % 7 == 3 and i > 7}
    found = set()
    for doc_id, text in docs:
        is_dup, dup_of = idx.offer(doc_id, text)
        if is_dup:
            found.add(doc_id)
            assert dup_of < doc_id
    # every planted copy collides with its source (2 edits in 80 chars)
    assert planted <= found


def test_short_doc_excluded():
    idx = OnlineLSHIndex()
    assert idx.offer(0, "ab") == (False, -1)  # shorter than shingle k
    assert idx.offer(1, "ab") == (False, -1)  # and never indexed
