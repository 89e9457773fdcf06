"""The coarse-bucket dedup kernels must be EXACTLY equivalent to the
naive one-group-at-a-time formulation they replaced (commit: coarse-
bucket shuffles). Property-style checks against brute-force references
on randomized corpora, plus the degenerate-bucket cap."""

import numpy as np
import pyarrow as pa
import pytest


def _rand_docs(rng, n, vocab, length):
    return [" ".join(rng.choice(vocab, length)) for _ in range(n)]


@pytest.mark.usefixtures("ray_session")
def test_minhash_bucket_kernel_equals_bruteforce():
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import (
        MinHasher,
        minhash_candidate_pairs,
        signature_jaccard,
    )

    rng = np.random.default_rng(77)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
    docs = _rand_docs(rng, 40, vocab, 60)
    # inject near-dups
    docs += [docs[0] + " zz", docs[5] + " qq"]
    ids = [f"d{i:03d}" for i in range(len(docs))]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})

    got = minhash_candidate_pairs(
        rd.from_arrow(t), threshold=0.5, max_bucket=None
    ).to_pandas()
    got_pairs = {(a, b): v for a, b, v in
                 zip(got.doc_a, got.doc_b, got.est_jaccard)}

    # brute force: full signature matrix + banded candidate rule
    h = MinHasher()
    sigs = {d: h.signature(x) for d, x in zip(ids, docs)}
    sigs = {d: s for d, s in sigs.items() if s is not None}
    bands, rpb = 16, 4
    exp = {}
    keys = sorted(sigs)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            sa, sb = sigs[a], sigs[b]
            band_match = any(
                (sa[c * rpb:(c + 1) * rpb] == sb[c * rpb:(c + 1) * rpb]).all()
                for c in range(bands)
            )
            if band_match:
                est = signature_jaccard(sa, sb)
                if est >= 0.5:
                    exp[(a, b)] = est
    assert got_pairs == exp
    assert any(p[0] == "d000" or p[1] == "d000" for p in exp)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_bucket_kernel():
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import exact_dedup

    rng = np.random.default_rng(78)
    texts = [f"doc body {i}" for i in range(30)]
    # duplicate groups of sizes 3 and 2
    texts += [texts[4]] * 2 + [texts[9]]
    ids = [f"x{i:02d}" for i in range(len(texts))]
    out = exact_dedup(
        rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                "text": pa.array(texts)}))
    ).to_pandas()
    assert len(out) == len(ids)
    g4 = out[out.doc_id.isin(["x04", "x30", "x31"])]
    assert (g4.dup_count == 3).all()
    assert set(g4[g4.keep].doc_id) == {"x04"}
    g9 = out[out.doc_id.isin(["x09", "x32"])]
    assert (g9.dup_count == 2).all() and set(g9[g9.keep].doc_id) == {"x09"}
    singles = out[~out.doc_id.isin(["x04", "x30", "x31", "x09", "x32"])]
    assert (singles.dup_count == 1).all() and singles.keep.all()


@pytest.mark.usefixtures("ray_session")
def test_minhash_degenerate_bucket_cap():
    """1000 identical docs: the max_bucket cap must bound pair output
    (cap defense against degenerate content at corpus scale)."""
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import minhash_candidate_pairs

    n = 300
    t = pa.table({
        "doc_id": pa.array([f"s{i:04d}" for i in range(n)]),
        "text": pa.array(["exactly the same text content here"] * n),
    })
    got = minhash_candidate_pairs(
        rd.from_arrow(t), threshold=0.5, max_bucket=64
    ).to_pandas()
    # each band bucket truncates to 64 rows -> at most C(64,2) pairs
    assert 0 < len(got) <= 64 * 63 // 2
