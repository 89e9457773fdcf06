"""Property tests for the round-3 paths (hypothesis, no Ray needed for
the kernel-level ones; the distributed CC property uses the shared
session fixture but a small graph so rounds converge fast)."""

import numpy as np
from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------- components
@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1, max_size=40,
    )
)
def test_cc_distributed_matches_union_find(ray_session, edges):
    import pyarrow as pa
    import ray.data as rd

    from anofox_forecast_ray.extras.components import connected_components

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    t = pa.table(
        {
            "doc_a": pa.array([str(a) for a, _ in pairs]),
            "doc_b": pa.array([str(b) for _, b in pairs]),
        }
    )
    out = connected_components(
        rd.from_arrow(t), small_graph_limit=0, max_iters=64
    ).to_pandas()
    got = dict(zip(out["node"].astype(int), out["component"].astype(int)))

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert got == {n: find(n) for n in parent}


# ------------------------------------------------------------------- LM shards
@settings(max_examples=20, deadline=None)
@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=200,
                  unique=True),
    n_shards=st.integers(1, 16),
)
def test_model_shards_partition_and_lookup(keys, n_shards):
    """shard_bigram_model's hash routing: shards partition the key set,
    stay ascending within each shard, and the sharded gather reproduces
    the global ltab lookup exactly."""
    import ray

    from anofox_forecast_ray.extras.lm import (
        BigramScoreStageSharded,
        shard_bigram_model,
    )

    k = np.sort(np.asarray(keys, dtype=np.int64))
    ltab = np.arange(k.size, dtype=np.float64) * 0.5 - 3.0
    model = (k, None, None, None, 0, ltab)
    refs = shard_bigram_model(model, n_shards=n_shards)
    stage = BigramScoreStageSharded(refs)
    got = stage._gather(k)
    assert np.array_equal(got, ltab)
    total = 0
    for r in refs:
        sk, sl = ray.get(r)
        assert np.all(np.diff(sk) > 0) if sk.size > 1 else True
        total += sk.size
    assert total == k.size


# -------------------------------------------------------------- JSD task fold
@settings(max_examples=25, deadline=None)
@given(
    corpus=st.dictionaries(st.integers(0, 50), st.integers(1, 100),
                           min_size=1, max_size=30),
    frac=st.floats(0.1, 1.0),
)
def test_jsd_arrays_matches_dict_fold(corpus, frac):
    """The round-3 array-based JSD fold equals the original dict fold
    (same token-ascending order) and respects the ln2 bound."""
    import math

    from anofox_forecast_ray.pipelines.queries_wave299 import (
        jsd_to_corpus_arrays,
    )

    toks = sorted(corpus)
    src = {t: max(1, int(corpus[t] * frac)) for t in toks[: max(1, len(toks) // 2)]}

    # original-style dict fold
    f1 = float(sum(src.values()))
    f2 = float(sum(corpus.values()))
    want = 0.0
    for tok in toks:
        p = float(src.get(tok, 0)) / f1
        q = float(corpus[tok]) / f2
        m = 0.5 * (p + q)
        term = 0.0
        if p > 0.0:
            term += 0.5 * (p * math.log(p / m))
        if q > 0.0:
            term += 0.5 * (q * math.log(q / m))
        want += term

    ct = np.asarray(toks, dtype=np.int64)
    cc = np.asarray([corpus[t] for t in toks], dtype=np.int64)
    stok = np.asarray(sorted(src), dtype=np.int64)
    scnt = np.asarray([src[t] for t in sorted(src)], dtype=np.int64)
    got = jsd_to_corpus_arrays(stok, scnt, ct, cc)
    assert got == want  # bitwise: same fold order, same scalar ops
    assert -1e-12 <= got <= math.log(2.0) + 1e-12
