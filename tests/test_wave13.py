"""Wave-13: dedup connected components (+ CMS / Bloom / DTW as added).

The oracle gate covers bitwise parity on the synthetic corpus; these
tests exercise the CC propagation on adversarial graph shapes the corpus
never produces (chains, cliques, singleton edges, multi-component mixes)
against a plain union-find reference."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_components(pairs):
    """Union-find reference: {node: min node of its component}."""
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
    return {n: find(n) for n in parent}


def _cc(pairs, **kw):
    import ray.data as rd

    from anofox_forecast_ray.extras.components import connected_components

    t = pa.table(
        {
            "doc_a": pa.array([str(a) for a, _ in pairs], type=pa.string()),
            "doc_b": pa.array([str(b) for _, b in pairs], type=pa.string()),
        }
    )
    out = connected_components(rd.from_arrow(t), **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["component"].astype(int)))


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_cc_chain_clique_mix(ray_session, limit):
    # chain 1-2-3-4-5, clique {10,11,12}, isolated pair (20, 21);
    # limit=0 forces the distributed propagation path
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (10, 12), (11, 12), (21, 20)]
    assert _cc(pairs, small_graph_limit=limit) == _uf_components(pairs)


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_cc_random_graph_matches_union_find(ray_session, limit):
    rng = np.random.default_rng(7)
    nodes = rng.choice(200, size=(60, 2), replace=True)
    pairs = [(int(a), int(b)) for a, b in nodes if a != b]
    assert _cc(pairs, small_graph_limit=limit) == _uf_components(pairs)


def test_cc_divergence_guard(ray_session):
    # a 6-chain needs ~5 rounds; max_iters=1 must raise, not silently
    # return partial labels (distributed path)
    pairs = [(i, i + 1) for i in range(5, 0, -1)]
    with pytest.raises(RuntimeError, match="not converged"):
        _cc(pairs, max_iters=1, small_graph_limit=0)


def test_wave13_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave13 import (
        build_wave13_queries,
    )

    q, o = build_wave13_queries()
    assert "dedup_components" in q
    assert set(o) == set(q)  # every wave-13 query is SQL-oracled


def _mini_docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(len(rows))), type=pa.int64()
                ),
                "source": pa.array(
                    [r[0] for r in rows], type=pa.string()
                ),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def test_cms_overestimates_never_under(ray_session):
    from anofox_forecast_ray.extras.sketches import cms_heavy_hitters

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for s in ("a", "b"):
        for _ in range(20):
            words = rng.choice(vocab, size=50)
            rows.append((s, " ".join(words)))
    out = cms_heavy_hitters(_mini_docs(rows)).to_pandas()
    assert len(out) > 0
    assert (out["est_count"] >= out["exact_count"]).all()
    # d=4 x w=256 on a 300-token vocab: most estimates exact
    assert (out["est_count"] == out["exact_count"]).mean() > 0.5


def test_bloom_no_false_negatives(ray_session):
    from anofox_forecast_ray.extras.sketches import bloom_anti_join

    rows = [("s", f"doc body {i} unique") for i in range(50)]
    out = (
        bloom_anti_join(_mini_docs(rows), mod=5)
        .to_pandas()
        .set_index("doc_id")["maybe_known"]
    )
    # every build-side doc (id % 5 == 0) must be flagged known
    for i in range(0, 50, 5):
        assert out[i] == 1


def test_dtw_kernel_properties():
    from anofox_forecast_ray.kernels.dtw import dtw_int, dtw_int_banded

    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, size=40)
    y = rng.integers(0, 1000, size=55)
    # identity and symmetry
    assert dtw_int(x, x) == 0
    assert dtw_int(x, y) == dtw_int(y, x)
    # hand-checked 3x3 case: x=[1,2,3] y=[1,3,3] -> path cost 1
    assert dtw_int([1, 2, 3], [1, 3, 3]) == 1
    # lower bound: |sum path| >= |x[0]-y[0]| + |x[-1]-y[-1]| endpoints
    assert dtw_int(x, y) >= abs(int(x[0]) - int(y[0]))
    # wide band == exact
    assert dtw_int_banded(x, y, band=60) == dtw_int(x, y)
    # narrow band only overestimates
    assert dtw_int_banded(x, y, band=3) >= dtw_int(x, y)


def test_bigram_lm_hand_checked(ray_session):
    import math

    import ray.data as rd

    from anofox_forecast_ray.corpus import tokens_from_text_batch
    from anofox_forecast_ray.extras.lm import bigram_perplexity

    # corpus: "abab", "ab", "", "x"  -> bigrams: ab x3, ba x1
    texts = ["abab", "ab", "", "x"]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "source": pa.array(["s"] * 4, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    ).map_batches(tokens_from_text_batch, batch_format="pyarrow")
    out = (
        bigram_perplexity(docs)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # model: C(ab)=3, C(ba)=1, C1(a)=3, C1(b)=1, V = |{a, b}| = 2
    p_ab = math.log((3 + 1.0) / (3 + 2.0))
    p_ba = math.log((1 + 1.0) / (1 + 2.0))
    want0 = 2 * p_ab + 1 * p_ba  # "abab": distinct-order fold ab then ba
    assert out.loc["0", "n_bigrams"] == 3
    assert abs(out.loc["0", "logprob"] - want0) < 1e-12
    assert abs(out.loc["1", "logprob"] - p_ab) < 1e-12
    assert out.loc["2", "n_bigrams"] == 0 and out.loc["2", "logprob"] == 0.0
    assert out.loc["3", "n_bigrams"] == 0  # single char: no bigram
    # mean is the plain division
    assert abs(out.loc["0", "mean_logprob"] - want0 / 3) < 1e-12


def test_pii_scan_hand_checked(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.textstats import pii_scan

    texts = [
        "mail me: a.b@x.co or c@d.e see https://q.r/z and http://s.t",
        "digits 123 45 and 6789 only",
        "",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    out = pii_scan(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_emails"] == 2 and out.loc[0, "n_urls"] == 2
    assert out.loc[0, "has_pii"] == 1
    assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_digit_runs"] == 3
    assert out.loc[1, "has_pii"] == 0
    assert out.loc[2].sum() == 0


def test_training_order_is_total_permutation(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.packing import training_order

    ids = pa.table({"doc_id": pa.array(list(range(300)), type=pa.int64())})
    out = training_order(rd.from_arrow(ids)).to_pandas()
    # ranks are a 0..n-1 permutation
    assert sorted(out["rank"]) == list(range(300))
    # rank order == ascending (shuffle_key, doc_id) order globally
    srt = out.sort_values("rank")
    keys = list(zip(srt["shuffle_key"], srt["doc_id"]))
    assert keys == sorted(keys)
    # determinism: second run identical
    out2 = training_order(rd.from_arrow(ids)).to_pandas()
    m1 = dict(zip(out["doc_id"], out["rank"]))
    m2 = dict(zip(out2["doc_id"], out2["rank"]))
    assert m1 == m2
    # a different seed is a different permutation
    out3 = training_order(rd.from_arrow(ids), seed=7).to_pandas()
    m3 = dict(zip(out3["doc_id"], out3["rank"]))
    assert m3 != m1


def test_bucketed_join_matches_pandas_merge(ray_session):
    import pandas as pd
    import ray.data as rd

    from anofox_forecast_ray.stages.join import bucketed_equi_join

    rng = np.random.default_rng(5)
    # keys with dupes on both sides (many-to-many) + large int64 payloads
    lk = rng.integers(0, 50, size=300)
    rk = rng.integers(0, 60, size=80)
    big = (1 << 60) + np.arange(300)  # would corrupt silently as float64
    left = rd.from_arrow(pa.table({"k": pa.array(lk, type=pa.int64()),
                                   "lv": pa.array(big, type=pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(rk, type=pa.int64()),
                                    "rv": pa.array(rk * 7, type=pa.int64())}))
    got = (
        bucketed_equi_join(left, right, key="k", n_buckets=8)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": lk, "lv": big})
        .merge(pd.DataFrame({"k": rk, "rv": rk * 7}), on="k")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert got.dtypes["lv"] == np.int64  # no float64 corruption
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_bucketed_join_rejects_column_collision(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.join import bucketed_equi_join

    t = pa.table({"k": pa.array([1], type=pa.int64()),
                  "v": pa.array([2], type=pa.int64())})
    with pytest.raises(ValueError, match="collision"):
        bucketed_equi_join(rd.from_arrow(t), rd.from_arrow(t), key="k")


def test_exact_quantiles_vs_numpy(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.quantile import exact_quantiles

    rng = np.random.default_rng(13)
    for cents in [
        rng.integers(-5000, 500000, size=3001),          # odd n, negatives
        rng.integers(0, 100, size=4000),                 # tiny range
        np.repeat(np.int64(7777), 5000),                 # total skew
        np.concatenate([np.repeat(np.int64(100), 4999),  # skew + outlier
                        [np.int64(10 ** 9)]]),
    ]:
        c = cents.astype(np.int64)

        def mk(c=c):
            return rd.from_arrow(
                pa.table({"cents": pa.array(c, type=pa.int64())})
            )

        out = exact_quantiles(mk).to_pandas()
        want = np.quantile(c, [0.25, 0.5, 0.75])
        assert np.array_equal(out["value"].to_numpy(), want), (
            out["value"].tolist(), want.tolist())
