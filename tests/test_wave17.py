"""Wave-17 corpus-mixing ops: hand-computed small cases and the edge
shapes the synthetic corpus never produces (single-type sources, string
vs numeric doc-id ordering, bucket boundaries, doc-boundary bigrams)."""

import math

import numpy as np
import pyarrow as pa
import pytest

import anofox_forecast_ray.pipelines.queries_wave17 as w17


def _corpus(rows):
    """rows: list of (doc_id, tokens, source)."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tokens": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array(
                [len(r[1]) for r in rows], type=pa.int32()
            ),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


@pytest.fixture
def patch_corpus(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(w17, "corpus_ds", lambda sf_dir: rd.from_arrow(table))

    return _patch


@pytest.fixture
def patch_docs(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(
            w17,
            "_docs",
            lambda sf_dir, columns: rd.from_arrow(table.select(columns)),
        )

    return _patch


def test_kl_hand_case(ray_session, patch_corpus):
    # source a: tokens {1:2, 2:2}; source b: {1:4}. global: {1:6, 2:2}
    patch_corpus(
        _corpus([("1", [1, 2, 1, 2], "a"), ("2", [1, 1, 1, 1], "b")])
    )
    q, _ = w17._kl_query()
    out = q("x").to_pandas().set_index("source")
    ga, gtot = {1: 6, 2: 2}, 8
    kla = 0.0
    for t, c in [(1, 2), (2, 2)]:
        p = c / 4
        kla += p * math.log(p / (ga[t] / gtot))
    assert out.loc["a", "kl"] == kla
    assert out.loc["b", "kl"] == 1.0 * math.log((4 / 4) / (6 / 8))
    assert out.loc["a", "n_types"] == 2 and out.loc["b", "n_types"] == 1


def test_zipf_skips_single_type_and_breaks_ties(ray_session, patch_corpus):
    # source solo has 1 type -> skipped; source z has counts 3,2,2
    patch_corpus(
        _corpus(
            [
                ("1", [7, 7, 7], "solo"),
                ("2", [5, 5, 5, 9, 9, 4, 4], "z"),
            ]
        )
    )
    q, _ = w17._zipf_query()
    out = q("x").to_pandas()
    assert list(out["source"]) == ["z"]
    assert out.loc[0, "m"] == 3
    # ranks: 5(cnt3)=1, 4(cnt2)=2 (token asc beats 9), 9(cnt2)=3
    xs = [math.log(float(r)) for r in (1, 2, 3)]
    ys = [math.log(float(c)) for c in (3, 2, 2)]
    sx = sum(xs)
    sy = ys[0] + ys[1] + ys[2]
    sxx = xs[0] * xs[0] + xs[1] * xs[1] + xs[2] * xs[2]
    sxy = xs[0] * ys[0] + xs[1] * ys[1] + xs[2] * ys[2]
    det = 3.0 * sxx - sx * sx
    assert out.loc[0, "slope"] == (3.0 * sxy - sx * sy) / det


def test_novelty_numeric_first_doc(ray_session, patch_corpus):
    # doc "10" sorts before "2" as a STRING; first-occurrence must use
    # numeric order: token 5 first appears in doc 2, not doc 10.
    patch_corpus(
        _corpus(
            [
                ("2", [5, 6], "s"),
                ("10", [5, 7], "s"),
                ("11", [], "s"),  # zero tokens -> no output row
            ]
        )
    )
    q, _ = w17._novelty_query()
    out = q("x").to_pandas().set_index("doc_id")
    assert set(out.index) == {"2", "10"}
    assert out.loc["2", "n_new"] == 2  # 5 and 6
    assert out.loc["10", "n_new"] == 1  # only 7; 5 seen in doc 2
    assert out.loc["10", "n_types"] == 2


def test_pad_waste_bucket_boundaries(ray_session, patch_docs):
    docs = pa.table(
        {"n_chars": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64())}
    )
    patch_docs(docs)
    q, _ = w17._pad_waste_query()
    out = q("x").to_pandas().set_index("bucket").sort_index()
    assert out.loc[1, "n_docs"] == 2  # 0 and 1
    assert out.loc[2, "n_docs"] == 1  # 2
    assert out.loc[4, "n_docs"] == 2  # 3, 4
    assert out.loc[8, "n_docs"] == 1  # 5
    assert out.loc[4, "sum_tok"] == 7 and out.loc[4, "padded"] == 8
    assert out.loc[4, "fill_ratio"] == np.float64(7) / np.float64(8)


def test_bigrams_stop_at_doc_boundary(ray_session, patch_corpus):
    patch_corpus(
        _corpus(
            [
                ("1", [1, 2, 1, 2], "s"),  # (1,2)x2 (2,1)x1
                ("2", [2, 1], "s"),        # (2,1)x1 — no (2,2) across docs
                ("3", [9], "s"),           # single token: no bigrams
            ]
        )
    )
    q, _ = w17._bigram_topk_query()
    out = q("x").to_pandas()
    got = {(r.t0, r.t1): (r.rnk, r.cnt) for r in out.itertuples()}
    assert got == {(1, 2): (1, 2), (2, 1): (2, 2)} or got == {
        (1, 2): (2, 2),
        (2, 1): (1, 2),
    }
    # tie at cnt=2 -> (1,2) wins by t0 asc
    assert got[(1, 2)][0] == 1


def test_temperature_mix_exact_fold(ray_session, patch_corpus):
    patch_corpus(
        _corpus([("1", [1] * 4, "a"), ("2", [2] * 9, "b")])
    )
    q, _ = w17._temperature_mix_query()
    out = q("x").to_pandas().set_index("source")
    assert out.loc["a", "weight"] == 2.0 / 5.0
    assert out.loc["b", "weight"] == 3.0 / 5.0
    assert out.loc["a", "epochs"] == (2.0 / 5.0) * 13.0 / 4.0
