"""Wave-19: DSIR ratio scoring with unseen target bigrams, exact
distributed float order statistics, cross-source dup matrix."""

import math

import numpy as np
import pyarrow as pa
import pytest

import anofox_forecast_ray.pipelines.queries_wave19 as w19
from anofox_forecast_ray.extras.lm import (
    BigramRatioStage,
    dsir_importance,
    model_score_tables,
    train_bigram_model,
    _score_rows,
)
from anofox_forecast_ray.stages.quantile import (
    exact_order_stats,
    float_order_keys,
    keys_to_float,
)


def _corpus(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tokens": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


def test_score_rows_unseen_bigram_smoothing(ray_session):
    import ray.data as rd

    # target model trained on "ab ab"; scoring doc has unseen (b,c),(c,c)
    train = rd.from_arrow(_corpus([("1", [1, 2, 1, 2], "t")]))
    model = train_bigram_model(train)
    tables = model_score_tables(model)
    # model: pairs (1,2)x2, (2,1)x1; V = distinct b = {1,2} -> 2
    vals = np.array([1, 2, 3, 3], dtype=np.int32)  # pairs (1,2),(2,3),(3,3)
    nb, lp = _score_rows(tables, vals, np.array([4]))
    assert nb[0] == 3
    want = (
        math.log((2 + 1.0) / (2 + 2.0))     # (1,2) seen
        + math.log(1.0 / (1 + 2.0))         # (2,3): c2 miss, c1(2)=1
        + math.log(1.0 / 2.0)               # (3,3): both miss -> 1/V
    )
    assert lp[0] == want


def test_dsir_prefers_target_like_docs(ray_session):
    import ray.data as rd

    rows = [
        ("1", [1, 2] * 20, "tgt"),
        ("2", [1, 2] * 20, "other"),   # target-like content
        ("3", [7, 8, 9] * 13 + [7], "other"),  # alien content
    ]

    def factory():
        return rd.from_arrow(_corpus(rows))

    out = dsir_importance(factory, "tgt").to_pandas().set_index("doc_id")
    assert out.loc["2", "logw"] > out.loc["3", "logw"]
    # identical content -> identical weight
    assert out.loc["1", "logw"] == out.loc["2", "logw"]


def test_exact_order_stats_matches_numpy_sort(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    x = np.concatenate(
        [rng.normal(size=997) * 1e3, [-1e300, 1e300, 0.0, -0.0, 3.5, 3.5]]
    )
    t = pa.table({"key": pa.array(float_order_keys(x), type=pa.int64())})

    def mk():
        return rd.from_arrow(t)

    ranks = [0, 1, len(x) // 3, len(x) // 2, len(x) - 1]
    st = exact_order_stats(mk, ranks)
    xs = np.sort(x)
    for r in ranks:
        got = keys_to_float(np.asarray([st[r]], dtype=np.int64))[0]
        assert got == xs[r], r


def test_exact_order_stats_rejects_bad_ranks(ray_session):
    import ray.data as rd

    t = pa.table({"key": pa.array([1, 2, 3], type=pa.int64())})
    with pytest.raises(ValueError):
        exact_order_stats(lambda: rd.from_arrow(t), [3])


def test_cross_source_matrix_counts(ray_session, monkeypatch):
    import ray.data as rd

    # docs 1/2 near-identical across sources A,B; doc 3 unrelated
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([base, base + "x", "zzz qqq www " * 10]),
            "source": pa.array(["A", "B", "A"]),
        }
    )
    monkeypatch.setattr(
        w19, "_docs",
        lambda sf_dir, columns: rd.from_arrow(docs.select(columns)),
    )
    q, _ = w19._cross_source_query()
    out = q("x").to_pandas()
    assert len(out) == 1
    assert out.loc[0, "src_lo"] == "A" and out.loc[0, "src_hi"] == "B"
    assert out.loc[0, "n_pairs"] == 1
