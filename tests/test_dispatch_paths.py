"""Round-4 dispatch changes: stages that moved to task-pool defaults
keep an actor-pool form behind an explicit ``concurrency`` arg. Pin
that BOTH dispatch paths produce identical results — the dispatch mode
must never leak into values.
"""

import numpy as np
import pyarrow as pa


def _docs_table(n=40, seed=3):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"], 30).tolist()
        )
        for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(n)],
                               type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "source": pa.array(["web"] * n, type=pa.string()),
        }
    )


def _sorted_pandas(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bigram_perplexity_task_vs_actor(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.corpus import tokens_from_text_batch
    from anofox_forecast_ray.extras.lm import bigram_perplexity

    def corpus():
        return rd.from_arrow(_docs_table()).map_batches(
            tokens_from_text_batch, batch_format="pyarrow"
        )

    task = _sorted_pandas(bigram_perplexity(corpus()))
    actor = _sorted_pandas(bigram_perplexity(corpus(), concurrency=2))
    assert task.equals(actor)
    assert len(task) == 40


def test_ann_brute_task_vs_actor(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.ann import brute_force_topk

    rng = np.random.default_rng(11)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(
                [rng.normal(0, 1, 16).tolist() for _ in range(50)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    Q = rng.normal(0, 1, (3, 16))
    t = brute_force_topk(rd.from_arrow(tbl), Q, k=5)
    a = brute_force_topk(rd.from_arrow(tbl), Q, k=5, concurrency=2)
    assert t.equals(a)
    assert t.num_rows == 15


def test_cosine_pairs_task_vs_actor(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.ann import embedding_cosine_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (20, 8))
    base[13] = base[4] + 1e-9  # a guaranteed near-dup pair
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(20, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in base],
                                  type=pa.list_(pa.float64())),
        }
    )
    t = _sorted_pandas(embedding_cosine_pairs(rd.from_arrow(tbl), 0.9))
    a = _sorted_pandas(
        embedding_cosine_pairs(rd.from_arrow(tbl), 0.9, concurrency=2)
    )
    assert t.equals(a)
    assert {(4, 13)} <= set(zip(t["id_a"], t["id_b"]))


def test_multivar_closed_form_task_vs_optimizer_actor(ray_session):
    """Closed-form model sets take the task-pool branch, optimizer sets
    the actor branch — BOTH branches run here and both must equal a
    direct in-process call of the same stage."""
    import ray.data as rd

    from anofox_forecast_ray.models import OPTIMIZER_MODELS
    from anofox_forecast_ray.stages.multivariate import (
        MultivariateForecast,
        multivariate_forecast,
    )

    y = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = pa.table(
        {
            "series_id": pa.array(["a"], type=pa.string()),
            "values": pa.array([[y]], type=pa.list_(pa.list_(pa.float64()))),
            "dim_labels": pa.array([["t"]], type=pa.list_(pa.string())),
        }
    )
    # task-pool branch: closed-form model
    closed = (("ses", {"alpha": 0.5}),)
    assert not any(n in OPTIMIZER_MODELS for n, _ in closed)
    task = multivariate_forecast(rd.from_arrow(rows), closed, 1).to_pandas()
    direct = MultivariateForecast(closed, 1)(rows)
    assert task.loc[0, "yhat"] == direct.column("yhat")[0].as_py()

    # actor-pool branch: an optimizer model (holt runs Nelder-Mead —
    # it must be classified as such; review r4 caught it missing)
    opt = (("holt", {}),)
    assert any(n in OPTIMIZER_MODELS for n, _ in opt)
    actor = multivariate_forecast(
        rd.from_arrow(rows), opt, 1, concurrency=1
    ).to_pandas()
    direct_opt = MultivariateForecast(opt, 1)(rows)
    assert actor.loc[0, "yhat"] == direct_opt.column("yhat")[0].as_py()


def test_exact_dedup_keep_first_matches_pandas_semantics(ray_session):
    """The pyarrow keep-first kernel must reproduce the old pandas
    semantics exactly: keep == (doc_id == lexicographic group min),
    which for string ids differs from numeric min ('10' < '9')."""
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import exact_dedup

    # doc_ids 9 and 10 share content: lexicographic min is '10'
    docs = pa.table(
        {
            "doc_id": pa.array(["9", "10", "2", "3"], type=pa.string()),
            "text": pa.array(["same", "same", "same", "other"],
                             type=pa.string()),
        }
    )
    out = (
        exact_dedup(rd.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(out.loc["10", "keep"]) is True   # lexicographic min
    assert bool(out.loc["9", "keep"]) is False
    assert bool(out.loc["2", "keep"]) is False   # '10' < '2' < '9'
    assert int(out.loc["9", "dup_count"]) == 3
    assert bool(out.loc["3", "keep"]) is True
    assert int(out.loc["3", "dup_count"]) == 1
