"""Multivariate series pass-through (reference time_series.rs:164-174:
column-major values[dim][t]; models consume primary_values() = dim 0 only,
:420-422).  VERDICT r2 gap #3."""

import numpy as np
import pyarrow as pa


def _mv_table(rows):
    return pa.table(
        {
            "series_id": pa.array([r[0] for r in rows], type=pa.string()),
            "values": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.list_(pa.float64()))
            ),
            "dim_labels": pa.array(
                [r[2] for r in rows], type=pa.list_(pa.string())
            ),
        }
    )


def test_models_read_dim0_only(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.models import make_model
    from anofox_forecast_ray.stages.multivariate import multivariate_forecast

    y = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    noise = [100.0, -7.0, 0.0, 33.0, 2.5, -1.0, 8.0, 4.0]
    rows = [
        ("a", [y, noise], ["target", "covariate"]),      # 2-dim
        ("b", [y], ["target"]),                          # 1-dim
        ("c", [y, noise, [0.0] * 8], ["t", "c1", "c2"]),  # 3-dim
    ]
    out = (
        multivariate_forecast(
            rd.from_arrow(_mv_table(rows)),
            (("ses", {"alpha": 0.5}), ("naive", {})),
            horizon=1, concurrency=1,
        )
        .to_pandas()
        .set_index(["series_id", "model"])
    )
    direct_ses = float(
        make_model("ses", alpha=0.5).fit(np.asarray(y)).predict(1)[0]
    )
    # identical forecasts regardless of how many covariate dims ride along
    for sid, ndims in (("a", 2), ("b", 1), ("c", 3)):
        assert out.loc[(sid, "ses"), "yhat"] == direct_ses
        assert out.loc[(sid, "naive"), "yhat"] == y[-1]
        assert out.loc[(sid, "ses"), "n_dims"] == ndims


def test_short_and_empty_series_skipped(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.multivariate import multivariate_forecast

    rows = [
        ("short", [[1.0, 2.0]], ["t"]),   # < min_points
        ("empty", [], []),                # no dims at all
        ("ok", [[1.0, 2.0, 3.0, 4.0]], ["t"]),
    ]
    out = multivariate_forecast(
        rd.from_arrow(_mv_table(rows)), (("naive", {}),), 1, concurrency=1
    ).to_pandas()
    assert set(out["series_id"]) == {"ok"}


def test_docs_to_multivariate_dims(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.multivariate import docs_to_multivariate

    toks = list(range(20))  # 20 tokens, w8 -> windows of 8, 8, 4
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d0"], type=pa.string()),
                "tokens": pa.array([toks], type=pa.list_(pa.int32())),
            }
        )
    )
    out = docs_to_multivariate(corpus, width=8).to_pandas()
    vals = out.loc[0, "values"]
    assert len(vals) == 2
    assert list(vals[0]) == [3.5, 11.5, 17.5]   # window means
    assert list(vals[1]) == [8.0, 8.0, 4.0]     # window counts
    assert list(out.loc[0, "dim_labels"]) == ["token_mean", "token_count"]


def test_multivar_query_registered():
    from anofox_forecast_ray.pipelines.queries_models_auto import (
        build_models_auto_queries,
    )

    q, o = build_models_auto_queries()
    assert "forecast_multivar_primary_w8" in q
    assert "forecast_multivar_primary_w8" in o  # SQL-oracled
    for name in ("forecast_otm_w8", "forecast_dstm_w8", "forecast_dotm_w8",
                 "forecast_auto_theta_w8", "forecast_auto_arima_w8"):
        assert name in q
