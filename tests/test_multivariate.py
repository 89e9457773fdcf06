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


def test_row_layout_normalizes_to_column(ray_session):
    """ValueLayout::Row (time_series.rs:304-337): row-major builder input
    transposes to column-major at construction."""
    import ray.data as rd

    from anofox_forecast_ray.stages.multivariate import (
        normalize_values_layout,
    )

    col = [[3.0, 1.0, 4.0, 1.0], [10.0, 20.0, 30.0, 40.0]]
    row = [list(obs) for obs in zip(*col)]  # values[t][d]
    rows = [
        ("a", row, ["t", "c"]),
        ("empty", [], []),
    ]
    out = (
        normalize_values_layout(rd.from_arrow(_mv_table(rows)), "row")
        .to_pandas()
        .set_index("series_id")
    )
    got = [list(d) for d in out.loc["a", "values"]]
    assert got == col
    assert list(out.loc["empty", "values"]) == []
    # column layout is the identity
    ident = (
        normalize_values_layout(rd.from_arrow(_mv_table(rows)), "column")
        .to_pandas()
        .set_index("series_id")
    )
    assert [list(d) for d in ident.loc["a", "values"]] == row


def test_row_layout_ragged_raises(ray_session):
    import pytest
    import ray.data as rd

    from anofox_forecast_ray.stages.multivariate import (
        normalize_values_layout,
    )

    rows = [("bad", [[1.0, 2.0], [3.0]], ["t", "c"])]
    with pytest.raises(Exception, match="ragged|DimensionMismatch"):
        normalize_values_layout(
            rd.from_arrow(_mv_table(rows)), "row"
        ).materialize()


def test_row_column_equivalence_property(ray_session):
    """Property: for random series, building row-major then normalizing
    equals building column-major directly — and the forecast over both is
    identical (the transpose round-trips bitwise)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anofox_forecast_ray.stages.multivariate import (
        docs_to_multivariate,
        multivariate_forecast,
        normalize_values_layout,
    )

    rng = np.random.default_rng(7)
    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(25)],
                               type=pa.string()),
            "tokens": pa.array(
                [rng.integers(0, 100, rng.integers(4, 120)).tolist()
                 for _ in range(25)],
                type=pa.list_(pa.int32()),
            ),
        }
    )
    corpus = rd.from_arrow(docs)
    col_tab = (
        docs_to_multivariate(corpus, width=8)
        .to_pandas().set_index("series_id").sort_index()
    )
    row_tab = (
        normalize_values_layout(
            docs_to_multivariate(corpus, width=8, layout="row"), "row"
        )
        .to_pandas().set_index("series_id").sort_index()
    )
    assert list(col_tab.index) == list(row_tab.index)
    for sid in col_tab.index:
        a = [list(d) for d in col_tab.loc[sid, "values"]]
        b = [list(d) for d in row_tab.loc[sid, "values"]]
        assert a == b, sid

    models = (("ses", {"alpha": 0.5}),)
    fa = multivariate_forecast(
        docs_to_multivariate(corpus, width=8), models, 1
    ).to_pandas().sort_values("series_id").reset_index(drop=True)
    fb = multivariate_forecast(
        normalize_values_layout(
            docs_to_multivariate(corpus, width=8, layout="row"), "row"
        ), models, 1
    ).to_pandas().sort_values("series_id").reset_index(drop=True)
    assert fa.equals(fb)


def test_multivar_row_query_registered():
    from anofox_forecast_ray.pipelines.queries_models_auto import (
        build_models_auto_queries,
    )

    q, o = build_models_auto_queries()
    assert "forecast_multivar_row_w8" in q
    assert o["forecast_multivar_row_w8"] == o["forecast_multivar_primary_w8"]
