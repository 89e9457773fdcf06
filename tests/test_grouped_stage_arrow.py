"""The round-3 pyarrow-native group UDFs (stages/forecast.forecast_grouped,
stages/gorilla_stage.gorilla_grouped) against direct kernel computation —
these alternate per-series entry points had no dedicated coverage."""

import numpy as np
import pyarrow as pa


def _rollup_rows():
    """Two series with out-of-order windows + one too-short series."""
    rows = []
    for doc, means in (
        ("a", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]),
        ("b", [2.0, 7.0, 1.0, 8.0]),
        ("tiny", [1.0, 2.0]),  # < min_points: dropped by forecast
    ):
        for w, m in enumerate(means):
            rows.append((doc, "w8", w, m))
    rng = np.random.default_rng(3)
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tier": pa.array([r[1] for r in rows], type=pa.string()),
            "window_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "mean": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )


def test_forecast_grouped_arrow(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.models import make_model
    from anofox_forecast_ray.stages.forecast import forecast_grouped

    out = (
        forecast_grouped(
            rd.from_arrow(_rollup_rows()),
            models=(("ses", {"alpha": 0.5}), ("naive", {})),
            horizon=1,
        )
        .to_pandas()
        .set_index(["doc_id", "model"])
    )
    assert "tiny" not in {i[0] for i in out.index}
    for doc, means in (("a", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]),
                       ("b", [2.0, 7.0, 1.0, 8.0])):
        y = np.asarray(means)
        want = float(make_model("ses", alpha=0.5).fit(y).predict(1)[0])
        assert out.loc[(doc, "ses"), "yhat"] == want
        assert out.loc[(doc, "naive"), "yhat"] == y[-1]
        assert out.loc[(doc, "ses"), "tier"] == "w8"
    assert out["h"].dtype == np.int32


def test_gorilla_grouped_arrow_roundtrip(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.kernels.gorilla import gorilla_decode
    from anofox_forecast_ray.stages.gorilla_stage import gorilla_grouped

    out = (
        gorilla_grouped(rd.from_arrow(_rollup_rows()))
        .to_pandas()
        .set_index("doc_id")
    )
    for doc, means in (("a", [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]),
                       ("b", [2.0, 7.0, 1.0, 8.0]),
                       ("tiny", [1.0, 2.0])):
        ts, vals = gorilla_decode(out.loc[doc, "blob"])
        assert ts.tolist() == list(range(len(means)))  # sorted by window
        assert vals.tolist() == means
        assert out.loc[doc, "n_pts"] == len(means)
        assert out.loc[doc, "tier"] == "w8"
