"""grouped_exact_quantiles: per-group two-pass selection vs np.quantile
on skewed, duplicate-heavy, and tiny groups."""

import numpy as np
import pyarrow as pa

from anofox_forecast_ray.stages.quantile import grouped_exact_quantiles


def _run(groups, cents, qs=(0.25, 0.5, 0.75)):
    import ray.data as rd

    table = pa.table(
        {
            "g": pa.array(groups, type=pa.string()),
            "cents": pa.array(cents, type=pa.int64()),
        }
    )

    def mk():
        return rd.from_arrow(table).map_batches(
            lambda t: t, batch_format="pyarrow"
        )

    out = grouped_exact_quantiles(mk, "g", qs).to_pandas()
    return {(r["group"], r["q"]): r["value"] for _, r in out.iterrows()}


def test_grouped_quantiles_skewed(ray_session):
    rng = np.random.default_rng(9)
    parts = {
        # heavy duplication: a billion-dup shape in miniature
        "dup": np.repeat([100, 100, 100, 200], [500, 300, 100, 7]),
        # wide range crossing many coarse buckets
        "wide": rng.integers(0, 60_000, size=997),
        # tiny group (n < num targets)
        "tiny": np.array([5]),
        # two values straddling a bucket boundary (256)
        "edge": np.array([255, 256, 257, 255]),
    }
    groups, cents = [], []
    for g, v in parts.items():
        groups.extend([g] * len(v))
        cents.extend(int(x) for x in v)
    got = _run(groups, cents)
    for g, v in parts.items():
        s = np.sort(np.asarray(v, dtype=np.int64))
        for q in (0.25, 0.5, 0.75):
            want = float(np.quantile(s, q, method="linear"))
            assert got[(g, q)] == want, (g, q, got[(g, q)], want)


def test_grouped_quantiles_empty_input(ray_session):
    got = _run([], [])
    assert got == {}
