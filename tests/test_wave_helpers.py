"""Unit tests for shared helpers introduced in waves 125-155."""

import math

import duckdb
import numpy as np

from anofox_forecast_ray.pipelines.queries_wave135 import (
    _lanczos_gamma,
    _sql_gamma,
)
from anofox_forecast_ray.pipelines.queries_wave147 import (
    _lanczos_lgamma,
    _sql_lgamma,
)
from anofox_forecast_ray.pipelines.queries_wave151 import (
    local_skyline,
)


def test_lanczos_gamma_accuracy():
    for z in [0.5, 0.75, 0.9, 1.0, 1.3, 1.7, 2.0, 2.4]:
        assert abs(_lanczos_gamma(z) - math.gamma(z)) \
            <= 1e-12 * abs(math.gamma(z))
        assert abs(_lanczos_lgamma(z) - math.lgamma(z)) \
            <= 1e-11 * max(1.0, abs(math.lgamma(z)))


def test_sql_gamma_bitwise_matches_python():
    """The spelled-out Lanczos series must be BITWISE equal between
    DuckDB and Python — the property waves 135/147 rely on (DuckDB's
    builtin gamma()/lgamma() do NOT have it). The z value must flow
    through a TABLE ROW: DuckDB's constant folder may reassociate a
    literal-only expression (z + 1.0 - 1.0 -> z) and drift an ulp,
    while the vectorized executor — the path every real oracle
    takes — reproduces libm exactly."""
    con = duckdb.connect()
    for z in [0.51, 0.9, 1.0, 1.2345, 1.8, 2.3]:
        row = f"FROM (VALUES (CAST({z!r} AS DOUBLE))) t(z)"
        got = con.execute(
            f"SELECT {_sql_gamma('t.z')} {row}").fetchone()[0]
        assert got == _lanczos_gamma(z), (z, got)
        got = con.execute(
            f"SELECT {_sql_lgamma('t.z')} {row}").fetchone()[0]
        assert got == _lanczos_lgamma(z), (z, got)


def _brute_skyline(cents, size):
    keep = []
    for i in range(len(cents)):
        dom = any(
            cents[j] <= cents[i] and size[j] <= size[i]
            and (cents[j] < cents[i] or size[j] < size[i])
            for j in range(len(cents)))
        if not dom:
            keep.append((int(cents[i]), int(size[i])))
    return sorted(keep)


def test_local_skyline_matches_brute():
    rng = np.random.RandomState(7)
    for _trial in range(50):
        n = int(rng.randint(1, 40))
        cents = rng.randint(0, 12, size=n).astype(np.int64)
        size = rng.randint(0, 12, size=n).astype(np.int64)
        keys = np.arange(n, dtype=np.int64)
        c, s, _k = local_skyline(cents, size, keys)
        assert sorted(zip(c.tolist(), s.tolist())) \
            == _brute_skyline(cents, size)


def test_local_skyline_is_mergeable():
    """Skyline of the union of local skylines == global skyline —
    the property the tree reduce relies on."""
    rng = np.random.RandomState(11)
    cents = rng.randint(0, 20, size=60).astype(np.int64)
    size = rng.randint(0, 20, size=60).astype(np.int64)
    keys = np.arange(60, dtype=np.int64)
    c1, s1, k1 = local_skyline(cents[:30], size[:30],
                               keys[:30])
    c2, s2, k2 = local_skyline(cents[30:], size[30:],
                               keys[30:])
    cm, sm, _ = local_skyline(
        np.concatenate([c1, c2]), np.concatenate([s1, s2]),
        np.concatenate([k1, k2]))
    cg, sg, _ = local_skyline(cents, size, keys)
    assert sorted(zip(cm.tolist(), sm.tolist())) \
        == sorted(zip(cg.tolist(), sg.tolist()))
