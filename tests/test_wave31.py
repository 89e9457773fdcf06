"""Wave-31 kernel tests: levenshtein DP, burstiness fold, dim-stat
integer units."""
import numpy as np

from anofox_forecast_ray.pipelines.queries_wave31 import _levenshtein


def _brute_lev(a, b):
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[m][n]


def test_levenshtein_matches_brute():
    cases = [
        ("kitten", "sitting"), ("", "abc"), ("abc", ""),
        ("same", "same"), ("a", "b"), ("sunday", "saturday"),
        ("abcdef", "azced"),
    ]
    for a, b in cases:
        assert _levenshtein(a, b) == _brute_lev(a, b), (a, b)


def test_levenshtein_random():
    rng = np.random.default_rng(3)
    alpha = "ab c"
    for _ in range(20):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        assert _levenshtein(a, b) == _brute_lev(a, b), (a, b)


def test_burstiness_formula():
    # regular gaps -> sigma 0 -> B = -1; bursty extremes -> B near +1
    gaps = np.array([10, 10, 10, 10], dtype=np.int64)
    k = gaps.size
    m = gaps.sum() / k
    s = np.sqrt((gaps**2).sum() / k - m * m)
    assert s == 0.0 and (s - m) / (s + m) == -1.0
    gaps = np.array([1, 1, 1, 1000], dtype=np.int64)
    m = gaps.sum() / gaps.size
    s = np.sqrt((gaps**2).sum() / gaps.size - m * m)
    assert 0.0 < (s - m) / (s + m) < 1.0


def test_micro_unit_roundtrip_exact():
    rng = np.random.default_rng(0)
    x32 = rng.normal(size=100).astype(np.float32)
    m = np.round(x32.astype(np.float64) * 1_000_000.0).astype(np.int64)
    # int64 sums are exact and order-free
    assert m.sum() == m[::-1].sum() == np.sort(m).sum()
