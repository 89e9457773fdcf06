"""Wave-26 kernel tests: span hashes, trimmed-mean histogram window,
TWA integer fold."""
import numpy as np
import pandas as pd

from anofox_forecast_ray.extras.dedup import _BASE
from anofox_forecast_ray.pipelines.queries_wave26 import _span_hashes


def _brute_span_hashes(text: str, k: int):
    if len(text) < k:
        return []
    out = []
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * _BASE + ord(ch)) % (1 << 64)
        out.append(h)
    return out


def test_span_hashes_match_brute_force():
    text = "the quick brown fox jumps over the lazy dog again"
    got = _span_hashes(text, 16)
    exp = _brute_span_hashes(text, 16)
    assert got.tolist() == exp
    assert got.size == len(text) - 15


def test_span_hashes_short_doc_empty():
    assert _span_hashes("short", 16).size == 0
    assert _span_hashes("", 16).size == 0


def test_span_hashes_positional_multiplicity():
    # repeated 16-gram appears twice (not deduped)
    t = "abcdefghijklmnop" * 2
    h = _span_hashes(t, 16)
    assert h[0] == h[16]


def test_trimmed_window_math_matches_sort():
    rng = np.random.default_rng(7)
    for n in (10, 37, 100, 9):
        vals = rng.integers(0, 50, n)
        uv, c = np.unique(vals, return_counts=True)
        k = n // 10
        cum = np.cumsum(c)
        start = cum - c
        kept = np.clip(
            np.minimum(cum, n - k) - np.maximum(start, k), 0, None
        )
        s = np.sort(vals)[k : n - k]
        assert int(kept.sum()) == s.size
        assert int((kept * uv).sum()) == int(s.sum())


def test_twa_fold_matches_brute():
    ts = np.array([0, 10, 25, 100], dtype=np.int64)
    c = np.array([5, 7, 3, 99], dtype=np.int64)  # last value unused
    dt = np.diff(ts)
    wsum = int((c[:-1] * dt).sum())
    assert wsum == 5 * 10 + 7 * 15 + 3 * 75
    assert wsum / (ts[-1] - ts[0]) == (50 + 105 + 225) / 100
