"""Independent brute checks for wave-201 classifier metrics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave201 import (
    ap_from_hist,
    youden_mcc_from_hist,
)


def _hist(scores, labels):
    cs = np.sort(np.unique(scores))[::-1]
    pos = np.array([int(labels[scores == c].sum()) for c in cs],
                   dtype=np.int64)
    neg = np.array([int((1 - labels[scores == c]).sum())
                    for c in cs], dtype=np.int64)
    return cs.astype(np.int64), pos, neg


def test_average_precision_matches_sklearn_style_brute():
    rng = np.random.default_rng(201)
    for trial in range(8):
        n = 300
        scores = rng.integers(1, 40, n)
        labels = (rng.random(n) < scores / 60).astype(np.int64)
        if labels.sum() == 0:
            labels[0] = 1
        cs, pos, neg = _hist(scores, labels)
        ap, P = ap_from_hist(cs, pos, neg)
        # brute AP: sum over thresholds of dRecall * precision
        tp = fp = 0
        ref = 0.0
        for c, p, ng in zip(cs, pos, neg):
            tp_prev = tp
            tp += int(p)
            fp += int(ng)
            ref += (tp - tp_prev) / labels.sum() * (tp / (tp + fp))
        assert abs(ap - ref) < 1e-12, trial


def test_youden_mcc_matches_float_scan():
    rng = np.random.default_rng(202)
    for trial in range(8):
        n = 400
        scores = rng.integers(1, 30, n)
        labels = (rng.random(n) < scores / 40).astype(np.int64)
        if labels.sum() in (0, n):
            continue
        cs, pos, neg = _hist(scores, labels)
        thr, j, mcc = youden_mcc_from_hist(cs, pos, neg)
        P, N = int(labels.sum()), int((1 - labels).sum())
        best_j, best_t = -2.0, None
        tp = fp = 0
        for c, p, ng in zip(cs, pos, neg):
            tp += int(p)
            fp += int(ng)
            jj = tp / P - fp / N
            if jj > best_j + 1e-15:
                best_j, best_t = jj, int(c)
                btp, bfp = tp, fp
        assert thr == best_t, trial
        assert abs(j - best_j) < 1e-12
        fn, tn = P - btp, N - bfp
        ref = (btp * tn - bfp * fn) / np.sqrt(
            float(btp + bfp) * (btp + fn) * (tn + bfp)
            * (tn + fn))
        assert abs(mcc - ref) < 1e-12
