"""Ninth query wave: naive-DFT periodogram bins (the hard anchor for the
FFT periodicity detectors) and the complexity-feature triple (CID-CE,
c3, time-reversal asymmetry) — each with an exact DuckDB oracle.

Bitwise notes:
- the DFT sums fold sequentially with scalar math.cos/math.sin (same
  libm as DuckDB cos/sin); power normalization (c^2+s^2)/n matches
  kernels/detection.periodogram's bin convention, and a pytest asserts
  the naive path equals np.fft.rfft bins to 1e-8 relative — so the FFT
  scale path is anchored by this oracle.
- cid_ce / c3 / time_reversal_asymmetry_statistic fold sequentially in
  the kernel (cumsum, not BLAS np.dot / pairwise np.mean).

Reference parity: src/detection/fft.rs:48-88 (periodogram bins),
src/features/complexity.rs (cid_ce, lempel-ziv),
src/features/autocorrelation.rs (c3, time_reversal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _series_list_sql, corpus_ds
from .queries_wave5 import _doc_series_rows

_FOLD = "(acc, x) -> acc + x"


def _dft_query(width: int, max_k: int = 4):
    """Per-doc DFT cos/sin sums and power at frequencies k = 1..max_k
    over the mean-centered w{width} series (kernels/detection.dft_power_seq)."""

    def q(sf_dir: str):
        from ..kernels.detection import dft_power_seq

        ks = list(range(1, max_k + 1))

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "k": [], "c": [], "s": [], "power": []}
            for doc, y in _doc_series_rows(t, width):
                for k, (c, s, p) in zip(ks, dft_power_seq(y, ks)):
                    out["doc_id"].append(doc)
                    out["k"].append(k)
                    out["c"].append(c)
                    out["s"].append(s)
                    out["power"].append(p)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "k": pa.array(out["k"], type=pa.int32()),
                    "c": pa.array(out["c"], type=pa.float64()),
                    "s": pa.array(out["s"], type=pa.float64()),
                    "power": pa.array(out["power"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "k": pa.int32(), "c": pa.float64(),
             "s": pa.float64(), "power": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS m
        FROM l
    ),
    cs AS (
        SELECT doc_id, n, CAST(kk.k AS INTEGER) AS k,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * cos(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)), {_FOLD}) AS c,
            list_reduce(list_transform(
                generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m)
                     * sin(2.0e0 * pi() * kk.k
                           * CAST(i - 1 AS DOUBLE) / n)), {_FOLD}) AS s
        FROM st CROSS JOIN
             (SELECT unnest(generate_series(1, {max_k})) AS k) kk
    )
    SELECT doc_id, k, c, s, (c * c + s * s) / n AS power
    FROM cs
    """
    return q, sql


def _complexity_query(width: int, lag: int = 1):
    """CID-CE (unnormalized), c3 and time-reversal asymmetry at lag 1
    per doc — sequential-fold kernels (kernels/features.py)."""

    def q(sf_dir: str):
        from ..kernels.features import (
            c3,
            cid_ce,
            time_reversal_asymmetry_statistic,
        )

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "cid_ce": [], "c3": [], "trev": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["cid_ce"].append(cid_ce(y))
                out["c3"].append(c3(y, lag))
                out["trev"].append(
                    time_reversal_asymmetry_statistic(y, lag)
                )
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "cid_ce": pa.float64(),
             "c3": pa.float64(), "trev": pa.float64()},
        )

    assert lag == 1, "SQL below written for lag 1"
    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id,
           sqrt(list_reduce(list_transform(
               generate_series(2, CAST(n AS INTEGER)),
               i -> (ms[i] - ms[i - 1]) * (ms[i] - ms[i - 1])),
               {_FOLD})) AS cid_ce,
           CASE WHEN n <= 2 THEN 0.0e0 ELSE
               list_reduce(list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> ms[i + 2] * ms[i + 1] * ms[i]), {_FOLD})
               / CAST(n - 2 AS DOUBLE) END AS c3,
           CASE WHEN n <= 2 THEN 0.0e0 ELSE
               list_reduce(list_transform(
                   generate_series(1, CAST(n - 2 AS INTEGER)),
                   i -> ms[i + 2] * ms[i + 2] * ms[i + 1]
                        - ms[i + 1] * ms[i] * ms[i]), {_FOLD})
               / CAST(n - 2 AS DOUBLE) END AS trev
    FROM l
    """
    return q, sql


def _change_features_query(width: int, support: int = 2):
    """Change + counting features per doc: mean_change, mean_abs_change,
    absolute_sum_of_changes, mean_second_derivative_central (sequential
    folds), number_peaks, crossings of the mean, longest strikes and
    above/below-mean counts (integer outputs; kernels/features.py;
    src/features/change.rs + counting.rs)."""

    def q(sf_dir: str):
        from ..kernels import features as F

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "mean_change": [], "mean_abs_change": [],
                   "abs_sum_changes": [], "msdc": [], "n_peaks": [],
                   "n_cross_mean": [], "strike_above": [],
                   "strike_below": [], "cnt_above": [], "cnt_below": []}
            for doc, y in _doc_series_rows(t, width):
                m = float(np.cumsum(y)[-1]) / y.size
                out["doc_id"].append(doc)
                out["mean_change"].append(F.mean_change(y))
                out["mean_abs_change"].append(F.mean_abs_change(y))
                out["abs_sum_changes"].append(F.absolute_sum_of_changes(y))
                out["msdc"].append(F.mean_second_derivative_central(y))
                out["n_peaks"].append(F.number_peaks(y, support))
                out["n_cross_mean"].append(F.number_crossing_m(y, m))
                out["strike_above"].append(F.longest_strike_above_mean(y))
                out["strike_below"].append(F.longest_strike_below_mean(y))
                out["cnt_above"].append(F.count_above_mean(y))
                out["cnt_below"].append(F.count_below_mean(y))
            ints = {"n_peaks", "n_cross_mean", "strike_above",
                    "strike_below", "cnt_above", "cnt_below"}
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else (pa.int64() if k in ints
                                   else pa.float64()))
                 for k, v in out.items()}
            )

        schema = {"doc_id": pa.string(), "mean_change": pa.float64(),
                  "mean_abs_change": pa.float64(),
                  "abs_sum_changes": pa.float64(), "msdc": pa.float64(),
                  "n_peaks": pa.int64(), "n_cross_mean": pa.int64(),
                  "strike_above": pa.int64(), "strike_below": pa.int64(),
                  "cnt_above": pa.int64(), "cnt_below": pa.int64()}
        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            schema,
        )

    sp = support
    peak_conds = " AND ".join(
        f"ms[i] > ms[i - {j}] AND ms[i] > ms[i + {j}]"
        for j in range(1, sp + 1)
    )
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS m
        FROM l
    )
    SELECT doc_id,
        (ms[CAST(n AS INTEGER)] - ms[1]) / CAST(n - 1 AS DOUBLE)
            AS mean_change,
        list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
            i -> abs(ms[i] - ms[i - 1])), {_FOLD})
            / CAST(n - 1 AS DOUBLE) AS mean_abs_change,
        list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
            i -> abs(ms[i] - ms[i - 1])), {_FOLD}) AS abs_sum_changes,
        CASE WHEN n < 3 THEN 'nan'::DOUBLE ELSE
            list_reduce(list_transform(
                generate_series(1, CAST(n - 2 AS INTEGER)),
                i -> ms[i + 2] - 2.0e0 * ms[i + 1] + ms[i]), {_FOLD})
            / CAST(n - 2 AS DOUBLE) / 2.0e0 END AS msdc,
        CASE WHEN n < {2 * sp + 1} THEN 0 ELSE
            CAST(len(list_filter(
                generate_series({sp + 1}, CAST(n - {sp} AS INTEGER)),
                i -> {peak_conds})) AS BIGINT) END AS n_peaks,
        CAST(len(list_filter(generate_series(2, CAST(n AS INTEGER)),
            i -> (ms[i] > m) != (ms[i - 1] > m))) AS BIGINT)
            AS n_cross_mean,
        list_reduce(
            list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                list_transform(ms,
                    x -> [CAST(x > m AS BIGINT), CAST(0 AS BIGINT)])),
            (acc, e) -> CASE WHEN e[1] = 1
                THEN [acc[1] + 1, GREATEST(acc[2], acc[1] + 1)]
                ELSE [CAST(0 AS BIGINT), acc[2]] END
        )[2] AS strike_above,
        list_reduce(
            list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                list_transform(ms,
                    x -> [CAST(x < m AS BIGINT), CAST(0 AS BIGINT)])),
            (acc, e) -> CASE WHEN e[1] = 1
                THEN [acc[1] + 1, GREATEST(acc[2], acc[1] + 1)]
                ELSE [CAST(0 AS BIGINT), acc[2]] END
        )[2] AS strike_below,
        CAST(len(list_filter(ms, x -> x > m)) AS BIGINT) AS cnt_above,
        CAST(len(list_filter(ms, x -> x < m)) AS BIGINT) AS cnt_below
    FROM st
    """
    return q, sql


def _seasonal_strength_query(width: int, period: int = 4,
                             threshold: float = 0.64):
    """Classical-decomposition seasonal strength + detect_seasonality per
    doc (kernels/detection.seasonal_strength; seasonality.rs:163-220).

    The centered 2xm-MA trend is a PREFIX-SUM DIFFERENCE in the kernel
    (c[i+h] - c[i-h+1]) — the oracle rebuilds the same cumsum list and
    subtracts (not a direct window sum; rounding differs). Slot means
    accumulate in series order (np.add.at == ordered fold); variances are
    sequential population folds."""

    def q(sf_dir: str):
        from ..kernels.detection import detect_seasonality, seasonal_strength

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "strength": [], "seasonal": []}
            for doc, y in _doc_series_rows(t, width):
                st = seasonal_strength(y, period)
                out["doc_id"].append(doc)
                out["strength"].append(st)
                out["seasonal"].append(detect_seasonality(y, period,
                                                          threshold))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "strength": pa.array(out["strength"],
                                         type=pa.float64()),
                    "seasonal": pa.array(out["seasonal"], type=pa.bool_()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "strength": pa.float64(),
             "seasonal": pa.bool_()},
        )

    assert period % 2 == 0, "SQL below spelled for the even-period 2xm-MA"
    m = period
    h = period // 2
    sql = f"""
    {_series_list_sql(width)},
    cum AS (
        -- cums[j] = sum of the first j-1 elements (cums[1] = 0), built as
        -- sequential folds so the prefix-difference trend is bitwise
        SELECT doc_id, ms, n,
               list_prepend(0.0e0,
                   list_transform(generate_series(1, CAST(n AS INTEGER)),
                       j -> list_reduce(ms[1:j], {_FOLD}))) AS cums
        FROM l
    ),
    det AS (
        -- valid positions p in [h+1, n-h]; detrended_p = ms[p] - trend_p
        SELECT doc_id, n, ms,
               list_transform(generate_series({h + 1}, CAST(n - {h} AS INTEGER)),
                   p -> ms[p] - (0.5e0 * ms[p - {h}] + 0.5e0 * ms[p + {h}]
                                 + (cums[p + {h}] - cums[p - {h} + 1]))
                        / {m}.0e0) AS dt,
               generate_series({h + 1}, CAST(n - {h} AS INTEGER)) AS ps
        FROM cum WHERE n >= {2 * m}
    ),
    slots AS (
        SELECT doc_id, n, dt, ps,
               list_transform(generate_series(0, {m - 1}), sl ->
                   list_reduce(
                       [dt[i] FOR i IN generate_series(1, len(ps))
                        IF (ps[i] - 1) % {m} = sl], {_FOLD})
                   / len([1 FOR i IN generate_series(1, len(ps))
                          IF (ps[i] - 1) % {m} = sl])) AS seas
        FROM det
    ),
    cent AS (
        SELECT doc_id, n, dt, ps, seas,
               list_reduce(seas, {_FOLD}) / {m}.0e0 AS smean
        FROM slots
    ),
    rem AS (
        SELECT doc_id, n, dt,
               list_transform(generate_series(1, CAST(len(ps) AS INTEGER)),
                   i -> dt[i] - (seas[(ps[i] - 1) % {m} + 1] - smean)) AS rm,
               CAST(len(dt) AS BIGINT) AS nd
        FROM cent
    ),
    vars AS (
        SELECT doc_id, nd,
               list_reduce(dt, {_FOLD}) / nd AS md,
               list_reduce(rm, {_FOLD}) / nd AS mr,
               dt, rm
        FROM rem
    ),
    strg AS (
        SELECT doc_id,
               list_reduce(list_transform(dt, x -> (x - md) * (x - md)),
                           {_FOLD}) / nd AS var_dt,
               list_reduce(list_transform(rm, x -> (x - mr) * (x - mr)),
                           {_FOLD}) / nd AS var_r
        FROM vars
    ),
    fin AS (
        SELECT doc_id,
               CASE WHEN var_dt < 1e-12 THEN 0.0e0
                    ELSE GREATEST(0.0e0, 1.0e0 - var_r / var_dt) END AS s
        FROM strg
    )
    SELECT l.doc_id, COALESCE(fin.s, 0.0e0) AS strength,
           COALESCE(fin.s, 0.0e0) >= {threshold}e0 AS seasonal
    FROM l LEFT JOIN fin ON fin.doc_id = l.doc_id
    """
    return q, sql


def build_wave9_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_dft_power",) + _dft_query(8)))
    add(*(("doc_complexity",) + _complexity_query(8)))
    add(*(("doc_change_features",) + _change_features_query(8)))
    add(*(("doc_seasonal_strength",) + _seasonal_strength_query(8)))
    return queries, oracles
