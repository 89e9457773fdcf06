"""Eleventh query wave: the three remaining composite/optimizer models as
driver queries — MFLES, TBATS (fixed config), and the MSTL forecaster.

None are SQL-expressible (boosted lstsq rounds / Nelder-Mead state-space
fit / iterative STL inner loops), so each is verified by an independent
sequential golden oracle in ``tools/golden_oracles.py``: pipeline wiring
(query output == direct in-process fit), an independent recomputation of
the forecast from the fitted state with plain-Python math, and structural
identities (fitted + residuals == y, NaN surface for short docs).

Reference parity targets:
- MFLES  src/models/mfles.rs:29-900
- TBATS  src/models/tbats/model.rs:41-780
- MSTL   src/models/mstl_forecaster.rs:68-300
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _forecast_query, _series_list_sql, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows

_FOLD = "(acc, x) -> acc + x"

# TBATS query config: no Box-Cox and K=1 keep every quantity in the
# original space so the golden oracle can replay the AIC / residual
# identities without transform round-off.
TBATS_KW = {"periods": (4,), "use_box_cox": False, "fourier_k": (1,)}
MFLES_KW = {"season_length": 4}
MSTL_KW = {"periods": (4,)}


def _dist_features_query(width: int):
    """Distribution features per doc (distribution.rs:10-153): adjusted
    Fisher-Pearson skewness, bias-adjusted excess kurtosis, variation
    coefficient, ratio beyond 1 sigma. The kernels fold sequentially
    (cumsum) with explicit z*z*z / (zz)*(zz) powers, so the DuckDB
    list_reduce oracle is bitwise."""

    def q(sf_dir: str):
        from ..kernels.features import (
            kurtosis,
            ratio_beyond_r_sigma,
            skewness,
            variation_coefficient,
        )

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "skewness": [], "kurtosis": [],
                   "variation_coefficient": [], "ratio_beyond_1sigma": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["skewness"].append(skewness(y))
                out["kurtosis"].append(kurtosis(y))
                out["variation_coefficient"].append(
                    variation_coefficient(y)
                )
                out["ratio_beyond_1sigma"].append(
                    ratio_beyond_r_sigma(y, 1.0)
                )
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "skewness": pa.float64(),
             "kurtosis": pa.float64(),
             "variation_coefficient": pa.float64(),
             "ratio_beyond_1sigma": pa.float64()},
        )

    z = "((x - m) / s)"
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS m
        FROM l WHERE n >= 4
    ),
    v AS (
        SELECT doc_id, ms, n, m,
               sqrt(list_reduce(
                   list_transform(ms, x -> (x - m) * (x - m)), {_FOLD})
                   / n) AS s
        FROM st
    )
    SELECT doc_id,
           CASE WHEN s < 1e-10 THEN 0.0e0
                ELSE n / ((n - 1) * (n - 2))
                     * list_reduce(list_transform(
                           ms, x -> {z} * {z} * {z}), {_FOLD})
           END AS skewness,
           CASE WHEN s < 1e-10 THEN 'nan'::DOUBLE
                ELSE n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))
                     * list_reduce(list_transform(
                           ms, x -> ({z} * {z}) * ({z} * {z})), {_FOLD})
                     - 3.0e0 * ((n - 1) * (n - 1)) / ((n - 2) * (n - 3))
           END AS kurtosis,
           CASE WHEN abs(m) < 1e-10 THEN 'nan'::DOUBLE
                ELSE s / m END AS variation_coefficient,
           list_reduce(list_transform(
               ms, x -> CASE WHEN abs(x - m) > 1.0e0 * s
                        THEN 1 ELSE 0 END), {_FOLD}) / n
               AS ratio_beyond_1sigma
    FROM v
    """
    return q, sql


def _period_acf_query(width: int, threshold: float = 0.3):
    """ACF-based period detection per doc (detection.rs / periodicity
    family): best period = highest ACF local maximum above threshold
    (kernels/detection.detect_period_acf). The ACF sums fold
    sequentially and the argmax-over-local-maxima scan is replayed in
    SQL as a [best_p, best_v] list fold, so period AND confidence are
    bitwise."""

    def q(sf_dir: str):
        from ..kernels.detection import detect_period_acf

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "period": [], "confidence": []}
            for doc, y in _doc_series_rows(t, width):
                p, c = detect_period_acf(y)
                out["doc_id"].append(doc)
                out["period"].append(int(p))
                out["confidence"].append(float(c))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "period": pa.array(out["period"], type=pa.int64()),
                    "confidence": pa.array(out["confidence"],
                                           type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "period": pa.int64(),
             "confidence": pa.float64()},
        )

    th = f"{threshold}e0"
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               least(n // 2, n - 2) AS maxp,
               list_reduce(ms, {_FOLD}) / n AS m
        FROM l WHERE n >= 4
    ),
    v AS (
        SELECT doc_id, ms, n, maxp, m,
               list_reduce(list_transform(ms, x -> (x - m) * (x - m)),
                           {_FOLD}) AS var
        FROM st
    ),
    rk AS (
        SELECT v.doc_id, v.maxp, kk.k,
               CASE WHEN v.var < 1e-12 THEN 0.0e0
                    ELSE list_reduce(list_transform(
                             generate_series(1, CAST(v.n - kk.k AS INTEGER)),
                             i -> (v.ms[i] - v.m) * (v.ms[i + kk.k] - v.m)),
                             {_FOLD}) / v.var
               END AS r
        FROM v CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1,
                CAST(v.maxp + 1 AS INTEGER))) AS k) kk
    ),
    peaks AS (
        -- the kernel scans p ascending with a strict v > best_v update:
        -- the winner is the max-r local maximum above threshold, ties
        -- going to the SMALLEST p -> ORDER BY r DESC, k ASC
        SELECT a.doc_id, a.k, a.r,
               row_number() OVER (PARTITION BY a.doc_id
                                  ORDER BY a.r DESC, a.k ASC) AS rn
        FROM rk a
        JOIN rk pm ON pm.doc_id = a.doc_id AND pm.k = a.k - 1
        JOIN rk pp ON pp.doc_id = a.doc_id AND pp.k = a.k + 1
        WHERE a.k >= 2 AND a.k <= a.maxp
          AND a.r > {th} AND a.r >= pm.r AND a.r >= pp.r
    )
    SELECT s.doc_id,
           COALESCE(CAST(p.k AS BIGINT), 0) AS period,
           COALESCE(p.r, 0.0e0) AS confidence
    FROM st s LEFT JOIN peaks p ON p.doc_id = s.doc_id AND p.rn = 1
    """
    return q, sql


def _ewm_var_query(width: int, alpha: float = 0.5):
    """Per-window EWM variance + std (window.rs:247-280 recurrence
    v[t] = (1-a)*(v[t-1] + a*d*d), d = y[t]-m[t-1], v[0]=0) over each
    doc's w{width} mean series — kernels/windows.ewm_var/ewm_std. The
    oracle replays BOTH recurrences in one recursive CTE; the a*d*d
    product is spelled left-associatively on both sides."""

    def q(sf_dir: str):
        from ..kernels.windows import ewm_std, ewm_var

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "window_id": [], "ewm_var": [],
                   "ewm_std": []}
            for doc, y in _doc_series_rows(t, width, min_points=1):
                v = ewm_var(y, alpha)
                s = ewm_std(y, alpha)
                out["doc_id"].extend([doc] * y.size)
                out["window_id"].extend(range(y.size))
                out["ewm_var"].extend(v.tolist())
                out["ewm_std"].extend(s.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "ewm_var": pa.array(out["ewm_var"], type=pa.float64()),
                    "ewm_std": pa.array(out["ewm_std"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "ewm_var": pa.float64(), "ewm_std": pa.float64()},
        )

    from .queries import SQL_TOK

    a = f"{alpha}e0"
    sql = f"""
    WITH RECURSIVE tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    r AS (
        SELECT doc_id, wid, m AS ewm, 0.0e0 AS v FROM w WHERE wid = 0
        UNION ALL
        SELECT w.doc_id, w.wid,
               {a} * w.m + (1.0e0 - {a}) * r.ewm,
               (1.0e0 - {a})
                   * (r.v + {a} * (w.m - r.ewm) * (w.m - r.ewm))
        FROM r JOIN w ON w.doc_id = r.doc_id AND w.wid = r.wid + 1
    )
    SELECT doc_id, CAST(wid AS BIGINT) AS window_id,
           v AS ewm_var, sqrt(v) AS ewm_std
    FROM r
    """
    return q, sql


def _autocorr_features_query(width: int, max_lag: int = 4):
    """agg_autocorrelation (mean over lags 1..4, NaN lags dropped) +
    time-reversal asymmetry at lags 1 and 2 (autocorrelation.rs:14-40,
    tsfresh trev). The per-lag ACF folds sequentially; the lag mean
    averages <= 4 values (numpy sums under 8 elements are already left
    folds); trev's combined a*a*b - b*c*c term folds per element."""

    def q(sf_dir: str):
        from ..kernels.features import (
            agg_autocorrelation,
            time_reversal_asymmetry_statistic,
        )

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "agg_acf_mean": [], "trev1": [],
                   "trev2": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["agg_acf_mean"].append(
                    agg_autocorrelation(y, max_lag, "mean")
                )
                out["trev1"].append(
                    time_reversal_asymmetry_statistic(y, 1)
                )
                out["trev2"].append(
                    time_reversal_asymmetry_statistic(y, 2)
                )
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "agg_acf_mean": pa.array(out["agg_acf_mean"],
                                             type=pa.float64()),
                    "trev1": pa.array(out["trev1"], type=pa.float64()),
                    "trev2": pa.array(out["trev2"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "agg_acf_mean": pa.float64(),
             "trev1": pa.float64(), "trev2": pa.float64()},
        )

    def trev(lag: int) -> str:
        return f"""
           CASE WHEN n <= {2 * lag} THEN 0.0e0
                ELSE list_reduce(list_transform(
                         generate_series(1, CAST(n - {2 * lag} AS INTEGER)),
                         i -> (ms[i + {2 * lag}] * ms[i + {2 * lag}])
                              * ms[i + {lag}]
                              - (ms[i + {lag}] * ms[i]) * ms[i]),
                         {_FOLD}) / (n - {2 * lag})
           END"""

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS m
        FROM l WHERE n >= 4
    ),
    v AS (
        SELECT doc_id, ms, n, m,
               list_reduce(list_transform(ms, x -> (x - m) * (x - m)),
                           {_FOLD}) / n AS var
        FROM st
    ),
    rk AS (
        SELECT v.doc_id, kk.k,
               list_reduce(list_transform(
                   generate_series(1, CAST(v.n - kk.k AS INTEGER)),
                   i -> (v.ms[i] - v.m) * (v.ms[i + kk.k] - v.m)),
                   {_FOLD}) / (v.n * v.var) AS r
        FROM v CROSS JOIN (SELECT unnest(generate_series(1, {max_lag}))
                           AS k) kk
        WHERE kk.k < v.n AND v.var >= 1e-10
    ),
    agg AS (
        SELECT doc_id,
               list_reduce(list(r ORDER BY k), {_FOLD}) / count(*)
                   AS acf_mean
        FROM rk GROUP BY doc_id
    )
    SELECT v.doc_id,
           COALESCE(a.acf_mean, 'nan'::DOUBLE) AS agg_acf_mean,
           {trev(1)} AS trev1,
           {trev(2)} AS trev2
    FROM v LEFT JOIN agg a ON a.doc_id = v.doc_id
    """
    return q, sql


def _retention_expire_query(width: int = 8, keep_last: int = 4):
    """Retention expiry over the tiered store: keep each doc's last
    ``keep_last`` w{width} windows (pipelines/retention.apply_retention —
    broadcast cutoff map + vectorized filter, store rows never shuffle).
    Reuses the same /tmp store as retention_range_read (resume-aware).
    Oracle = rollup SQL joined against the per-doc max window."""

    def q(sf_dir: str):
        import os

        import pyarrow.parquet as pq
        import ray

        from ..config import SMALL_TIERS, EngineConfig
        from ..pipelines.flagship import run_flagship
        from ..pipelines.retention import apply_retention

        tag = os.path.basename(os.path.normpath(sf_dir))
        store = f"/tmp/retention_store_{tag}"
        corpus = f"{store}_corpus.parquet"
        if not os.path.exists(corpus):
            refs = corpus_ds(sf_dir).to_arrow_refs()
            t = pa.concat_tables([ray.get(r) for r in refs])
            pq.write_table(t, corpus + ".part")
            os.replace(corpus + ".part", corpus)
        run_flagship(
            corpus, store, EngineConfig(tiers=SMALL_TIERS), n_shards=1,
            with_forecast=False, with_gorilla=False, resume=True,
        )
        ds = apply_retention(
            store, tier=f"w{width}", keep_last=keep_last,
            columns=["doc_id", "window_id", "cnt", "sum", "mean"],
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "cnt": pa.int64(), "sum": pa.int64(), "mean": pa.float64()},
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(token) AS BIGINT) AS "sum",
               CAST(sum(token) AS DOUBLE) / count(*) AS mean
        FROM tok GROUP BY doc_id, window_id
    ),
    mx AS (SELECT doc_id, max(window_id) AS mw FROM w GROUP BY doc_id)
    SELECT w.doc_id, w.window_id, w.cnt, w."sum", w.mean
    FROM w JOIN mx USING (doc_id)
    WHERE w.window_id >= mx.mw - {keep_last - 1}
    """
    return q, sql


def _welch_power_query(width: int = 8, window_size: int = 16,
                       overlap: float = 0.5, max_k: int = 4):
    """Welch averaged modified periodogram (fft.rs:147-200) at integer
    frequencies 1..max_k of each doc's w{width} mean series, via the
    sequential-scalar path (kernels/detection.welch_power_seq) whose
    Hann/DFT/average arithmetic the DuckDB oracle replays bitwise. The
    FFT welch_periodogram is the scale path, pinned to this one per bin
    at 1e-8 in pytest."""
    M = window_size
    step = max(1, int(M * (1.0 - overlap)))

    def q(sf_dir: str):
        from ..kernels.detection import welch_power_seq

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "k": [], "power": []}
            for doc, y in _doc_series_rows(t, width):
                r = welch_power_seq(y, M, overlap, range(1, max_k + 1))
                if r is None:
                    continue
                for k, p in r:
                    out["doc_id"].append(doc)
                    out["k"].append(k)
                    out["power"].append(p)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "k": pa.array(out["k"], type=pa.int32()),
                    "power": pa.array(out["power"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "k": pa.int32(),
             "power": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    seg AS (
        SELECT l.doc_id, l.ms, st.s
        FROM l CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, CAST(l.n - {M} AS INTEGER),
                                          {step})) AS s) st
        WHERE l.n >= {M}
    ),
    segm AS (
        SELECT doc_id, s, ms,
               list_reduce(ms[s + 1 : s + {M}], {_FOLD}) / {M} AS m
        FROM seg
    ),
    trig AS (
        SELECT g.doc_id, g.s, kk.k,
               list_reduce(list_transform(
                   generate_series(0, {M - 1}),
                   j -> (g.ms[g.s + j + 1] - g.m)
                        * (0.5e0 - 0.5e0 * cos(2.0e0 * pi() * j
                                               / {M - 1}))
                        * cos(2.0e0 * pi() * kk.k * j / {M})),
                   {_FOLD}) AS c,
               list_reduce(list_transform(
                   generate_series(0, {M - 1}),
                   j -> (g.ms[g.s + j + 1] - g.m)
                        * (0.5e0 - 0.5e0 * cos(2.0e0 * pi() * j
                                               / {M - 1}))
                        * sin(2.0e0 * pi() * kk.k * j / {M})),
                   {_FOLD}) AS sn
        FROM segm g CROSS JOIN (SELECT unnest(generate_series(1, {max_k}))
                                AS k) kk
    )
    SELECT doc_id, CAST(k AS INTEGER) AS k,
           list_reduce(list((c * c + sn * sn) / {M} ORDER BY s), {_FOLD})
               / count(*) AS power
    FROM trig GROUP BY doc_id, k
    """
    return q, sql


def _sample_entropy_query(width: int = 32, m: int = 2):
    """Sample entropy -ln(A/B) (entropy.rs:14-30) of each doc's
    w{width} mean series — the O(n²) template-match family with a HARD
    check at the scale its documented >2000-point subsampling never
    triggers. Match counts are integers; r = 0.2·std folds sequentially,
    so the only float compare (Chebyshev distance <= r) is bitwise."""

    def q(sf_dir: str):
        from ..kernels.features import sample_entropy

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "sampen": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["sampen"].append(sample_entropy(y, m))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "sampen": pa.array(out["sampen"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "sampen": pa.float64()},
        )

    def pair_count(mm: int, alias: str) -> str:
        return f"""
    {alias} AS (
        SELECT v.doc_id, CAST(count(*) AS BIGINT) AS c
        FROM v
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                1, CAST(v.n - {mm} - 1 AS INTEGER))) AS i) ii
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                ii.i + 1, CAST(v.n - {mm} AS INTEGER))) AS j) jj
        WHERE list_max(list_transform(
                  generate_series(0, {mm - 1}),
                  t -> abs(v.ms[ii.i + t] - v.ms[jj.j + t]))) <= v.r
        GROUP BY v.doc_id
    )"""

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS mu
        FROM l WHERE n >= 4
    ),
    v AS (
        SELECT doc_id, ms, n,
               0.2e0 * sqrt(list_reduce(
                   list_transform(ms, x -> (x - mu) * (x - mu)), {_FOLD})
                   / n) AS r
        FROM st
    ),{pair_count(m, "pb")},{pair_count(m + 1, "pa")}
    SELECT v.doc_id,
           CASE WHEN COALESCE(a.c, 0) = 0 OR COALESCE(b.c, 0) = 0
                THEN 'nan'::DOUBLE
                ELSE -ln(CAST(2 * a.c AS DOUBLE) / (2 * b.c))
           END AS sampen
    FROM v
    LEFT JOIN pb b ON b.doc_id = v.doc_id
    LEFT JOIN pa a ON a.doc_id = v.doc_id
    """
    return q, sql


def _approx_entropy_query(width: int = 32, m: int = 2):
    """Approximate entropy phi(m) - phi(m+1) (entropy.rs:60-110) of each
    doc's w{width} mean series: c_i counts include self (>= 1, so the
    log never sees 0), the per-template log sum folds in template order,
    and r = 0.2·std folds sequentially — all bitwise in SQL."""

    def q(sf_dir: str):
        from ..kernels.features import approximate_entropy

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "apen": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["apen"].append(approximate_entropy(y, m))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "apen": pa.array(out["apen"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "apen": pa.float64()},
        )

    def phi_cte(mm: int, tag: str) -> str:
        return f"""
    c{tag} AS (
        SELECT v.doc_id, CAST(v.n - {mm} + 1 AS BIGINT) AS nt, ii.i,
               CAST(count(*) AS BIGINT) AS c
        FROM v
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                1, CAST(v.n - {mm} + 1 AS INTEGER))) AS i) ii
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                1, CAST(v.n - {mm} + 1 AS INTEGER))) AS j) jj
        WHERE list_max(list_transform(
                  generate_series(0, {mm - 1}),
                  t -> abs(v.ms[ii.i + t] - v.ms[jj.j + t]))) <= v.r
        GROUP BY v.doc_id, nt, ii.i
    ),
    p{tag} AS (
        SELECT doc_id,
               list_reduce(list(ln(CAST(c AS DOUBLE) / nt) ORDER BY i),
                           {_FOLD}) / any_value(nt) AS phi
        FROM c{tag} GROUP BY doc_id
    )"""

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS mu
        FROM l WHERE n >= 4
    ),
    v AS (
        SELECT doc_id, ms, n,
               0.2e0 * sqrt(list_reduce(
                   list_transform(ms, x -> (x - mu) * (x - mu)), {_FOLD})
                   / n) AS r
        FROM st
    ),{phi_cte(m, "m")},{phi_cte(m + 1, "m1")}
    SELECT v.doc_id, pm.phi - pm1.phi AS apen
    FROM v
    JOIN pm ON pm.doc_id = v.doc_id
    JOIN pm1 ON pm1.doc_id = v.doc_id
    """
    return q, sql


def _perm_entropy_query(width: int = 8, order: int = 3, delay: int = 1):
    """Permutation entropy (entropy.rs:119-150) of each doc's w{width}
    mean series: ordinal-pattern codes from STABLE ranks (ties broken by
    position, matching argsort(argsort(kind='stable'))), integer counts,
    -sum p ln p over codes ascending (<= order! = 6 patterns, so numpy's
    sum is already a left fold)."""

    def q(sf_dir: str):
        from ..kernels.features import permutation_entropy

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "perm_entropy": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["perm_entropy"].append(
                    permutation_entropy(y, order, delay)
                )
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "perm_entropy": pa.array(out["perm_entropy"],
                                             type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "perm_entropy": pa.float64()},
        )

    o = order
    # stable rank of element j among the o-window starting at i (1-based
    # list pos): #(strictly smaller anywhere) + #(equal at earlier pos)
    def rank(j: int) -> str:
        less = " + ".join(
            f"(CASE WHEN ms[i + {k}] < ms[i + {j}] THEN 1 ELSE 0 END)"
            for k in range(o)
        )
        eq_before = " + ".join(
            f"(CASE WHEN ms[i + {k}] = ms[i + {j}] THEN 1 ELSE 0 END)"
            for k in range(j)
        ) or "0"
        return f"(({less}) + ({eq_before}))"

    code = rank(0)
    for j in range(1, o):
        code = f"({code} * {o} + {rank(j)})"
    npat = f"(n - {(o - 1) * delay})"
    sql = f"""
    {_series_list_sql(width)},
    pat AS (
        SELECT l.doc_id, {npat} AS n_pat, ii.i, {code} AS code
        FROM l CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                1, CAST(l.n - {(o - 1) * delay} AS INTEGER))) AS i) ii
        WHERE l.n >= {(o - 1) * delay + 1} AND l.n >= 4
    ),
    cnt AS (
        SELECT doc_id, any_value(n_pat) AS n_pat, code,
               CAST(count(*) AS BIGINT) AS c
        FROM pat GROUP BY doc_id, code
    )
    SELECT doc_id,
           -list_reduce(
               list((CAST(c AS DOUBLE) / n_pat)
                    * ln(CAST(c AS DOUBLE) / n_pat) ORDER BY code),
               {_FOLD}) AS perm_entropy
    FROM cnt GROUP BY doc_id
    """
    return q, sql


def _broadcast_join_query():
    """Broadcast hash join (SURVEY §2.5): revenue per customer market
    segment. The small side (customer: custkey -> segment) is ray.put
    ONCE and read inside every map_batches task — the big orders table
    never shuffles; per-batch partials aggregate through the bounded-key
    tree combine (stages/source_rollup pattern). Money is exact integer
    cents on both sides."""

    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from .queries import _num_read_blocks

        import pyarrow.parquet as pq

        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        seg_map = dict(
            zip(cust.column("c_custkey").to_pylist(),
                cust.column("c_mktsegment").to_pylist())
        )
        ref = ray.put(seg_map)

        def partial(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            keys = t.column("o_custkey").to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            segs = [m[k] for k in keys.tolist()]
            g = pa.table(
                {"segment": pa.array(segs), "cents": pa.array(cents)}
            ).group_by("segment").aggregate(
                [("cents", "count"), ("cents", "sum")]
            )
            return pa.table(
                {
                    "segment": g.column("segment"),
                    "cnt": g.column("cents_count").cast(pa.int64()),
                    "revenue_cents": g.column("cents_sum").cast(pa.int64()),
                }
            )

        from ..stages.source_rollup import tree_reduce_tables

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            g = t.to_pandas().groupby("segment", as_index=False).agg(
                cnt=("cnt", "sum"),
                revenue_cents=("revenue_cents", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        final = tree_reduce_tables(refs, merge) if refs else pa.table(
            {"segment": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()),
             "revenue_cents": pa.array([], pa.int64())}
        )
        return _cast(
            rd.from_arrow(final),
            {"segment": pa.string(), "cnt": pa.int64(),
             "revenue_cents": pa.int64()},
        )

    sql = """
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY segment
    """
    return q, sql


def _streaming_event_windows_query():
    """Event-time tumbling minute windows with watermark + late-data
    UPSERT policy (stages/event_stream.py): the log is delivered
    deliberately OUT of order (the earliest 20% of events arrive last,
    far behind the watermark), yet the flushed result is bitwise equal
    to the batch aggregate — the late corrections merge exactly because
    every partial is integer. Oracle = plain minute-rollup SQL."""

    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..stages.event_stream import StreamingEventWindows

        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["ts", "event_type", "value"],
        )
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        feed = pa.table(
            {
                "key": t.column("event_type").cast(pa.string()),
                "ts_us": pa.array(ts_us),
                "cents": pa.array(cents),
            }
        )
        order = np.argsort(ts_us, kind="stable")
        cut = order.size // 5
        arrival = np.concatenate([order[cut:], order[:cut]])
        stream = StreamingEventWindows(
            window_us=60_000_000, allowed_lateness_us=120_000_000,
            n_buckets=3, policy="upsert",
        )
        try:
            step = max(1, arrival.size // 9)
            for off in range(0, arrival.size, step):
                stream.ingest(
                    feed.take(pa.array(arrival[off:off + step]))
                )
            out = stream.flush()
        finally:
            stream.shutdown()
        return pa.table(
            {
                "event_type": out.column("key").cast(pa.string()),
                "window_id": out.column("window_id").cast(pa.int64()),
                "cnt": out.column("cnt").cast(pa.int64()),
                "sum_cents": out.column("sum_cents").cast(pa.int64()),
                "min_cents": out.column("min_cents").cast(pa.int64()),
                "max_cents": out.column("max_cents").cast(pa.int64()),
            }
        )

    sql = """
    SELECT event_type,
           CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60
               AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS min_cents,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events GROUP BY event_type, window_id
    """
    return q, sql


def _streaming_hopping_windows_query():
    """Hopping (sliding) event-time windows: width 2 min, slide 1 min —
    each event lands in two overlapping windows (stages/event_stream,
    slide_us). Same watermark/upsert machinery and out-of-order feed as
    the tumbling query; oracle = per-event unnest over the two covering
    windows."""

    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..stages.event_stream import StreamingEventWindows

        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["ts", "event_type", "value"],
        )
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        feed = pa.table(
            {
                "key": t.column("event_type").cast(pa.string()),
                "ts_us": pa.array(ts_us),
                "cents": pa.array(cents),
            }
        )
        order = np.argsort(ts_us, kind="stable")
        cut = order.size // 5
        arrival = np.concatenate([order[cut:], order[:cut]])
        stream = StreamingEventWindows(
            window_us=120_000_000, slide_us=60_000_000,
            allowed_lateness_us=120_000_000, n_buckets=3,
            policy="upsert",
        )
        try:
            step = max(1, arrival.size // 9)
            for off in range(0, arrival.size, step):
                stream.ingest(
                    feed.take(pa.array(arrival[off:off + step]))
                )
            out = stream.flush()
        finally:
            stream.shutdown()
        return pa.table(
            {
                "event_type": out.column("key").cast(pa.string()),
                "window_id": out.column("window_id").cast(pa.int64()),
                "cnt": out.column("cnt").cast(pa.int64()),
                "sum_cents": out.column("sum_cents").cast(pa.int64()),
                "min_cents": out.column("min_cents").cast(pa.int64()),
                "max_cents": out.column("max_cents").cast(pa.int64()),
            }
        )

    sql = """
    WITH ev AS (
        SELECT event_type,
               CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60
                   AS hi,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    x AS (
        SELECT event_type, ev.hi - o.off AS window_id, cents
        FROM ev CROSS JOIN (SELECT unnest([1, 0]) AS off) o
    )
    SELECT event_type, window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM x GROUP BY event_type, window_id
    """
    return q, sql


def build_wave11_queries():
    queries, oracles = {}, {}
    queries["forecast_mfles_w8"] = _forecast_query(8, "mfles", MFLES_KW, 1)
    queries["forecast_tbats_w8"] = _forecast_query(8, "tbats", TBATS_KW, 1)
    queries["forecast_mstl_w8"] = _forecast_query(8, "mstl", MSTL_KW, 4)
    q, sql = _dist_features_query(8)
    queries["doc_dist_features"] = q
    oracles["doc_dist_features"] = sql
    q, sql = _period_acf_query(8)
    queries["doc_period_acf"] = q
    oracles["doc_period_acf"] = sql
    q, sql = _ewm_var_query(8)
    queries["doc_ewm_var_w8"] = q
    oracles["doc_ewm_var_w8"] = sql
    q, sql = _autocorr_features_query(8)
    queries["doc_autocorr_features"] = q
    oracles["doc_autocorr_features"] = sql
    q, sql = _retention_expire_query(8)
    queries["retention_expire_w8"] = q
    oracles["retention_expire_w8"] = sql
    q, sql = _welch_power_query(8)
    queries["doc_welch_power"] = q
    oracles["doc_welch_power"] = sql
    q, sql = _sample_entropy_query(32)
    queries["doc_sample_entropy_w32"] = q
    oracles["doc_sample_entropy_w32"] = sql
    q, sql = _approx_entropy_query(32)
    queries["doc_approx_entropy_w32"] = q
    oracles["doc_approx_entropy_w32"] = sql
    q, sql = _perm_entropy_query(8)
    queries["doc_perm_entropy"] = q
    oracles["doc_perm_entropy"] = sql
    q, sql = _broadcast_join_query()
    queries["orders_segment_revenue"] = q
    oracles["orders_segment_revenue"] = sql
    q, sql = _streaming_event_windows_query()
    queries["streaming_event_windows"] = q
    oracles["streaming_event_windows"] = sql
    q, sql = _streaming_hopping_windows_query()
    queries["streaming_hopping_windows"] = q
    oracles["streaming_hopping_windows"] = sql

    def repetition_q(sf_dir: str):
        import ray.data as rd

        from ..extras.textstats import RepetitionStatsStage
        from .queries import _num_read_blocks

        return _cast(
            read_cols(sf_dir, "documents", ["doc_id", "text"]).map_batches(RepetitionStatsStage(), batch_format="pyarrow"),
            {"doc_id": pa.string(), "n_words": pa.int64(),
             "distinct_ratio": pa.float64(),
             "dup_word_frac": pa.float64(),
             "top_bigram_frac": pa.float64()},
        )

    from ..extras.textstats import repetition_stats_sql

    # NOTE: wave56 ships the canonical doc_repetition_stats (it silently
    # overwrote this one under the old sequential-update registration; the
    # importlib loop now asserts disjointness, so wave11 registers its
    # variant under a distinct name to keep both testable).
    queries["doc_repetition_stats_v1"] = repetition_q
    oracles["doc_repetition_stats_v1"] = repetition_stats_sql()
    return queries, oracles
