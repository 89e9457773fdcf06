"""Eighth query wave: linear-interpolation gap-fill, sanitize(Fill),
fixed-alpha ADIDA / IMAPA intermittent forecasts, PACF (Durbin-Levinson,
lags 1-3), binned entropy, and per-user frequency inference — each with
an exact DuckDB oracle.

Bitwise notes:
- np.interp's slope form ``(y1-y0)/(x1-x0)*(x-x0)+y0`` is replayed with
  the same op order in SQL.
- ADIDA/IMAPA bucket = round-half-EVEN of the mean inter-demand interval
  (Python round == DuckDB round_even); interval sums are integers so
  their mean is summation-order-free. The intermittent series is a
  deterministic threshold (floor(mean) % 3 == 0) of the window means.
- PACF's Durbin-Levinson inner products are sequential scalar folds in
  the kernel (not BLAS ddot) — lag <= 3 closed forms replay exactly.
- binned_entropy folds p*ln(p) sequentially in bin order (math.log ==
  DuckDB ln, same libm).
- infer_frequency tie-break: np.unique sorts ascending and argmax takes
  the FIRST max -> smallest modal delta wins, ORDER BY cnt DESC, d ASC.

Reference parity: src/core/time_series.rs:608-704 (sanitized),
:1063-1117 (interpolate), src/models/intermittent/adida.rs:12-260,
imapa.rs:38-300, src/features/autocorrelation.rs:47-100 (PACF),
src/features/entropy.rs:198-233 (binned), time_series.rs:770-824
(infer_frequency).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, _series_list_sql, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows

_FOLD = "(acc, x) -> acc + x"
_SES = "(acc, x) -> 0.5e0 * x + 0.5e0 * acc"


def _intermittent(y: np.ndarray) -> np.ndarray:
    """Deterministic intermittent-demand view of a mean series."""
    return np.where(np.floor(y).astype(np.int64) % 3 == 0, y, 0.0)


_SQL_INTERMITTENT = """
    list_transform(ms, x -> CASE WHEN CAST(floor(x) AS BIGINT) % 3 = 0
                                 THEN x ELSE 0.0e0 END)
"""


def _gapfill_linear_query(width: int, modulus: int):
    """Sparse filtered rollup -> dense grid -> linear interior
    interpolation, trailing LOCF, leading NaN dropped — the fused in-row
    operator (stages/gapfill.make_filtered_gapfill_fn, zero shuffle)."""

    def q(sf_dir: str):
        from ..stages.gapfill import make_filtered_gapfill_fn

        ds = corpus_ds(sf_dir).map_batches(
            make_filtered_gapfill_fn(
                width, lambda v: v % modulus == 0, method="linear",
                drop_leading_nan=True,
            ),
            batch_format="pyarrow",
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "mean": pa.float64(), "filled": pa.bool_()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    sparse AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok WHERE token % {modulus} = 0
        GROUP BY doc_id, window_id
    ),
    grid AS (
        SELECT doc_id, unnest(generate_series(0, max(window_id))) AS window_id
        FROM sparse GROUP BY doc_id
    ),
    ctx AS (
        SELECT g.doc_id, g.window_id, s.m,
               last_value(s.m IGNORE NULLS)
                 OVER (PARTITION BY g.doc_id ORDER BY g.window_id) AS pv,
               last_value(s.window_id IGNORE NULLS)
                 OVER (PARTITION BY g.doc_id ORDER BY g.window_id) AS pi,
               first_value(s.m IGNORE NULLS)
                 OVER (PARTITION BY g.doc_id ORDER BY g.window_id
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS nv,
               first_value(s.window_id IGNORE NULLS)
                 OVER (PARTITION BY g.doc_id ORDER BY g.window_id
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS ni
        FROM grid g LEFT JOIN sparse s
          ON g.doc_id = s.doc_id AND g.window_id = s.window_id
    )
    SELECT doc_id, window_id,
           CASE WHEN m IS NOT NULL THEN m
                WHEN ni IS NULL THEN pv
                ELSE (nv - pv) / CAST(ni - pi AS DOUBLE)
                     * CAST(window_id - pi AS DOUBLE) + pv
           END AS mean,
           (m IS NULL) AS filled
    FROM ctx WHERE pv IS NOT NULL
    """
    return q, sql


def _sanitize_fill_query(width: int, modulus: int, fill_value: float = 0.0):
    """fill_gaps_grid + sanitize(policy='fill') per doc: dense grid with
    holes replaced by the fill value (kernels/fillna.sanitize;
    time_series.rs:608-704 Fill policy)."""

    def q(sf_dir: str):
        from ..kernels.fillna import fill_gaps_grid, sanitize
        from ..kernels.rollup import rollup_flat_masked
        from ..stages.rollup import _flat_tokens

        def tx(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            mask = values % modulus == 0
            r = rollup_flat_masked(values, lengths, width, mask)
            ids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "window_id": [], "value": [],
                   "was_missing": []}
            ridx = r["row_idx"]
            if ridx.size:
                keep = r["cnt"] > 0
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    k = keep[s0:s1]
                    if not k.any():
                        continue
                    wid = r["window_id"][s0:s1][k]
                    mean = (r["sum"][s0:s1][k].astype(np.float64)
                            / r["cnt"][s0:s1][k])
                    grid, dense, filled = fill_gaps_grid(wid, mean, start=0)
                    vals, _ = sanitize(dense, "fill", fill_value)
                    doc = ids[ridx[s0]]
                    out["doc_id"].extend([doc] * grid.size)
                    out["window_id"].extend(grid.tolist())
                    out["value"].extend(vals.tolist())
                    out["was_missing"].extend(filled.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "value": pa.array(out["value"], type=pa.float64()),
                    "was_missing": pa.array(out["was_missing"],
                                            type=pa.bool_()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "value": pa.float64(), "was_missing": pa.bool_()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    sparse AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok WHERE token % {modulus} = 0
        GROUP BY doc_id, window_id
    ),
    grid AS (
        SELECT doc_id, unnest(generate_series(0, max(window_id))) AS window_id
        FROM sparse GROUP BY doc_id
    )
    SELECT g.doc_id, g.window_id,
           COALESCE(s.m, {fill_value!r}e0) AS value,
           (s.m IS NULL) AS was_missing
    FROM grid g LEFT JOIN sparse s
      ON g.doc_id = s.doc_id AND g.window_id = s.window_id
    """
    return q, sql


def _adida_query(width: int, alpha: float = 0.5):
    """ADIDA with a FIXED SES alpha over the deterministic intermittent
    series: bucket by round-even(mean interval), SES(0.5) on bucket sums,
    disaggregate (kernels/intermittent.adida_fit; adida.rs:12-260)."""

    def q(sf_dir: str):
        from ..kernels.intermittent import adida_fit

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "yhat": []}
            for doc, y in _doc_series_rows(t, width):
                ys = _intermittent(y)
                try:
                    st = adida_fit(ys, alpha=alpha)
                except ValueError:
                    continue
                out["doc_id"].append(doc)
                out["yhat"].append(st.point)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "yhat": pa.array(out["yhat"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "yhat": pa.float64()},
        )

    assert alpha == 0.5, "SQL fold below pins alpha = 0.5"
    sql = f"""
    {_series_list_sql(width)},
    iv AS (
        SELECT doc_id, n, {_SQL_INTERMITTENT} AS ys
        FROM l
    ),
    nz AS (
        SELECT doc_id, n, ys,
               list_filter(generate_series(1, CAST(n AS INTEGER)),
                           i -> ys[i] > 0.0e0) AS pos
        FROM iv
    ),
    ivals AS (
        SELECT doc_id, n, ys, len(pos) AS np,
               list_prepend(CAST(pos[1] AS DOUBLE),
                   list_transform(generate_series(2, CAST(len(pos) AS INTEGER)),
                       j -> CAST(pos[j] - pos[j - 1] AS DOUBLE))) AS intervals
        FROM nz WHERE len(pos) >= 1
    ),
    bk AS (
        SELECT doc_id, n, ys,
               GREATEST(1, CAST(round_even(
                   list_reduce(intervals, {_FOLD}) / len(intervals), 0
               ) AS BIGINT)) AS b0
        FROM ivals
    ),
    bk2 AS (
        SELECT doc_id, n, ys,
               CASE WHEN n // b0 < 2 THEN GREATEST(1, n // 2)
                    ELSE b0 END AS bucket
        FROM bk
    ),
    agg AS (
        SELECT doc_id, bucket, n // bucket AS nb,
               n - (n // bucket) * bucket AS off, ys
        FROM bk2
    ),
    lev AS (
        SELECT doc_id, bucket,
               list_reduce(
                   list_transform(generate_series(1, CAST(nb AS INTEGER)),
                       j -> list_reduce(
                           ys[CAST(off + (j - 1) * bucket + 1 AS INTEGER)
                              :CAST(off + j * bucket AS INTEGER)],
                           {_FOLD})),
                   {_SES}) AS level
        FROM agg
    )
    SELECT doc_id, level / bucket AS yhat FROM lev
    """
    return q, sql


def _imapa_query(width: int, alpha: float = 0.5, max_levels: int = 3):
    """IMAPA with a FIXED SES alpha: mean of ADIDA points across
    aggregation levels 1..min(3, mean interval), clamped and deduped
    (models.IMAPA; imapa.rs:38-300)."""

    def q(sf_dir: str):
        from ..models import IMAPA

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "yhat": []}
            for doc, y in _doc_series_rows(t, width):
                ys = _intermittent(y)
                try:
                    m = IMAPA(max_levels=max_levels, alpha=alpha).fit(ys)
                except ValueError:
                    continue
                out["doc_id"].append(doc)
                out["yhat"].append(float(m.predict(1)[0]))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "yhat": pa.array(out["yhat"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "yhat": pa.float64()},
        )

    assert alpha == 0.5, "SQL fold below pins alpha = 0.5"
    sql = f"""
    {_series_list_sql(width)},
    iv AS (
        SELECT doc_id, n, {_SQL_INTERMITTENT} AS ys
        FROM l
    ),
    nz AS (
        SELECT doc_id, n, ys,
               list_filter(generate_series(1, CAST(n AS INTEGER)),
                           i -> ys[i] > 0.0e0) AS pos
        FROM iv
    ),
    mi AS (
        SELECT doc_id, n, ys,
               GREATEST(1, CAST(round_even(
                   list_reduce(
                       list_prepend(CAST(pos[1] AS DOUBLE),
                           list_transform(
                               generate_series(2, CAST(len(pos) AS INTEGER)),
                               j -> CAST(pos[j] - pos[j - 1] AS DOUBLE))),
                       {_FOLD})
                   / len(pos), 0) AS BIGINT)) AS mean_int
        FROM nz WHERE len(pos) >= 1
    ),
    lvls AS (
        SELECT DISTINCT doc_id, n, ys,
               LEAST(GREATEST(1, CAST(ll.lv AS BIGINT)),
                     GREATEST(1, n // 2)) AS bucket
        FROM mi CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                1, CAST(LEAST({max_levels}, mean_int) AS INTEGER))) AS lv) ll
    ),
    pts AS (
        SELECT doc_id, bucket,
               list_reduce(
                   list_transform(
                       generate_series(1, CAST(n // bucket AS INTEGER)),
                       j -> list_reduce(
                           ys[CAST(n - (n // bucket) * bucket
                                   + (j - 1) * bucket + 1 AS INTEGER)
                              :CAST(n - (n // bucket) * bucket
                                    + j * bucket AS INTEGER)],
                           {_FOLD})),
                   {_SES}) / bucket AS pt
        FROM lvls WHERE n // bucket >= 2
    )
    SELECT doc_id,
           list_reduce(list(pt ORDER BY bucket), {_FOLD}) / count(*) AS yhat
    FROM pts GROUP BY doc_id
    """
    return q, sql


def _pacf_query(width: int, nlags: int = 3):
    """PACF at lags 1-3 via Durbin-Levinson closed forms
    (kernels/features.partial_autocorrelation — sequential scalar folds;
    autocorrelation.rs:47-100)."""

    def q(sf_dir: str):
        from ..kernels.features import partial_autocorrelation

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "pacf1": [], "pacf2": [], "pacf3": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                for k in (1, 2, 3):
                    out[f"pacf{k}"].append(partial_autocorrelation(y, k))
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "pacf1": pa.float64(),
             "pacf2": pa.float64(), "pacf3": pa.float64()},
        )

    def rk(k):
        return f"""CASE WHEN {k} < n AND var >= 1e-10 THEN
               list_reduce(list_transform(
                   generate_series(1, CAST(n - {k} AS INTEGER)),
                   i -> (ms[i] - m) * (ms[i + {k}] - m)), {_FOLD})
               / (n * var)
           ELSE 0.0e0 END"""

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n, list_reduce(ms, {_FOLD}) / n AS m
        FROM l
    ),
    v AS (
        SELECT doc_id, ms, n, m,
               list_reduce(list_transform(ms, x -> (x - m) * (x - m)),
                           {_FOLD}) / n AS var
        FROM st
    ),
    r AS (
        SELECT doc_id, {rk(1)} AS r1, {rk(2)} AS r2, {rk(3)} AS r3
        FROM v
    ),
    dl2 AS (
        SELECT doc_id, r1, r2, r3,
               CASE WHEN abs(1.0e0 - r1 * r1) > 1e-12
                    THEN (r2 - r1 * r1) / (1.0e0 - r1 * r1)
                    ELSE 0.0e0 END AS phi22
        FROM r
    ),
    dl3 AS (
        SELECT doc_id, r1, r2, r3, phi22,
               r1 - phi22 * r1 AS phi21
        FROM dl2
    )
    SELECT doc_id, r1 AS pacf1, phi22 AS pacf2,
           CASE WHEN abs(1.0e0 - (phi21 * r1 + phi22 * r2)) > 1e-12
                THEN (r3 - (phi21 * r2 + phi22 * r1))
                     / (1.0e0 - (phi21 * r1 + phi22 * r2))
                ELSE 0.0e0 END AS pacf3
    FROM dl3
    """
    return q, sql


def _binned_entropy_query(width: int, max_bins: int = 10):
    """Equal-width histogram entropy of the w{width} mean series
    (kernels/features.binned_entropy; entropy.rs:198-233). p*ln(p) folds
    sequentially in bin order."""

    def q(sf_dir: str):
        from ..kernels.features import binned_entropy

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "entropy": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["entropy"].append(binned_entropy(y, max_bins))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "entropy": pa.array(out["entropy"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "entropy": pa.float64()},
        )

    mb = max_bins
    sql = f"""
    {_series_list_sql(width)},
    rng AS (
        SELECT doc_id, ms, n,
               list_aggregate(ms, 'min') AS lo,
               list_aggregate(ms, 'max') AS hi,
               LEAST({mb}, n) AS nbins
        FROM l
    ),
    binned AS (
        SELECT doc_id, n, nbins,
               LEAST(CAST(floor((u.x - lo) / ((hi - lo) / nbins)) AS BIGINT),
                     nbins - 1) AS bin
        FROM rng, unnest(ms) AS u(x)
        WHERE abs(hi - lo) >= 1e-10
    ),
    cnts AS (
        SELECT doc_id, bin, count(*) AS c, any_value(n) AS n
        FROM binned GROUP BY doc_id, bin
    ),
    ent AS (
        SELECT doc_id,
               -list_reduce(list(
                   (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
                   ORDER BY bin), {_FOLD}) AS entropy
        FROM cnts GROUP BY doc_id
    )
    SELECT rng.doc_id,
           COALESCE(ent.entropy, 0.0e0) AS entropy
    FROM rng LEFT JOIN ent ON ent.doc_id = rng.doc_id
    """
    return q, sql


_US_PER_DAY = 86_400_000_000


def _infer_freq_query():
    """Per-user modal event spacing on DAY-bucketed timestamps
    (kernels/frequency.infer_frequency; time_series.rs:770-824): modal
    delta, tie-break smallest (np.unique sorts + first argmax), modal
    ratio >= the default 0.5 tolerance required — users whose spacing has
    no mode are dropped on BOTH sides, so the rule itself is oracled."""

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.frequency import infer_frequency

        def freq_group(g: pa.Table) -> pa.Table:
            g = g.sort_by([("ts", "ascending"),
                           ("event_id", "ascending")])
            try:
                f = infer_frequency(
                    g.column("ts").to_numpy(zero_copy_only=False)
                    // _US_PER_DAY
                )
            except ValueError:
                return pa.table(
                    {"user_id": pa.array([], type=pa.int64()),
                     "freq_days": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"user_id": pa.array(
                    [int(g.column("user_id")[0].as_py())],
                    type=pa.int64()),
                 "freq_days": pa.array([int(f)], type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "event_id", "ts"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "event_id": t.column("event_id"),
                        "ts": t.column("ts").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("user_id")
            .map_groups(freq_group, batch_format="pyarrow")
        )
        return _cast(ds, {"user_id": pa.int64(), "freq_days": pa.int64()})

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day,
               epoch_us(ts) // {_US_PER_DAY}
               - lag(epoch_us(ts) // {_US_PER_DAY})
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS d
        FROM events
    ),
    diffs AS (SELECT user_id, d FROM e WHERE d IS NOT NULL),
    tot AS (SELECT user_id, count(*) AS total FROM diffs GROUP BY user_id),
    cnts AS (
        SELECT user_id, d, count(*) AS c
        FROM diffs GROUP BY user_id, d
    ),
    best AS (
        SELECT user_id, d, c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, d ASC) AS rn
        FROM cnts
    )
    SELECT b.user_id, CAST(b.d AS BIGINT) AS freq_days
    FROM best b JOIN tot t ON t.user_id = b.user_id
    WHERE b.rn = 1 AND CAST(b.c AS DOUBLE) / t.total >= 0.5
    """
    return q, sql


def build_wave8_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("gapfill_linear_w8",) + _gapfill_linear_query(8, 13)))
    add(*(("doc_sanitize_fill",) + _sanitize_fill_query(8, 13)))
    add(*(("forecast_adida_w8",) + _adida_query(8)))
    add(*(("forecast_imapa_w8",) + _imapa_query(8)))
    add(*(("doc_pacf_w8",) + _pacf_query(8)))
    add(*(("doc_binned_entropy",) + _binned_entropy_query(8)))
    add(*(("events_infer_freq",) + _infer_freq_query()))
    return queries, oracles
