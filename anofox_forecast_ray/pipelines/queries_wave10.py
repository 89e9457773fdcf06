"""Tenth query wave: the remaining scale transforms (center / normalize /
scale_to_range), expanding min/max/sum, and the closed-form OLS trend
line — each with an exact DuckDB oracle.

Bitwise notes: the scale and expanding queries run on the INTEGER window
sums (like doc_standardize's integer moments): integer-valued float sums
are order-free and exact, so even numpy's pairwise mean matches the SQL
fold bit-for-bit. The OLS query uses kernels/ols.ols_fit's k=1 Cramer
path, whose sums are already sequential folds.

Reference parity: src/transform/scale.rs:39-120 (center/normalize/
scale_to_range), src/transform/window.rs (expanding), src/utils/ols.rs
(trend fit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _series_list_sql, corpus_ds
from .queries_wave5 import _doc_series_rows

_FOLD = "(acc, x) -> acc + x"


def _doc_sum_series_rows(t: pa.Table, width: int, min_points: int = 4):
    """(doc_id, int window-sum series) per doc — integer-exact values."""
    from ..kernels.rollup import rollup_flat
    from ..stages.rollup import _flat_tokens

    values, lengths = _flat_tokens(t)
    r = rollup_flat(values, lengths, width)
    sums = r["sum"].astype(np.float64)
    ridx = r["row_idx"]
    ids = t.column("doc_id").to_pylist()
    if not ridx.size:
        return
    bounds = np.flatnonzero(np.concatenate(([True], ridx[1:] != ridx[:-1])))
    ends = np.concatenate((bounds[1:], [ridx.size]))
    for s0, s1 in zip(bounds, ends):
        y = sums[s0:s1]
        if y.size >= min_points:
            yield ids[ridx[s0]], y


_SUM_SERIES_CTE = """
    WITH tok AS ({tok}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(s ORDER BY wid) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY doc_id HAVING count(*) >= 4
    )"""


def _scale_suite_query(width: int, lo: float = -1.0, hi: float = 1.0):
    """center / normalize / scale_to_range of the int window-sum series
    (kernels/scale.py; scale.rs:39-120). Zero-variance guard on both
    sides (constant series -> zeros)."""

    def q(sf_dir: str):
        from ..kernels.scale import center, normalize, scale_to_range

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "window_id": [], "centered": [],
                   "norm01": [], "ranged": []}
            for doc, y in _doc_sum_series_rows(t, width):
                c, _mu = center(y)
                n01, mn, mx = normalize(y)
                rg, _, _ = scale_to_range(y, lo, hi)
                out["doc_id"].extend([doc] * y.size)
                out["window_id"].extend(range(y.size))
                out["centered"].extend(c.tolist())
                out["norm01"].extend(n01.tolist())
                out["ranged"].extend(rg.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "centered": pa.array(out["centered"],
                                         type=pa.float64()),
                    "norm01": pa.array(out["norm01"], type=pa.float64()),
                    "ranged": pa.array(out["ranged"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "centered": pa.float64(), "norm01": pa.float64(),
             "ranged": pa.float64()},
        )

    cte = _SUM_SERIES_CTE.format(tok=SQL_TOK, width=width)
    sql = f"""
    {cte},
    st AS (
        SELECT doc_id, ys, n,
               list_reduce(ys, {_FOLD}) / n AS mu,
               list_aggregate(ys, 'min') AS mn,
               list_aggregate(ys, 'max') AS mx
        FROM l
    )
    SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS window_id,
           ys[u.i] - mu AS centered,
           CASE WHEN mx = mn THEN 0.0e0
                ELSE (ys[u.i] - mn) / (mx - mn) END AS norm01,
           CASE WHEN mx = mn THEN 0.0e0 * ({hi}e0 - {lo}e0) + {lo}e0
                ELSE (ys[u.i] - mn) / (mx - mn) * ({hi}e0 - {lo}e0)
                     + {lo}e0 END AS ranged
    FROM st, unnest(generate_series(1, CAST(n AS INTEGER))) AS u(i)
    """
    return q, sql


def _expanding_query(width: int):
    """expanding min / max / sum over the int window-sum series
    (kernels/windows.py; window.rs expanding family)."""

    def q(sf_dir: str):
        from ..kernels.windows import expanding_max, expanding_min, expanding_sum

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "window_id": [], "exp_min": [],
                   "exp_max": [], "exp_sum": []}
            for doc, y in _doc_sum_series_rows(t, width):
                out["doc_id"].extend([doc] * y.size)
                out["window_id"].extend(range(y.size))
                out["exp_min"].extend(
                    expanding_min(y).astype(np.int64).tolist())
                out["exp_max"].extend(
                    expanding_max(y).astype(np.int64).tolist())
                out["exp_sum"].extend(
                    expanding_sum(y).astype(np.int64).tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "exp_min": pa.array(out["exp_min"], type=pa.int64()),
                    "exp_max": pa.array(out["exp_max"], type=pa.int64()),
                    "exp_sum": pa.array(out["exp_sum"], type=pa.int64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "exp_min": pa.int64(), "exp_max": pa.int64(),
             "exp_sum": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    nper AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id)
    SELECT w.doc_id, w.wid AS window_id,
           CAST(min(s) OVER win AS BIGINT) AS exp_min,
           CAST(max(s) OVER win AS BIGINT) AS exp_max,
           CAST(sum(s) OVER win AS BIGINT) AS exp_sum
    FROM w JOIN nper ON nper.doc_id = w.doc_id
    WHERE nper.n >= 4
    WINDOW win AS (PARTITION BY w.doc_id ORDER BY w.wid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    return q, sql


def _ols_trend_query(width: int):
    """Closed-form OLS trend (intercept + slope on x = 0..n-1) of the
    w{width} mean series per doc — kernels/ols.ols_fit's k=1 Cramer path
    (sequential fold sums)."""

    def q(sf_dir: str):
        from ..kernels.ols import ols_fit

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "intercept": [], "slope": []}
            for doc, y in _doc_series_rows(t, width):
                r = ols_fit(y, {"t": np.arange(y.size, dtype=np.float64)})
                out["doc_id"].append(doc)
                out["intercept"].append(float(r.intercept))
                out["slope"].append(float(r.coefficients[0]))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "intercept": pa.array(out["intercept"],
                                          type=pa.float64()),
                    "slope": pa.array(out["slope"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "intercept": pa.float64(),
             "slope": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    s AS (
        SELECT doc_id, CAST(n AS DOUBLE) AS nf,
            list_reduce(ms, {_FOLD}) AS sy,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> CAST(i - 1 AS DOUBLE)), {_FOLD}) AS s1,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> CAST(i - 1 AS DOUBLE) * CAST(i - 1 AS DOUBLE)),
                {_FOLD}) AS s11,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> CAST(i - 1 AS DOUBLE) * ms[i]), {_FOLD}) AS s1y
        FROM l
    )
    SELECT doc_id,
           CASE WHEN nf * s11 - s1 * s1 = 0 THEN sy / nf
                ELSE (sy - (nf * s1y - s1 * sy) / (nf * s11 - s1 * s1) * s1)
                     / nf END AS intercept,
           CASE WHEN nf * s11 - s1 * s1 = 0 THEN 0.0e0
                ELSE (nf * s1y - s1 * sy) / (nf * s11 - s1 * s1) END AS slope
    FROM s
    """
    return q, sql


def build_wave10_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_scale_suite",) + _scale_suite_query(8)))
    add(*(("doc_expanding_stats",) + _expanding_query(8)))
    add(*(("doc_ols_trend",) + _ols_trend_query(8)))
    return queries, oracles
