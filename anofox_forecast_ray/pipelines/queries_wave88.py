"""Wave-88 queries: YoY growth and forecast skill sign test.

- orders_yoy_growth: month-over-same-month-last-year revenue growth
  per month (bounded month cells, integer cents; the ratio is the
  only float). Months with no year-ago counterpart emit NaN on both
  sides.
- forecast_cv_sign_test: does SES(0.3) beat naive out of sample? —
  expanding-origin 1-step CV over every doc's w8 mean series:
  at each origin t the SES level folds y[0..t] and both models
  forecast y[t+1]; a doc is an SES WIN if its summed absolute error
  is strictly lower. The corpus-level paired sign test z =
  (wins - losses)/sqrt(wins + losses) ignores ties. The engine
  reuses the ses kernel's sequential recursion per origin; the
  oracle replays each origin's level as a prefix fold (O(m^2) per
  doc, m ~ 40 windows — bounded). Errors are |float| sums folded in
  origin order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows

SES_A = 0.3


# -------------------------------------------------------------- orders_yoy_growth
def _yoy_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if ("o_orderdate" not in t.column_names
                    or t.num_rows == 0):
                return pa.table({
                    "month": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                })
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            sums = np.zeros(uk.size, dtype=np.int64)
            np.add.at(sums, inv, cents)
            return pa.table({
                "month": pa.array(uk),
                "cents": pa.array(sums),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate([("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("month").reset_index(drop=True)
        m0 = int(a["month"].min())
        lut = dict(zip(a["month"].astype(int), a["cents"]))
        months = a["month"].to_numpy(np.int64)
        growth = []
        for mm, cc in zip(months, a["cents"]):
            prev = lut.get(int(mm) - 12)
            if prev is None or int(prev) == 0:
                growth.append(float("nan"))
            else:
                growth.append(float(int(cc)) / float(int(prev))
                              - 1.0)
        return pa.table({
            "month_idx": pa.array(months - m0, type=pa.int64()),
            "cents": pa.array(a["cents"].to_numpy(np.int64)),
            "yoy_growth": pa.array(growth, type=pa.float64()),
        })

    sql = """
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY month
    )
    SELECT CAST(datediff('month', (SELECT min(month) FROM m),
                         a.month) AS BIGINT) AS month_idx,
           a.cents,
           CASE WHEN b.cents IS NULL OR b.cents = 0
                THEN 'nan'::DOUBLE
                ELSE CAST(a.cents AS DOUBLE)
                     / CAST(b.cents AS DOUBLE) - 1.0e0 END
               AS yoy_growth
    FROM m a LEFT JOIN m b
      ON b.month = a.month - INTERVAL 12 MONTH
    """
    return q, sql


# --------------------------------------------------------- forecast_cv_sign_test
def _cv_sign_query(width: int = 8, alpha: float = SES_A):
    def q(sf_dir: str):
        from ..stages.source_rollup import tree_reduce_tables

        def cv(t: pa.Table) -> pa.Table:
            wins = 0
            losses = 0
            ties = 0
            ndocs = 0
            for _doc, y in _doc_series_rows(t, width,
                                            min_points=3):
                m = y.size
                if m < 3:
                    continue
                ndocs += 1
                level = float(y[0])
                e_ses = 0.0
                e_nv = 0.0
                # origins t = 0..m-2: level folds y[0..t]
                for ti in range(m - 1):
                    if ti > 0:
                        level = (alpha * float(y[ti])
                                 + (1.0 - alpha) * level)
                    e_ses = e_ses + abs(float(y[ti + 1]) - level)
                    e_nv = e_nv + abs(float(y[ti + 1])
                                      - float(y[ti]))
                if e_ses < e_nv:
                    wins += 1
                elif e_ses > e_nv:
                    losses += 1
                else:
                    ties += 1
            return pa.table({
                "n_docs": pa.array([ndocs], type=pa.int64()),
                "ses_wins": pa.array([wins], type=pa.int64()),
                "naive_wins": pa.array([losses],
                                       type=pa.int64()),
                "ties": pa.array([ties], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in t.column_names
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(cv, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        w = int(a.column("ses_wins")[0].as_py())
        lo = int(a.column("naive_wins")[0].as_py())
        z = (float(w - lo) / math.sqrt(float(w + lo))
             if w + lo > 0 else 0.0)
        return pa.table({
            "n_docs": pa.array(
                [int(a.column("n_docs")[0].as_py())],
                type=pa.int64()),
            "ses_wins": pa.array([w], type=pa.int64()),
            "naive_wins": pa.array([lo], type=pa.int64()),
            "ties": pa.array(
                [int(a.column("ties")[0].as_py())],
                type=pa.int64()),
            "sign_z": pa.array([z], type=pa.float64()),
        })

    from .queries import _series_list_sql
    aa = f"{alpha}e0"
    sql = f"""
    {_series_list_sql(width, min_points=3)},
    per AS (
        SELECT doc_id,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 1 AS INTEGER)),
                   t -> abs(ms[t + 1] - list_reduce(
                       ms[1:t],
                       (acc, x) -> {aa} * x
                                   + (1.0e0 - {aa}) * acc)))),
                   (a, b) -> a + b) AS e_ses,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(n - 1 AS INTEGER)),
                   t -> abs(ms[t + 1] - ms[t]))),
                   (a, b) -> a + b) AS e_nv
        FROM l
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN e_ses < e_nv THEN 1 ELSE 0 END)
                    AS BIGINT) AS ses_wins,
               CAST(sum(CASE WHEN e_ses > e_nv THEN 1 ELSE 0 END)
                    AS BIGINT) AS naive_wins,
               CAST(sum(CASE WHEN e_ses = e_nv THEN 1 ELSE 0 END)
                    AS BIGINT) AS ties
        FROM per
    )
    SELECT n_docs, ses_wins, naive_wins, ties,
           CASE WHEN ses_wins + naive_wins > 0
                THEN CAST(ses_wins - naive_wins AS DOUBLE)
                     / sqrt(CAST(ses_wins + naive_wins
                                 AS DOUBLE))
                ELSE 0.0e0 END AS sign_z
    FROM agg
    """
    return q, sql


def build_wave88_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_yoy_growth",) + _yoy_query()))
    add(*(("forecast_cv_sign_test",) + _cv_sign_query()))
    return queries, oracles
