"""Wave-201 queries: PR-curve average precision, Youden J + MCC.

Classifier-evaluation completion (ROC AUC exists since wave 55's
next-hour family): the classifier is "a user-day with at least
count >= threshold events contains an error", scored over the
bounded (count -> pos, neg) histogram of user-days:

- events_pr_average_precision: the step-interpolated average
  precision AP = sum_t (dTP/P) * (TP/(TP+FP)) over thresholds in
  DESCENDING count order — the PR-AUC used when positives are rare.
  Cumulative TP/FP are exact ints; each term is two divisions.
- events_youden_mcc: the Youden-J-optimal threshold chosen by the
  EXACT integer argmax of TP*N - FP*P (cross-multiplied J
  numerator; ties -> smallest threshold), with the J value and the
  Matthews correlation coefficient at that threshold (integer
  numerator, double-product denominator).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def _userday_hist(sf_dir: str):
    """(count_value -> pos, neg) histogram of user-days."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = tus // US_PER_DAY
        err = (np.asarray(t.column("event_type").to_pylist())
               == "error").astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({"u": u, "d": day, "e": err})
        g = (df.groupby(["u", "d"])
             .agg(c=("e", "size"), e=("e", "max")).reset_index())
        return pa.table({
            "u": pa.array(g["u"].astype("int64")),
            "d": pa.array(g["d"].astype("int64")),
            "c": pa.array(g["c"].astype("int64")),
            "e": pa.array(g["e"].astype("int64")),
        })

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = (df.groupby(["u", "d"])
             .agg(c=("c", "sum"), e=("e", "max")).reset_index())
        return pa.table({
            "u": pa.array(g["u"].astype("int64")),
            "d": pa.array(g["d"].astype("int64")),
            "c": pa.array(g["c"].astype("int64")),
            "e": pa.array(g["e"].astype("int64")),
        })

    refs = list(
        read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    ud = tree_reduce_tables(refs, merge).to_pandas()
    hist = (ud.assign(pos=ud["e"], neg=1 - ud["e"])
            .groupby("c").agg(pos=("pos", "sum"),
                              neg=("neg", "sum"))
            .reset_index().sort_values("c", ascending=False)
            .reset_index(drop=True))
    return hist


def ap_from_hist(cs, pos, neg):
    """Average precision folding thresholds in descending count."""
    P = int(sum(pos))
    tp = 0
    fp = 0
    ap = 0.0
    for i in range(len(cs)):
        dtp = int(pos[i])
        tp += dtp
        fp += int(neg[i])
        if dtp > 0:
            ap = ap + (dtp / P) * (tp / (tp + fp))
    return ap, P


def youden_mcc_from_hist(cs, pos, neg):
    """(threshold, j, mcc): exact integer argmax of TP*N - FP*P."""
    P = int(sum(pos))
    N = int(sum(neg))
    tp = 0
    fp = 0
    best = None
    for i in range(len(cs)):
        tp += int(pos[i])
        fp += int(neg[i])
        num = tp * N - fp * P
        key = (num, -int(cs[i]))
        if best is None or key > best[0]:
            best = (key, int(cs[i]), tp, fp)
    _, thr, tp, fp = best
    fn = P - tp
    tn = N - fp
    j = tp / P - fp / N
    mcc = ((tp * tn - fp * fn)
           / math.sqrt(float(tp + fp) * float(tp + fn)
                       * float(tn + fp) * float(tn + fn)))
    return thr, j, mcc


_SQL_HIST = f"""
    ud AS (
        SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(count(*) AS BIGINT) AS c,
               CAST(max(CASE WHEN event_type = 'error'
                             THEN 1 ELSE 0 END) AS BIGINT) AS e
        FROM events GROUP BY 1, 2
    ),
    hist AS (
        SELECT c, CAST(sum(e) AS BIGINT) AS pos,
               CAST(sum(1 - e) AS BIGINT) AS neg
        FROM ud GROUP BY c
    ),
    tot AS (
        SELECT CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(neg) AS BIGINT) AS n
        FROM hist
    ),
    cum AS (
        SELECT c, pos, neg,
               CAST(sum(pos) OVER (ORDER BY c DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
               CAST(sum(neg) OVER (ORDER BY c DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        FROM hist
    )
"""


# --------------------------------------- events_pr_average_precision
def _ap_query():
    def q(sf_dir: str):
        h = _userday_hist(sf_dir)
        ap, P = ap_from_hist(h["c"].to_numpy(np.int64),
                             h["pos"].to_numpy(np.int64),
                             h["neg"].to_numpy(np.int64))
        return pa.table({
            "n_pos": pa.array([P], type=pa.int64()),
            "avg_precision": pa.array([ap], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_HIST}
    SELECT (SELECT p FROM tot) AS n_pos,
           (SELECT list_reduce(list_prepend(0.0e0,
                list(CASE WHEN pos > 0
                     THEN (CAST(pos AS DOUBLE)
                           / CAST((SELECT p FROM tot)
                                  AS DOUBLE))
                          * (CAST(tp AS DOUBLE)
                             / CAST(tp + fp AS DOUBLE))
                     ELSE 0.0e0 END ORDER BY c DESC)),
                (a, x) -> a + x) FROM cum) AS avg_precision
    FROM (SELECT 1)
    """
    return q, sql


# -------------------------------------------------- events_youden_mcc
def _youden_query():
    def q(sf_dir: str):
        h = _userday_hist(sf_dir)
        thr, j, mcc = youden_mcc_from_hist(
            h["c"].to_numpy(np.int64),
            h["pos"].to_numpy(np.int64),
            h["neg"].to_numpy(np.int64))
        return pa.table({
            "threshold": pa.array([thr], type=pa.int64()),
            "youden_j": pa.array([j], type=pa.float64()),
            "mcc": pa.array([mcc], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_HIST},
    ranked AS (
        SELECT c, tp, fp,
               row_number() OVER (ORDER BY
                   tp * (SELECT n FROM tot)
                   - fp * (SELECT p FROM tot) DESC,
                   c ASC) AS rk
        FROM cum
    ),
    pick AS (SELECT * FROM ranked WHERE rk = 1)
    SELECT pick.c AS threshold,
           CAST(pick.tp AS DOUBLE)
               / CAST((SELECT p FROM tot) AS DOUBLE)
           - CAST(pick.fp AS DOUBLE)
               / CAST((SELECT n FROM tot) AS DOUBLE)
               AS youden_j,
           CAST(pick.tp * ((SELECT n FROM tot) - pick.fp)
                - pick.fp * ((SELECT p FROM tot) - pick.tp)
                AS DOUBLE)
           / sqrt(CAST(pick.tp + pick.fp AS DOUBLE)
                  * CAST(pick.tp + ((SELECT p FROM tot)
                                    - pick.tp) AS DOUBLE)
                  * CAST(((SELECT n FROM tot) - pick.fp)
                         + pick.fp AS DOUBLE)
                  * CAST(((SELECT n FROM tot) - pick.fp)
                         + ((SELECT p FROM tot) - pick.tp)
                         AS DOUBLE)) AS mcc
    FROM pick
    """
    return q, sql


def build_wave201_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_pr_average_precision",) + _ap_query()))
    add(*(("events_youden_mcc",) + _youden_query()))
    return queries, oracles
