"""Sixth query wave: SMA / SeasonalWindowAverage forecasts, the Box-Cox
transform, and rolling-origin cross-validation with per-fold accuracy
metrics — each with an exact DuckDB oracle.

Notable bitwise points:
- SMA's level is a PREFIX-SUM DIFFERENCE (c[n] - c[n-w])/w in the kernel
  (kernels/baseline.sma_fit) — the oracle replays two left folds and
  subtracts, not a direct 4-term sum.
- Box-Cox at lambda=0.5 rides the kernel's sqrt fast path: sqrt is
  IEEE-correctly-rounded in both numpy and DuckDB, np.power is not.
- CV metrics (MAE/RMSE/sMAPE over horizon 4) are numpy means over <= 8
  elements — sequential adds, replayed left-associated in SQL.

Reference parity: src/models/baseline/sma.rs:17-290,
seasonal_window.rs:14-120, src/transforms/boxcox.rs:32-48,
src/utils/cross_validation.rs:10-200, src/utils/metrics.rs:7-203.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import (
    FORECAST_SCHEMA,
    _cast,
    _forecast_query,
    _num_read_blocks,
    _series_list_sql,
    corpus_ds,
)
from ._scaffold import read_cols
from .queries_wave5 import _doc_series_rows


def _forecast_sma_query(width: int, window: int = 4):
    q = _forecast_query(width, "sma", {"window": window}, 1)
    w = window
    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id, 'sma' AS model, CAST(1 AS INTEGER) AS h,
           (list_reduce(ms, (acc, x) -> acc + x)
            - CASE WHEN n = {w} THEN 0.0e0
                   ELSE list_reduce(ms[1:CAST(n - {w} AS INTEGER)],
                                    (acc, x) -> acc + x) END)
           / {float(w)}e0 AS yhat
    FROM l
    """
    return q, sql


def _forecast_swa_query(width: int, period: int = 4, window: int = 2,
                        horizon: int = 4):
    """SeasonalWindowAverage: per-slot mean of the last ``window``
    observations in that season; docs shorter than period*window emit NaN
    rows on both sides."""
    q = _forecast_query(
        width, "seasonal_window_average",
        {"period": period, "window": window}, horizon,
    )
    sql = f"""
    {_series_list_sql(width)},
    slots AS (
        SELECT doc_id, wid % {period} AS slot, list(m ORDER BY wid) AS sms
        FROM w GROUP BY doc_id, slot
    ),
    sm AS (
        SELECT doc_id, slot,
               (sms[len(sms) - 1] + sms[len(sms)]) / {float(window)}e0 AS lev
        FROM slots WHERE len(sms) >= {window}
    )
    SELECT l.doc_id, 'seasonal_window_average' AS model,
           CAST(hh.h AS INTEGER) AS h,
           CASE WHEN l.n >= {period * window} THEN sm.lev
                ELSE 'nan'::DOUBLE END AS yhat
    FROM l CROSS JOIN
         (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    LEFT JOIN sm ON sm.doc_id = l.doc_id
                AND sm.slot = (l.n + hh.h - 1) % {period}
    """
    return q, sql


def _boxcox_query(width: int, lam: float = 0.5):
    """Box-Cox transform of every w{width} window mean (positive by
    construction: tokens are codepoints >= 1)."""
    assert lam == 0.5, "oracle written for the sqrt fast path"

    def q(sf_dir: str):
        from ..kernels.scale import boxcox

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "window_id": [], "bc": []}
            for doc, y in _doc_series_rows(t, width):
                z = boxcox(y, lam)
                out["doc_id"].extend([doc] * y.size)
                out["window_id"].extend(range(y.size))
                out["bc"].extend(z.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "bc": pa.array(out["bc"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "bc": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS window_id,
           (sqrt(ms[u.i]) - 1.0e0) / 0.5e0 AS bc
    FROM l, unnest(generate_series(1, CAST(n AS INTEGER))) AS u(i)
    """
    return q, sql


def _cv_naive_query(width: int, horizon: int = 4, initial: int = 8,
                    step: int = 4):
    """Expanding-origin CV of the naive forecaster: per (doc, fold) MAE /
    RMSE / sMAPE over the {horizon}-step test slice. The naive prediction
    is flat at the last training value, so every fold is closed-form."""

    def q(sf_dir: str):
        from ..kernels.cross_validation import CVConfig, cross_validate
        from ..models import make_model

        cfg = CVConfig(horizon=horizon, initial_train_size=initial,
                       step=step)

        def cv(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "fold": [], "train_end": [],
                   "mae": [], "rmse": [], "smape": []}
            for doc, y in _doc_series_rows(t, width):
                r = cross_validate(y, lambda: make_model("naive"), cfg)
                for f in r["folds"]:
                    out["doc_id"].append(doc)
                    out["fold"].append(f["fold"])
                    out["train_end"].append(f["train_end"])
                    out["mae"].append(f["mae"])
                    out["rmse"].append(f["rmse"])
                    out["smape"].append(f["smape"])
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "fold": pa.array(out["fold"], type=pa.int64()),
                    "train_end": pa.array(out["train_end"],
                                          type=pa.int64()),
                    "mae": pa.array(out["mae"], type=pa.float64()),
                    "rmse": pa.array(out["rmse"], type=pa.float64()),
                    "smape": pa.array(out["smape"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(cv, batch_format="pyarrow"),
            {"doc_id": pa.string(), "fold": pa.int64(),
             "train_end": pa.int64(), "mae": pa.float64(),
             "rmse": pa.float64(), "smape": pa.float64()},
        )

    assert horizon == 4 and step == 4, "SQL below is written for h=step=4"
    h, s0 = horizon, initial
    # fold f trains on ms[1..s], s = initial + step*f, tests ms[s+1..s+4]
    mae_terms = " + ".join(f"abs(ms[s + {j}] - ms[s])" for j in range(1, 5))
    mse_terms = " + ".join(
        f"(ms[s + {j}] - ms[s]) * (ms[s + {j}] - ms[s])" for j in range(1, 5)
    )
    smape_terms = " + ".join(
        f"abs(ms[s + {j}] - ms[s]) / ((abs(ms[s + {j}]) + abs(ms[s])) / 2.0e0)"
        for j in range(1, 5)
    )
    sql = f"""
    {_series_list_sql(width)},
    folds AS (
        SELECT doc_id, ms, n, CAST(ff.f AS BIGINT) AS fold,
               {s0} + {h} * CAST(ff.f AS BIGINT) AS s
        FROM l CROSS JOIN LATERAL (
            SELECT unnest(generate_series(
                0, CAST((n - {s0 + h}) // {h} AS INTEGER))) AS f) ff
        WHERE n >= {s0 + h}
    )
    SELECT doc_id, fold, CAST(s AS BIGINT) AS train_end,
           ({mae_terms}) / {float(h)}e0 AS mae,
           sqrt(({mse_terms}) / {float(h)}e0) AS rmse,
           ({smape_terms}) / {float(h)}e0 * 100.0e0 AS smape
    FROM folds
    """
    return q, sql


def _guerrero_query(width: int, period: int = 2):
    """Guerrero Box-Cox lambda per doc: argmin over the 61-point grid of
    the CV of sd/mean^(1-lam) across consecutive ``period``-sized groups.

    The OUTPUT is a grid value — bitwise-replayed via the formula
    ``k * (3/60) - 1`` (verified bit-equal to np.linspace, endpoint
    pinned to 2.0). The CV values only feed the argmin, so the ~1e-15
    numpy-vs-DuckDB summation noise is harmless: the curve's grid-step
    differences are many orders larger. Tie-break = first minimal k on
    both sides (np.argmin / min-k-at-min-cv)."""

    def q(sf_dir: str):
        from ..kernels.scale import boxcox_lambda_guerrero
        from .queries_wave5 import _doc_series_rows

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "lam": []}
            for doc, y in _doc_series_rows(t, width):
                out["doc_id"].append(doc)
                out["lam"].append(boxcox_lambda_guerrero(y, period=period))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "lam": pa.array(out["lam"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "lam": pa.float64()},
        )

    p = period
    sql = f"""
    {_series_list_sql(width)},
    grp AS (
        SELECT doc_id, n, CAST(n // {p} AS BIGINT) AS ng,
            list_transform(generate_series(1, CAST(n // {p} AS INTEGER)),
                j -> (ms[{p} * j - 1] + ms[{p} * j]) / 2.0e0) AS gmeans,
            list_transform(generate_series(1, CAST(n // {p} AS INTEGER)),
                j -> sqrt(
                    (ms[{p} * j - 1] - (ms[{p} * j - 1] + ms[{p} * j]) / 2.0e0)
                    * (ms[{p} * j - 1] - (ms[{p} * j - 1] + ms[{p} * j]) / 2.0e0)
                    + (ms[{p} * j] - (ms[{p} * j - 1] + ms[{p} * j]) / 2.0e0)
                    * (ms[{p} * j] - (ms[{p} * j - 1] + ms[{p} * j]) / 2.0e0)
                )) AS gstds
        FROM l
    ),
    lamk AS (
        SELECT doc_id, ng, gmeans, gstds, CAST(kk.k AS BIGINT) AS k,
               CASE WHEN kk.k = 60 THEN 2.0e0
                    ELSE CAST(kk.k AS DOUBLE) * (3.0e0 / 60.0e0)
                         + (-1.0e0) END AS lam
        FROM grp CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, 60)) AS k) kk
        WHERE ng >= 2
    ),
    ratios AS (
        SELECT doc_id, ng, k, lam,
            list_transform(generate_series(1, CAST(ng AS INTEGER)),
                j -> gstds[j] / pow(gmeans[j], 1.0e0 - lam)) AS rat
        FROM lamk
    ),
    cvs AS (
        SELECT doc_id, k, lam,
            list_reduce(rat, (acc, x) -> acc + x) / ng AS mu,
            list_reduce(list_transform(rat,
                x -> (x - list_reduce(rat, (acc, y) -> acc + y) / ng)
                     * (x - list_reduce(rat, (acc, y) -> acc + y) / ng)),
                (acc, x) -> acc + x) AS ssq,
            ng
        FROM ratios
    ),
    cv AS (
        SELECT doc_id, k, lam,
            CASE WHEN mu = 0 THEN 'infinity'::DOUBLE
                 ELSE sqrt(ssq / (ng - 1)) / mu END AS c
        FROM cvs
    ),
    best AS (
        SELECT doc_id, min(c) AS mc FROM cv GROUP BY doc_id
    )
    SELECT cv.doc_id, arg_min(cv.lam, cv.k) AS lam
    FROM cv JOIN best ON best.doc_id = cv.doc_id AND cv.c = best.mc
    GROUP BY cv.doc_id
    """
    return q, sql


def _embedding_pairs_query(threshold: float = 0.45):
    """Exact cosine pair scan over the embeddings table (broadcast
    matmul, no shuffle). Integer-only output; the synthetic embeddings'
    closest pair sits ~1e-4 from the threshold, so the float-path
    difference between numpy and DuckDB (~1e-7) cannot flip a row."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.ann import embedding_cosine_pairs

        emb = read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
        return _cast(
            embedding_cosine_pairs(emb, threshold=threshold),
            {"id_a": pa.int64(), "id_b": pa.int64()},
        )

    sql = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
    """
    return q, sql


def _ngram_jaccard_query(top_k: int = 20, k: int = 5):
    """Pairwise k-gram Jaccard among the ``top_k`` longest docs
    (distributed sort+limit feeds a bounded K^2 local comparison; the
    shingle sets use the same rolling polynomial mod 2^64 as the MinHash
    stage, HUGEINT-exact in SQL). jaccard = inter/union is an int/int
    division — identical doubles on both sides."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import _char_shingle_hashes

        top = (
            read_cols(sf_dir, "documents", ["doc_id", "n_chars", "text"])
            .sort(["n_chars", "doc_id"], descending=[True, False])
            .limit(top_k)
            .take_all()  # bounded: exactly top_k rows
        )
        docs = sorted((r["doc_id"], r["text"]) for r in top)
        sets = {d: _char_shingle_hashes(t, k) for d, t in docs}
        out = {"id_a": [], "id_b": [], "inter": [], "uni": [],
               "jaccard": []}
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a, b = docs[i][0], docs[j][0]
                sa, sb = sets[a], sets[b]
                inter = int(np.intersect1d(sa, sb,
                                           assume_unique=True).size)
                uni = int(sa.size + sb.size - inter)
                out["id_a"].append(a)
                out["id_b"].append(b)
                out["inter"].append(inter)
                out["uni"].append(uni)
                out["jaccard"].append(inter / uni if uni else 0.0)
        return pa.table(
            {
                "id_a": pa.array(out["id_a"], type=pa.int64()),
                "id_b": pa.array(out["id_b"], type=pa.int64()),
                "inter": pa.array(out["inter"], type=pa.int64()),
                "uni": pa.array(out["uni"], type=pa.int64()),
                "jaccard": pa.array(out["jaccard"], type=pa.float64()),
            }
        )

    from ..extras.dedup import _BASE, _M64

    leads = ", ".join(f"lead(token, {j}) OVER w AS c{j}"
                      for j in range(1, k))
    poly = "c0"
    for j in range(1, k):
        poly = f"({poly} * {_BASE} + c{j})"
    sql = f"""
    WITH top AS (
        SELECT doc_id, text FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT {top_k}
    ),
    tok AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
               unicode(unnest(string_split(text, ''))) AS token
        FROM top
    ),
    win AS (
        SELECT doc_id, CAST(token AS HUGEINT) AS c0, {leads}
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sh AS (
        SELECT DISTINCT doc_id, CAST({poly} % {_M64} AS UBIGINT) AS h
        FROM win WHERE c{k - 1} IS NOT NULL
    ),
    cnts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh
             GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ca.doc_id AS id_a, cb.doc_id AS id_b,
           COALESCE(i.i, 0) AS inter,
           ca.c + cb.c - COALESCE(i.i, 0) AS uni,
           CASE WHEN ca.c + cb.c - COALESCE(i.i, 0) = 0 THEN 0.0e0
                ELSE CAST(COALESCE(i.i, 0) AS DOUBLE)
                     / (ca.c + cb.c - COALESCE(i.i, 0)) END AS jaccard
    FROM cnts ca JOIN cnts cb ON ca.doc_id < cb.doc_id
    LEFT JOIN inter i ON i.ia = ca.doc_id AND i.ib = cb.doc_id
    """
    return q, sql


def build_wave6_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("forecast_sma_w8",) + _forecast_sma_query(8)))
    add(*(("forecast_swa_w8",) + _forecast_swa_query(8)))
    add(*(("doc_boxcox",) + _boxcox_query(8)))
    add(*(("cv_naive_w8",) + _cv_naive_query(8)))
    add(*(("embedding_cosine_pairs",) + _embedding_pairs_query()))
    add(*(("doc_guerrero_lambda",) + _guerrero_query(8)))
    add(*(("dedup_ngram_jaccard",) + _ngram_jaccard_query()))
    return queries, oracles
