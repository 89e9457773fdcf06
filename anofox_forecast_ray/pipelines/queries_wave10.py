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
from ._scaffold import read_cols
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


def _retention_read_query(width: int = 8, lo: int = 8, hi: int = 23):
    """End-to-end storage check: run the flagship rollup into a tiered
    parquet store under /tmp (resume-aware, so repeated calls reuse it),
    then answer a tier + window-range read through
    pipelines/retention.read_rollup (hive path pruning + parquet
    predicate pushdown). Oracle = the plain rollup SQL with the same
    range filter — proves write + read round-trip the store bitwise."""

    def q(sf_dir: str):
        import os

        import pyarrow.parquet as pq
        import ray

        from ..config import SMALL_TIERS, EngineConfig
        from ..pipelines.flagship import run_flagship
        from ..pipelines.retention import read_rollup

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
        ds = read_rollup(
            store, tier=f"w{width}", window_range=(lo, hi),
            columns=["doc_id", "window_id", "cnt", "sum", "mean"],
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "cnt": pa.int64(), "sum": pa.int64(), "mean": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT doc_id, pos // {width} AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(token) AS BIGINT) AS "sum",
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok GROUP BY doc_id, window_id
    HAVING window_id BETWEEN {lo} AND {hi}
    """
    return q, sql


def _corpus_prep_query(threshold: float = 0.7):
    """Composite training-data-prep pipeline: quality scoring + exact
    dedup (sha256 content id, min doc_id wins) + per-source keep
    accounting — the stages a 100 TB corpus run composes
    (extras/textstats.QualityScoreStage + hash-keyed dedup; the shuffle
    carries only (fp, ids, counts), never text)."""

    def q(sf_dir: str):
        import hashlib

        import pandas as pd
        import ray.data as rd

        from ..extras.textstats import QualityScoreStage
        from .queries import _num_read_blocks

        qs = QualityScoreStage()

        def enrich(t: pa.Table) -> pa.Table:
            scored = qs(t)
            texts = [x or "" for x in t.column("text").to_pylist()]
            fp = [hashlib.sha256(x.encode()).hexdigest() for x in texts]
            return pa.table(
                {
                    "doc_id": scored.column("doc_id"),
                    "source": t.column("source"),
                    "fp": pa.array(fp, type=pa.string()),
                    "n_words": scored.column("n_words"),
                    "quality_score": scored.column("quality_score"),
                }
            )

        def keep_first(g: pa.Table) -> pa.Table:
            return g.sort_by([("doc_id", "ascending")]).slice(0, 1)

        def quality_gate(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.greater_equal(t.column("quality_score"), threshold)
            )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "source": t.column("source"),
                    "docs_kept": t.column("count()").cast(pa.int64()),
                    "words_kept": t.column("sum(n_words)").cast(pa.int64()),
                }
            )

        from ray.data.aggregate import Count, Sum

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "text", "source"])
            .map_batches(enrich, batch_format="pyarrow")
            .groupby("fp")
            .map_groups(keep_first, batch_format="pyarrow")
            .map_batches(quality_gate, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(), Sum("n_words"))
            .map_batches(finish, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"source": pa.string(), "docs_kept": pa.int64(),
             "words_kept": pa.int64()},
        )

    from ..extras.textstats import QualityScoreStage as _QS

    sql = f"""
    WITH quality AS ({_QS.oracle_sql()}),
    fp AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
               sha256(text) AS fp
        FROM documents
    ),
    kept AS (
        SELECT f.doc_id, f.source, q.n_words, q.quality_score,
               row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id)
                   AS rn
        FROM fp f JOIN quality q ON q.doc_id = f.doc_id
    )
    SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_words) AS BIGINT) AS words_kept
    FROM kept WHERE rn = 1 AND quality_score >= {threshold}e0
    GROUP BY source
    """
    return q, sql


def _audio_features_query():
    """Audio plumbing end-to-end: documents -> binary audio payloads ->
    AudioFeatureStage actor pool (stub decode = exact dyadic fake, real
    framing/energy math) — extras/multimodal.py. Every energy sum is
    exact, so the DuckDB oracle reproduces rms/peak/frame energies
    bitwise."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.multimodal import audio_from_documents, multimodal_pipeline
        from .queries import _num_read_blocks

        docs = read_cols(sf_dir, "documents", ["doc_id", "text"])
        ds = multimodal_pipeline(
            audio_from_documents(docs), kind="audio", concurrency=4,
            batch_size=32,
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "n_samples": pa.int64(),
             "rms": pa.float64(), "peak": pa.float64(),
             "n_frames": pa.int64(), "frame_energy_mean": pa.float64()},
        )

    from ..extras.multimodal import audio_features_sql

    return q, audio_features_sql()


def _video_features_query():
    """Video plumbing end-to-end: documents -> binary video payloads ->
    VideoFrameStage actor pool (stub decode = consecutive-byte frames,
    real frame-sampling + brightness/motion math) — extras/multimodal.py.
    Sampling indices use integer arithmetic and all sums are integer, so
    the DuckDB oracle is bitwise."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.multimodal import multimodal_pipeline, video_from_documents
        from .queries import _num_read_blocks

        docs = read_cols(sf_dir, "documents", ["doc_id", "text"])
        ds = multimodal_pipeline(
            video_from_documents(docs), kind="video", concurrency=4,
            batch_size=32,
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "n_frames": pa.int64(),
             "sampled_frames": pa.int64(), "brightness_mean": pa.float64(),
             "motion_mean": pa.float64()},
        )

    from ..extras.multimodal import video_features_sql

    return q, video_features_sql()


def build_wave10_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_scale_suite",) + _scale_suite_query(8)))
    add(*(("doc_expanding_stats",) + _expanding_query(8)))
    add(*(("doc_ols_trend",) + _ols_trend_query(8)))
    add(*(("retention_range_read",) + _retention_read_query()))
    add(*(("corpus_prep_pipeline",) + _corpus_prep_query()))
    add(*(("multimodal_audio_features",) + _audio_features_query()))
    add(*(("multimodal_video_features",) + _video_features_query()))
    return queries, oracles
