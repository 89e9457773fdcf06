"""Driver-visible oracles for the golden-checked queries.

The optimizer/stateful queries (ARIMA, AutoETS, MFLES, TBATS, MSTL, STL
strengths, the feature matrix, BPE training, LIS, compression ratio, PCA)
are not SQL-expressible, so their primary verification is the independent
sequential oracle suite in ``tools/golden_oracles.py``.  The driver's
correctness gate, however, only sees ``oracle_sql()`` — a query without an
entry there is scored ``no_oracle``.

This module bridges the two: ``tools/make_golden.py`` runs each such query,
verifies it against its independent golden check, and commits the verified
result as a parquet snapshot under ``tests/golden/snapshots/<name>.parquet``
(one row-set per scale factor, keyed by the total character count of the
``documents`` corpus it was generated from — the row count alone does NOT
distinguish sf0.001 from sf0.01, both have 500 docs).  The oracle SQL then
simply reads the snapshot back for the matching scale factor:

    SELECT * EXCLUDE (golden_corpus_key) FROM read_parquet('<snapshot>')
    WHERE golden_corpus_key = (SELECT sum(length(text)) FROM documents)

so the driver's hash comparison becomes a hard bitwise regression pin on a
result that was golden-verified at snapshot time.  Running at a scale factor
with no committed snapshot yields 0 oracle rows — a loud row-count FAIL, not
a silent pass.

Bitwise determinism contract: every snapshotted query is either per-doc
(one series -> one kernel call, no cross-block float folds) or, for the one
global-float query (``embedding_pca_power``), pins its block count so the
partial-sum grouping cannot vary with the session's CPU count.
"""

from __future__ import annotations

import os

# repo root = parents of anofox_forecast_ray/pipelines/
_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SNAPSHOT_DIR = os.path.join(_REPO, "tests", "golden", "snapshots")

#: queries whose oracle is a committed golden-verified snapshot; the list is
#: explicit (not a directory glob) so a stray parquet file cannot silently
#: become an oracle.
SNAPSHOT_QUERIES = (
    "series_features_w8",
    "stl_strengths_w8",
    "forecast_arima_w8",
    "forecast_arima_ml_w8",
    "forecast_garch_p2q1_w8",
    "forecast_auto_ets_w8",
    "forecast_mfles_w8",
    "forecast_tbats_w8",
    "forecast_mstl_w8",
    "forecast_otm_w8",
    "forecast_dstm_w8",
    "forecast_dotm_w8",
    "forecast_auto_theta_w8",
    "forecast_auto_arima_w8",
    "bpe_train_merges_k6",
    "bpe_encode_stats_k6",
    "doc_lis_length",
    "doc_compress_ratio",
    "embedding_pca_power",
)


def snapshot_path(name: str) -> str:
    return os.path.join(SNAPSHOT_DIR, f"{name}.parquet")


def snapshot_sql(name: str) -> str:
    return (
        f"SELECT * EXCLUDE (golden_corpus_key) "
        f"FROM read_parquet('{snapshot_path(name)}') "
        f"WHERE golden_corpus_key = "
        f"(SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)"
    )


def attach_snapshot_oracles(queries: dict, oracles: dict) -> None:
    """Add snapshot-backed oracle SQL for every golden-checked query whose
    snapshot has been generated and committed."""
    for name in SNAPSHOT_QUERIES:
        if name in queries and name not in oracles and os.path.exists(
            snapshot_path(name)
        ):
            oracles[name] = snapshot_sql(name)
