"""Fast snapshot-drift guard: a few cheap snapshot-oracled queries run at
sf0.001 and must hash-match their committed golden parquet through the
exact driver comparison (sorted columns, value bytes).  Catches engine
drift against the pinned snapshots from pytest alone — the full sweep
lives in tools/check_queries.py."""

import hashlib

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
FAST_SNAPSHOT_QUERIES = (
    "doc_lis_length",
    "forecast_dstm_w8",
    "embedding_pca_power",
    "bpe_train_merges_k6",
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _vhash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            h.update(
                "\x1f".join("" if v is None else str(v) for v in col).encode()
            )
        else:
            h.update(col.to_numpy().tobytes())
    return h.hexdigest()[:16]


def test_snapshot_queries_match_committed_parquet(ray_session):
    from anofox_forecast_ray.pipelines.queries import build_queries

    queries, oracles = build_queries()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    for name in FAST_SNAPSHOT_QUERIES:
        got = _canon(queries[name](SF).to_pandas())
        want = _canon(con.execute(oracles[name]).fetchdf())
        assert len(got) == len(want), name
        assert list(got.columns) == list(want.columns), name
        assert _vhash(got) == _vhash(want), name
