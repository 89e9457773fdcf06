"""documents-mode flagship: raw text tables tokenized on read must
produce a store bitwise-identical to the pre-tokenized corpus path."""

import os

import pyarrow.parquet as pq

from anofox_forecast_ray.config import EngineConfig, TierSpec
from anofox_forecast_ray.pipelines.flagship import run_flagship

TIERS = (TierSpec("w8", 8), TierSpec("w32", 32))


def _rollup_sorted(store):
    t = pq.read_table(os.path.join(store, "rollup")).to_pandas()
    return (
        t.sort_values(["doc_id", "tier", "window_id"])
        .reset_index(drop=True)
    )


def test_documents_mode_matches_corpus_mode(ray_session, tmp_path):
    import ray
    import pyarrow as pa

    from anofox_forecast_ray.corpus import tokens_from_text_batch

    docs_file = "/root/testdata/sf0.001/documents.parquet"
    # corpus-mode input: the same docs pre-tokenized
    corpus_file = str(tmp_path / "corpus.parquet")
    t = pq.read_table(docs_file, columns=["doc_id", "text", "source"])
    pq.write_table(tokens_from_text_batch(t), corpus_file)

    s_doc, s_cor = str(tmp_path / "s_doc"), str(tmp_path / "s_cor")
    m_doc = run_flagship(docs_file, s_doc, EngineConfig(tiers=TIERS),
                         with_forecast=False, with_gorilla=False,
                         input_format="documents")
    m_cor = run_flagship(corpus_file, s_cor, EngineConfig(tiers=TIERS),
                         with_forecast=False, with_gorilla=False)
    assert m_doc["token_count"] == m_cor["token_count"] > 0
    assert m_doc["rollup_rows"] == m_cor["rollup_rows"] > 0
    a, b = _rollup_sorted(s_doc), _rollup_sorted(s_cor)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    # source aggregates identical too
    sa = pq.read_table(os.path.join(s_doc, "source_rollup")).to_pandas()
    sb = pq.read_table(os.path.join(s_cor, "source_rollup")).to_pandas()
    key = ["source", "tier", "window_id"]
    sa = sa.sort_values(key).reset_index(drop=True)
    sb = sb.sort_values(key).reset_index(drop=True)
    assert sa.equals(sb)


def test_documents_mode_rejects_unknown_format(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        run_flagship("/root/testdata/sf0.001/documents.parquet",
                     str(tmp_path / "x"), EngineConfig(tiers=TIERS),
                     input_format="csv")
