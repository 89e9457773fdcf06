"""Structural scale invariant: the flagship pipeline performs ZERO
all-to-all exchanges — per-doc tiers are computed in-row, coarser tiers
cascade from finest-tier partials, and the source aggregates tree-reduce
bounded partials. This is the core 100 TB property (DESIGN_100TB.md);
pin it structurally so a future edit that sneaks a groupby/sort/shuffle
into the hot path fails loudly instead of silently regressing to an
exchange at scale.
"""

import os
import shutil

import pyarrow as pa
import pytest


@pytest.fixture
def shuffle_counter(monkeypatch):
    import ray.data

    calls = []

    def wrap(name):
        orig = getattr(ray.data.Dataset, name)

        def spy(self, *a, **kw):
            calls.append((name, a, kw))
            return orig(self, *a, **kw)

        return spy

    for name in ("groupby", "sort", "random_shuffle"):
        monkeypatch.setattr(ray.data.Dataset, name, wrap(name))

    orig_rep = ray.data.Dataset.repartition

    def spy_rep(self, *a, **kw):
        if kw.get("shuffle", False):
            calls.append(("repartition(shuffle=True)", a, kw))
        return orig_rep(self, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "repartition", spy_rep)
    return calls


def test_flagship_runs_shuffle_free(ray_session, shuffle_counter, tmp_path):
    import pyarrow.parquet as pq

    from anofox_forecast_ray.corpus import generate_corpus
    from anofox_forecast_ray.pipelines.flagship import run_flagship

    corpus_path = str(tmp_path / "corpus.parquet")
    pq.write_table(generate_corpus(120, seed=42), corpus_path,
                   row_group_size=64)
    out = str(tmp_path / "store")
    shutil.rmtree(out, ignore_errors=True)
    summary = run_flagship([corpus_path], out, n_shards=1)
    assert summary["rollup_rows"] > 0
    assert summary["forecast_rows"] > 0
    assert shuffle_counter == [], (
        "flagship executed an all-to-all exchange: "
        f"{[c[0] for c in shuffle_counter]}"
    )
    # the store is complete despite zero shuffles
    for sub in ("rollup", "forecast", "gorilla", "source_rollup",
                "source_doc_stats"):
        assert os.path.isdir(os.path.join(out, sub)), sub
