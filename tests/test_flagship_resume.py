"""Flagship pipeline end-to-end + checkpointed resume (kill-and-replay)."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from anofox_forecast_ray.config import EngineConfig, SMALL_TIERS
from anofox_forecast_ray.corpus import generate_corpus
from anofox_forecast_ray.pipelines.flagship import run_flagship
from anofox_forecast_ray.state.lineage import finished_shards, lineage_path


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    files = []
    for i in range(4):
        t = generate_corpus(30, seed=100 + i, mean_len=120, sigma=0.8)
        p = str(d / f"part-{i}.parquet")
        pq.write_table(t, p, row_group_size=8)
        files.append(p)
    return files


@pytest.mark.usefixtures("ray_session")
def test_flagship_and_resume(corpus_files, tmp_path):
    out = str(tmp_path / "out")
    cfg = EngineConfig(tiers=SMALL_TIERS, forecast_concurrency=2,
                       batch_size=64)
    models = (("naive", {}), ("ses", {"alpha": 0.5}))

    s1 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    assert s1["shards_total"] == 4 and s1["shards_skipped"] == 0
    assert s1["rollup_rows"] > 0 and s1["forecast_rows"] > 0
    assert s1["gorilla_rows"] > 0 and s1["doc_count"] == 120
    assert finished_shards(out) == {0, 1, 2, 3}

    total_rollup = pq.read_table(os.path.join(out, "rollup")).num_rows
    assert total_rollup == s1["rollup_rows"]

    # full resume: nothing recomputed
    s2 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    assert s2["shards_skipped"] == 4 and s2["rollup_rows"] == 0

    # kill-and-replay: lose shard 2's lineage + outputs
    os.remove(lineage_path(out, 2))
    shutil.rmtree(os.path.join(out, "rollup", "shard=2"))
    shutil.rmtree(os.path.join(out, "forecast", "shard=2"))
    shutil.rmtree(os.path.join(out, "gorilla", "shard=2"))
    assert finished_shards(out) == {0, 1, 3}

    s3 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    assert s3["shards_skipped"] == 3
    assert finished_shards(out) == {0, 1, 2, 3}
    # replay restored exactly the same total output
    assert pq.read_table(os.path.join(out, "rollup")).num_rows == total_rollup

    # deterministic: shard 2's rollup identical across runs
    t = pq.read_table(os.path.join(out, "rollup", "shard=2")).to_pandas()
    t["tier"] = t["tier"].astype(str)
    t = t.sort_values(["doc_id", "tier", "window_id"]).reset_index(drop=True)
    # recompute oracle for the shard's input files (round-robin split: shard
    # 2 holds sorted(files)[2::4])
    from anofox_forecast_ray.state.lineage import shard_inputs

    shard2_files = shard_inputs(corpus_files, 4)[2]
    import pyarrow as pa

    from anofox_forecast_ray.stages.rollup import make_tier_rollup_fn

    src = pa.concat_tables([pq.read_table(f) for f in shard2_files])
    want = (
        make_tier_rollup_fn(SMALL_TIERS)(src)
        .to_pandas()
        .sort_values(["doc_id", "tier", "window_id"])
        .reset_index(drop=True)
    )
    assert len(t) == len(want)
    assert (t["sum"].to_numpy() == want["sum"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_resume_after_partial_write(corpus_files, tmp_path):
    """A shard killed AFTER writing some output but BEFORE its lineage
    record must replay cleanly — no duplicated rows from the remnants."""
    out = str(tmp_path / "out2")
    cfg = EngineConfig(tiers=SMALL_TIERS, forecast_concurrency=2,
                       batch_size=64)
    models = (("naive", {}),)
    s1 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    clean_total = pq.read_table(os.path.join(out, "rollup")).num_rows

    # simulate the crash: shard 1 lineage lost, its outputs left behind
    os.remove(lineage_path(out, 1))
    s2 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    assert s2["shards_skipped"] == 3
    assert pq.read_table(os.path.join(out, "rollup")).num_rows == clean_total
    assert pq.read_table(os.path.join(out, "forecast")).num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_retention_reads(tmp_path):
    """Range-pruned rollup reads + Gorilla point lookups against the
    written retention store. Uses a corpus with globally-unique doc ids
    (the shared fixture reuses ids across files)."""
    import pyarrow as pa

    from anofox_forecast_ray.corpus import generate_corpus
    from anofox_forecast_ray.pipelines.retention import read_rollup, read_series
    from anofox_forecast_ray.stages.rollup import make_tier_rollup_fn

    corpus_files = []
    for i in range(2):
        t = generate_corpus(25, seed=500 + i, mean_len=150, sigma=0.7)
        t = t.set_column(
            0, "doc_id",
            pa.array([f"f{i}-{d}" for d in t.column("doc_id").to_pylist()]),
        )
        p = str(tmp_path / f"ret-corpus-{i}.parquet")
        pq.write_table(t, p, row_group_size=8)
        corpus_files.append(p)

    out = str(tmp_path / "ret")
    cfg = EngineConfig(tiers=SMALL_TIERS, forecast_concurrency=2,
                       batch_size=64)
    run_flagship(corpus_files, out, cfg, n_shards=2,
                 models=(("naive", {}),))

    # tier + window-range pruned read
    df = read_rollup(out, tier="w8", window_range=(2, 5)).to_pandas()
    assert set(df["tier"].astype(str)) == {"w8"}
    assert df["window_id"].min() >= 2 and df["window_id"].max() <= 5

    # Gorilla point lookup round-trips bitwise to the rollup means
    src = pa.concat_tables([pq.read_table(f) for f in corpus_files])
    doc = src.column("doc_id")[0].as_py()
    wids, vals = read_series(out, doc, "w32")
    ref = (
        make_tier_rollup_fn(SMALL_TIERS)(src).to_pandas()
    )
    ref = ref[(ref.doc_id.astype(str) == doc) & (ref.tier.astype(str) == "w32")]
    ref = ref.sort_values("window_id")
    assert wids.tolist() == ref["window_id"].tolist()
    assert (
        vals.view(np.int64).tolist()
        == ref["mean"].to_numpy().view(np.int64).tolist()
    )


@pytest.mark.usefixtures("ray_session")
def test_prefetch_failure_does_not_lose_current_shard(corpus_files,
                                                      tmp_path,
                                                      monkeypatch):
    """A failing depth-1 prefetch (next shard's read dies in the pool
    thread) must not abort the CURRENT shard before its lineage is
    written — the prefetch error is swallowed and the next iteration's
    synchronous read surfaces the real failure. Injected via the
    ``_materialize_corpus`` seam: raise on every non-main thread call
    (exactly the prefetch calls)."""
    import threading

    from anofox_forecast_ray.pipelines import flagship as fmod

    real = fmod._materialize_corpus

    def flaky(ds):
        if threading.current_thread() is not threading.main_thread():
            raise RuntimeError("injected prefetch failure")
        return real(ds)

    monkeypatch.setattr(fmod, "_materialize_corpus", flaky)
    out = str(tmp_path / "out")
    cfg = EngineConfig(tiers=SMALL_TIERS, forecast_concurrency=2,
                       batch_size=64)
    models = (("naive", {}), ("ses", {"alpha": 0.5}))

    # every prefetch fails; every shard still completes via its own
    # synchronous (main-thread) read
    s = run_flagship(corpus_files, out, cfg, n_shards=3, models=models)
    assert finished_shards(out) == {0, 1, 2}
    assert s["doc_count"] == 120 and s["rollup_rows"] > 0
    # and the run matches an unpatched run bitwise (same outputs)
    monkeypatch.setattr(fmod, "_materialize_corpus", real)
    out2 = str(tmp_path / "out2")
    s2 = run_flagship(corpus_files, out2, cfg, n_shards=3, models=models)
    import pyarrow.dataset as pads

    for sub in ("rollup", "forecast", "gorilla"):
        a = pads.dataset(os.path.join(out, sub), format="parquet",
                         partitioning="hive").to_table()
        b = pads.dataset(os.path.join(out2, sub), format="parquet",
                         partitioning="hive").to_table()
        assert a.num_rows == b.num_rows, sub
    assert s2["rollup_rows"] == s["rollup_rows"]


@pytest.mark.usefixtures("ray_session")
def test_source_rollup_partial_fallback_matches(corpus_files, tmp_path):
    """source_rollup is merged from per-shard int partials; a shard
    finished by an OLDER engine version has no partial file, and the
    merge falls back to aggregating only that shard's written rollup.
    Both routes must produce the identical table."""
    import pyarrow.dataset as pads

    out = str(tmp_path / "out")
    cfg = EngineConfig(tiers=SMALL_TIERS, forecast_concurrency=2,
                       batch_size=64)
    models = (("naive", {}),)
    run_flagship(corpus_files, out, cfg, n_shards=4, models=models)
    ref = (pads.dataset(os.path.join(out, "source_rollup"),
                        format="parquet").to_table().to_pandas()
           .sort_values(["source", "tier", "window_id"])
           .reset_index(drop=True))
    assert len(ref) > 0

    # genuinely MIXED routes: shards 1 and 3 keep their lineage (they
    # look like shards finished by an older engine version) but lose
    # their partial files, while shard 2 loses its lineage and replays —
    # the merge must fold disk partials (0, 2) with rollup-dir fallbacks
    # (1, 3) in one finalize call
    for sid in (1, 3):
        os.remove(os.path.join(out, "source_partials",
                               f"shard-{sid}.parquet"))
    os.remove(lineage_path(out, 2))
    s = run_flagship(corpus_files, out, cfg, n_shards=4, models=models,
                     resume=True)
    assert s["shards_skipped"] == 3
    assert not os.path.exists(
        os.path.join(out, "source_partials", "shard-1.parquet"))
    got = (pads.dataset(os.path.join(out, "source_rollup"),
                        format="parquet").to_table().to_pandas()
           .sort_values(["source", "tier", "window_id"])
           .reset_index(drop=True))
    assert ref.equals(got)

    # pure fallback: delete ALL partials, keep lineage (all shards
    # "old"), force the end-of-run merge over written rollups only
    shutil.rmtree(os.path.join(out, "source_partials"))
    s2 = run_flagship(corpus_files, out, cfg, n_shards=4, models=models,
                      resume=True)
    assert s2["shards_skipped"] == 4
    got2 = (pads.dataset(os.path.join(out, "source_rollup"),
                         format="parquet").to_table().to_pandas()
            .sort_values(["source", "tier", "window_id"])
            .reset_index(drop=True))
    assert ref.equals(got2)
