"""Job entrypoint: arg plumbing, resume skip, metrics shape. Runs
main() against the session fixture's Ray (main must not re-init)."""

import json
import os
import shutil

import pyarrow.parquet as pq

from anofox_forecast_ray.job import _expand_inputs, _parse_tiers, main


def test_expand_inputs(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    for name in ["a.parquet", "sub/b.parquet", "skip.txt"]:
        (d / name).write_bytes(b"")
    got = _expand_inputs([str(d)])
    assert [os.path.basename(p) for p in got] == ["a.parquet", "b.parquet"]
    assert _expand_inputs([str(d / "*.parquet")]) == [str(d / "a.parquet")]
    assert _expand_inputs(["s3://bucket/x/*.parquet"]) == [
        "s3://bucket/x/*.parquet"
    ]


def test_parse_tiers_validated():
    t = _parse_tiers("8,32,128")
    assert [x.width for x in t] == [8, 32, 128]


def test_job_end_to_end_and_resume(ray_session, tmp_path):
    from anofox_forecast_ray.corpus import write_corpus

    c1 = write_corpus(str(tmp_path / "c1.parquet"), 120, seed=3,
                      mean_len=200, sigma=0.8)
    c2 = write_corpus(str(tmp_path / "c2.parquet"), 80, seed=4,
                      mean_len=200, sigma=0.8)
    corpus = str(tmp_path / "c*.parquet")
    del c1, c2
    out = str(tmp_path / "store")
    mfile = str(tmp_path / "m.json")
    m1 = main([
        "--input", corpus, "--out", out, "--shards", "2",
        "--tiers", "8,32", "--no-forecast", "--no-gorilla",
        "--metrics-out", mfile,
    ])
    assert m1["shards_total"] == 2 and m1["shards_skipped"] == 0
    assert m1["rollup_rows"] > 0 and m1["token_count"] > 0
    assert json.load(open(mfile))["rollup_rows"] == m1["rollup_rows"]
    rows1 = pq.read_table(os.path.join(out, "rollup")).num_rows
    assert rows1 == m1["rollup_rows"]

    # resubmit: both shards skip, store untouched
    m2 = main([
        "--input", corpus, "--out", out, "--shards", "2",
        "--tiers", "8,32", "--no-forecast", "--no-gorilla",
    ])
    assert m2["shards_skipped"] == 2 and m2["rollup_rows"] == 0
    assert pq.read_table(os.path.join(out, "rollup")).num_rows == rows1

    # --no-resume replays and produces the same store row count
    shutil.rmtree(os.path.join(out, "rollup"))
    m3 = main([
        "--input", corpus, "--out", out, "--shards", "2",
        "--tiers", "8,32", "--no-forecast", "--no-gorilla", "--no-resume",
    ])
    assert m3["shards_skipped"] == 0
    assert pq.read_table(os.path.join(out, "rollup")).num_rows == rows1
