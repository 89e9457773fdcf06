"""Wave-14: decontamination, conformal naive intervals, vocab coverage,
hourly distinct users, source HHI.

The oracle gate covers bitwise parity on the synthetic corpus; these
tests exercise adversarial shapes (hand-built contamination graphs,
short docs, empty text) against brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_shingles(text, k=16):
    base, m = 1000003, 1 << 64
    out = set()
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i : i + k]:
            h = (h * base + ord(ch)) % m
        out.add(h)
    return out


def test_decontaminate_flags_shared_shingles(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.decontam import decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog again"
    dirty = "xx " + bench_text[5:29] + " yy zz unrelated tail words"
    clean = "completely different words with no overlap whatsoever here"
    short = "tiny"  # < K chars: 0 shingles, clean by definition
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array([bench_text, dirty, clean, short]),
        }
    )

    out = (
        decontaminate(lambda: rd.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0 is benchmark (0 % 97 == 0) -> excluded from the scan
    assert list(out.index) == [1, 2, 3]
    bench = _brute_shingles(bench_text)
    for did, text in [(1, dirty), (2, clean), (3, short)]:
        sh = _brute_shingles(text)
        hits = len(sh & bench)
        assert out.loc[did, "n_shingles"] == len(sh)
        assert out.loc[did, "n_hits"] == hits
        assert out.loc[did, "contaminated"] == (1 if hits else 0)
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_shingles"] == 0


def test_conformal_naive_brute_force(ray_session, sf_dir):
    from anofox_forecast_ray.pipelines.queries_wave14 import (
        _conformal_naive_query,
    )

    q, _ = _conformal_naive_query(8)
    got = q(sf_dir).to_pandas().set_index("doc_id").sort_index()

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_checked = 0
    for did, text in zip(docs["doc_id"].to_pylist(),
                         docs["text"].to_pylist()):
        codes = np.array([ord(c) for c in (text or "")], dtype=np.int64)
        nw = len(codes) // 8 + (1 if len(codes) % 8 else 0)
        if nw < 4:
            assert str(did) not in got.index
            continue
        sums = np.add.reduceat(codes, np.arange(0, len(codes), 8))
        row = got.loc[str(did)]
        q75 = np.quantile(np.abs(np.diff(sums)), 0.75)
        assert row["n"] == nw
        assert row["point"] == float(sums[-1])
        assert row["q75"] == q75
        assert row["lo"] == float(sums[-1]) - q75
        assert row["hi"] == float(sums[-1]) + q75
        n_checked += 1
    assert n_checked == len(got)


def test_vocab_coverage_brute_force(ray_session, sf_dir):
    from collections import Counter

    from anofox_forecast_ray.pipelines.queries_wave14 import (
        VOCAB_K,
        _vocab_coverage_query,
    )

    q, _ = _vocab_coverage_query()
    got = q(sf_dir).to_pandas().set_index("source").sort_index()

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    cnt = Counter()
    for text in docs["text"].to_pylist():
        cnt.update((text or "").split())
    top = set(
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_K
        ]
    )
    per_src: dict = {}
    for src, text in zip(docs["source"].to_pylist(),
                         docs["text"].to_pylist()):
        a = per_src.setdefault(src, [0, 0])
        for w in (text or "").split():
            a[0] += w in top
            a[1] += 1
    for src, (cov, tot) in per_src.items():
        assert got.loc[src, "covered"] == cov
        assert got.loc[src, "total"] == tot
        assert got.loc[src, "coverage"] == cov / tot
    assert len(got) == len(per_src)


def test_hourly_distinct_users_brute_force(ray_session, sf_dir):
    from anofox_forecast_ray.pipelines.queries_wave14 import (
        _hourly_users_query,
    )

    q, _ = _hourly_users_query()
    got = q(sf_dir).to_pandas().set_index("hour_id").sort_index()

    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["hour_id"] = ev["ts"].astype("int64") // 3_600_000_000
    want = ev.groupby("hour_id")["user_id"].nunique()
    assert len(got) == len(want)
    assert (got["n_users"] == want.loc[got.index]).all()


def test_source_hhi_brute_force(ray_session, sf_dir):
    from collections import Counter

    from anofox_forecast_ray.pipelines.queries_wave14 import (
        _source_hhi_query,
    )

    q, _ = _source_hhi_query()
    got = q(sf_dir).to_pandas().set_index("source").sort_index()

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    per_src: dict = {}
    for src, text in zip(docs["source"].to_pylist(),
                         docs["text"].to_pylist()):
        per_src.setdefault(src, Counter()).update((text or "").split())
    for src, c in per_src.items():
        tot = sum(c.values())
        sq = sum(v * v for v in c.values())
        assert got.loc[src, "n_tokens"] == tot
        assert got.loc[src, "n_types"] == len(c)
        assert got.loc[src, "hhi"] == np.float64(sq) / np.float64(tot * tot)
    assert len(got) == len(per_src)


def test_hourly_distinct_pairs_prededup_shrinks(ray_session):
    """The block-level pair dedup must reduce N repeated rows of the same
    (hour,user) to one row before the shuffle."""
    import ray.data as rd

    from anofox_forecast_ray.pipelines.queries_wave14 import (
        _hourly_users_query,
    )

    ts = pa.array([1_000_000] * 1000 + [3_600_000_000 + 5] * 3,
                  type=pa.timestamp("us"))
    uid = pa.array([7] * 1000 + [1, 2, 1], type=pa.int64())
    t = pa.table({"ts": ts, "user_id": uid})
    import anofox_forecast_ray.pipelines.queries_wave14 as w14

    orig = w14._events
    try:
        w14._events = lambda sf_dir, columns: rd.from_arrow(t)
        q, _ = _hourly_users_query()
        out = q("ignored").to_pandas().set_index("hour_id").sort_index()
    finally:
        w14._events = orig
    assert out.loc[0, "n_users"] == 1
    assert out.loc[1, "n_users"] == 2
