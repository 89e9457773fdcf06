"""Wave-18: bigram conditional entropy, hash split assignment,
overlapping chunker — hand-computable cases plus the boundary shapes
(deterministic next-token, exact hop/window multiples, tail chunks)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

import anofox_forecast_ray.pipelines.queries_wave18 as w18


def _corpus(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tokens": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


@pytest.fixture
def patch_corpus(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(
            w18, "corpus_ds", lambda sf_dir: rd.from_arrow(table)
        )

    return _patch


def test_cond_entropy_deterministic_stream(ray_session, patch_corpus):
    # every 'a' is followed by 'b' and vice versa -> H(next|prev) = 0
    patch_corpus(_corpus([("1", [1, 2, 1, 2, 1], "s")]))
    q, _ = w18._cond_entropy_query()
    out = q("x").to_pandas()
    assert out.loc[0, "n_bigrams"] == 4
    assert out.loc[0, "n_pairs"] == 2
    assert out.loc[0, "cond_entropy"] == 0.0


def test_cond_entropy_uniform_choice(ray_session, patch_corpus):
    # after 1: {2, 3} equally -> H = ln 2; doc boundaries cut bigrams
    patch_corpus(_corpus([("1", [1, 2], "s"), ("2", [1, 3], "s")]))
    q, _ = w18._cond_entropy_query()
    out = q("x").to_pandas()
    assert out.loc[0, "n_bigrams"] == 2
    assert out.loc[0, "cond_entropy"] == pytest.approx(math.log(2), abs=0)


def test_split_assign_matches_hashlib(ray_session, monkeypatch):
    import ray.data as rd

    ids = list(range(200))
    docs = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(["s"] * 200),
            "n_chars": pa.array([1] * 200, type=pa.int64()),
        }
    )
    monkeypatch.setattr(
        w18,
        "_docs",
        lambda sf_dir, columns: rd.from_arrow(docs.select(columns)),
    )
    q, _ = w18._split_assign_query()
    out = q("x").to_pandas().set_index("split")
    want = {"train": 0, "val": 0, "test": 0}
    for d in ids:
        hx = hashlib.sha256(str(d).encode()).hexdigest()[:2]
        want[
            "train" if hx < w18.TRAIN_HEX else
            "val" if hx < w18.VAL_HEX else "test"
        ] += 1
    for k, v in want.items():
        if v:
            assert out.loc[k, "n_docs"] == v
    assert int(out["n_docs"].sum()) == 200


def test_chunk_overlap_boundaries(ray_session, patch_corpus):
    w, hop = w18.CHUNK_W, w18.CHUNK_HOP
    toks_a = list(range(w))          # n = 128 -> starts 0, 64
    toks_b = list(range(hop))        # n = 64  -> one chunk
    toks_c = list(range(w + 1))      # n = 129 -> starts 0, 64, 128
    patch_corpus(
        _corpus([("1", toks_a, "s"), ("2", toks_b, "s"), ("3", toks_c, "s")])
    )
    q, _ = w18._chunk_overlap_query()
    out = q("x").to_pandas()
    a = out[out.doc_id == "1"].sort_values("chunk_id")
    assert list(a["start"]) == [0, hop] and list(a["len"]) == [w, hop]
    assert a.iloc[0]["sum"] == sum(toks_a)
    assert a.iloc[1]["sum"] == sum(toks_a[hop:])
    b = out[out.doc_id == "2"]
    assert len(b) == 1 and b.iloc[0]["len"] == hop
    c = out[out.doc_id == "3"].sort_values("chunk_id")
    assert list(c["start"]) == [0, hop, 2 * hop]
    assert list(c["len"]) == [w, hop + 1, 1]
    assert c.iloc[2]["sum"] == toks_c[-1]
