"""Dedup / ANN / text-stats / multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anofox_forecast_ray.extras.dedup import (
    MinHasher,
    ngram_jaccard,
    signature_jaccard,
    simhash64,
    hamming64,
)


def test_minhash_estimates_jaccard():
    h = MinHasher(num_perm=128, seed=1)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    c = "completely different content with no overlap at all zzz qqq"
    true_ab = ngram_jaccard(a, b)
    est_ab = signature_jaccard(h.signature(a), h.signature(b))
    assert est_ab == pytest.approx(true_ab, abs=0.15)
    est_ac = signature_jaccard(h.signature(a), h.signature(c))
    assert est_ac < 0.2
    assert signature_jaccard(h.signature(a), h.signature(a)) == 1.0


def test_simhash_near_vs_far():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a.replace("lazy", "hazy")
    c = "totally unrelated text about spacecraft engineering and orbits " * 8
    assert hamming64(simhash64(a), simhash64(b)) < 10
    assert hamming64(simhash64(a), simhash64(c)) > 15


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_pipeline_finds_planted_dups():
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import minhash_candidate_pairs

    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(words, 60)))
    # plant near-duplicates
    docs.append(docs[0].replace("alpha", "beta", 1))
    docs.append(docs[5])
    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(docs))]),
                  "text": pa.array(docs)})
    pairs = minhash_candidate_pairs(rd.from_arrow(t), threshold=0.6).to_pandas()
    found = {tuple(sorted((r.doc_a, r.doc_b))) for r in pairs.itertuples()}
    assert ("0", "40") in found
    assert ("41", "5") in found or ("5", "41") in found


@pytest.mark.usefixtures("ray_session")
def test_brute_force_topk_matches_numpy(sf_dir):
    import ray.data as rd

    from anofox_forecast_ray.extras.ann import brute_force_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    df = ds.to_pandas()
    mat = np.array(df["embedding"].tolist(), dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = mat[:3]  # use first 3 vectors as queries
    got = brute_force_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                           queries, k=5).to_pandas()
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = mat_n @ qn.T
    for q in range(3):
        want_top = set(
            df["vec_id"].to_numpy()[np.argsort(-sims[:, q])[:5]].tolist()
        )
        got_top = set(got[got.query_id == q]["vec_id"].tolist())
        assert got_top == want_top, q
        # rank 1 must be the query itself (cosine 1)
        r1 = got[(got.query_id == q) & (got["rank"] == 1)].iloc[0]
        assert r1["score"] == pytest.approx(1.0, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall(sf_dir):
    import ray.data as rd

    from anofox_forecast_ray.extras.ann import brute_force_topk, ivf_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    df = ds.to_pandas()
    queries = np.array(df["embedding"].tolist(), dtype=np.float64)[:3]
    exact = brute_force_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                             queries, k=5).to_pandas()
    approx = ivf_topk(rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                      queries, k=5, n_clusters=8, n_probe=4).to_pandas()
    recalls = []
    for q in range(3):
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # probing half the lists


@pytest.mark.usefixtures("ray_session")
def test_textstats_stages(sf_dir):
    import ray.data as rd

    from anofox_forecast_ray.extras.textstats import (
        FingerprintStage,
        LangIdStage,
        QualityScoreStage,
        TokenCountStage,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    q = ds.map_batches(QualityScoreStage, batch_format="pyarrow",
                       concurrency=2).to_pandas()
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()
    assert (q["n_words"] > 0).all()

    tc = ds.map_batches(TokenCountStage, batch_format="pyarrow",
                        concurrency=2).to_pandas()
    assert (tc["n_bpe_tokens"] >= tc["n_ws_tokens"]).all()

    li = ds.map_batches(LangIdStage, batch_format="pyarrow",
                        concurrency=2).to_pandas()
    assert set(li["lang_pred"]) <= {"en", "de", "fr", "es", "unknown"}

    fp = ds.map_batches(FingerprintStage, batch_format="pyarrow",
                        concurrency=2).to_pandas()
    assert fp["fingerprint"].nunique() == len(fp)  # distinct docs
    # determinism
    fp2 = ds.map_batches(FingerprintStage, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    a = fp.sort_values("doc_id").reset_index(drop=True)
    b = fp2.sort_values("doc_id").reset_index(drop=True)
    assert (a["fingerprint"] == b["fingerprint"]).all()


@pytest.mark.usefixtures("ray_session")
def test_multimodal_plumbing():
    import ray.data as rd

    from anofox_forecast_ray.extras.multimodal import (
        decode_image,
        make_fake_media_table,
        multimodal_pipeline,
    )

    t = make_fake_media_table(20, kind="image")
    out = multimodal_pipeline(rd.from_arrow(t), kind="image").to_pandas()
    assert len(out) == 20
    assert ((out["mean_r"] >= 0) & (out["mean_r"] <= 255)).all()
    assert (out["thumb"].map(len) == 8 * 8 * 3).all()
    # stub raises without fake
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
    # deterministic decode
    img1 = decode_image(b"same-bytes", fake=True)
    img2 = decode_image(b"same-bytes", fake=True)
    assert (img1 == img2).all()

    t2 = make_fake_media_table(10, kind="audio")
    out2 = multimodal_pipeline(rd.from_arrow(t2), kind="audio").to_pandas()
    assert len(out2) == 10 and (out2["n_frames"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_video_frame_stage():
    import ray.data as rd

    from anofox_forecast_ray.extras.multimodal import (
        VideoFrameStage,
        decode_video,
        make_fake_media_table,
        multimodal_pipeline,
    )

    with pytest.raises(NotImplementedError):
        decode_video(b"xx", fake=False)

    # hand-checkable payload: 2 frames of 192 bytes (h=w=8)
    fs = 8 * 8 * 3
    payload = bytes([10] * fs + [30] * fs) + b"remainder"
    frames = decode_video(payload, fake=True)
    assert frames.shape == (2, fs)
    stage = VideoFrameStage(sample=4)
    out = stage(
        __import__("pyarrow").table(
            {"doc_id": ["d0"], "payload": [payload]}
        )
    ).to_pandas()
    assert out.loc[0, "n_frames"] == 2
    assert out.loc[0, "sampled_frames"] == 2
    assert out.loc[0, "brightness_mean"] == pytest.approx(20.0, abs=0)
    assert out.loc[0, "motion_mean"] == pytest.approx(20.0, abs=0)

    # single-frame doc: motion is NaN
    one = stage(
        __import__("pyarrow").table(
            {"doc_id": ["d1"], "payload": [bytes([7] * fs)]}
        )
    ).to_pandas()
    assert one.loc[0, "sampled_frames"] == 1
    assert np.isnan(one.loc[0, "motion_mean"])

    # sub-frame payloads are skipped; pipeline path runs end-to-end
    t = make_fake_media_table(12, kind="video")
    out3 = multimodal_pipeline(rd.from_arrow(t), kind="video").to_pandas()
    assert len(out3) == 12
    assert (out3["n_frames"] == 2048 // fs).all()
    # sampling index math: nf=10, k=4 -> frames 0,3,6,9
    stage2 = VideoFrameStage(sample=4)
    b = np.arange(10 * fs, dtype=np.int64) % 256
    fr = b.reshape(10, fs)
    idxs = (np.arange(4, dtype=np.int64) * 9) // 3
    assert list(idxs) == [0, 3, 6, 9]
    got = stage2(
        __import__("pyarrow").table(
            {"doc_id": ["d2"], "payload": [b.astype(np.uint8).tobytes()]}
        )
    ).to_pandas()
    sel = fr[idxs]
    exp_b = sel.sum() / (4 * fs)
    exp_m = np.abs(sel[1:] - sel[:-1]).sum() / (3 * fs)
    assert got.loc[0, "brightness_mean"] == pytest.approx(exp_b, abs=0)
    assert got.loc[0, "motion_mean"] == pytest.approx(exp_m, abs=0)


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dups_pipeline():
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import simhash_near_dups

    rng = np.random.default_rng(1)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [" ".join(rng.choice(words, 80)) for _ in range(30)]
    docs.append(docs[3].replace("alpha", "omega", 1))  # near-dup of 3
    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(docs))]),
                  "text": pa.array(docs)})
    pairs = simhash_near_dups(rd.from_arrow(t), max_distance=6).to_pandas()
    found = {tuple(sorted((r.doc_a, r.doc_b))) for r in pairs.itertuples()}
    assert ("3", "30") in found


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups(sf_dir):
    import ray.data as rd

    from anofox_forecast_ray.extras.dedup import embedding_near_dups

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.to_pandas()
    # plant an exact duplicate vector with a new id
    dup = pa.table({
        "vec_id": pa.array([99999], type=pa.int64()),
        "embedding": pa.array([df["embedding"].iloc[0]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0], type=pa.int32()),
    })
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet").union(
        rd.from_arrow(dup)
    )
    pairs = embedding_near_dups(ds, threshold=0.999).to_pandas()
    v0 = int(df["vec_id"].iloc[0])
    hit = pairs[
        ((pairs.id_a == v0) & (pairs.id_b == 99999))
        | ((pairs.id_a == 99999) & (pairs.id_b == v0))
    ]
    assert len(hit) == 1 and hit["cosine"].iloc[0] > 0.999
