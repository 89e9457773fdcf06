"""Scale-envelope regression for the bigram-LM merge (VERDICT r2 item 6):
the hash-partitioned sharded merge promised in extras/lm.py's docstring /
DESIGN_100TB must (a) actually fire past the threshold and (b) produce the
exact same model and scoring as the tree-reduce path."""

import numpy as np
import pyarrow as pa


def _synth_corpus(n_docs=200, doc_len=600, vocab=50_000, seed=17):
    """Random int32 tokens over a 50k vocab: ~n_docs*doc_len distinct
    observed bigrams — the wide-vocab regime the envelope is about."""
    rng = np.random.default_rng(seed)
    toks = [rng.integers(0, vocab, size=doc_len).astype(np.int32)
            for _ in range(n_docs)]
    return pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(n_docs)],
                               type=pa.string()),
            "tokens": pa.array([t.tolist() for t in toks],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([doc_len] * n_docs, type=pa.int32()),
            "source": pa.array(["s"] * n_docs, type=pa.string()),
        }
    )


def test_sharded_merge_fires_and_matches_tree(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.extras.lm import (
        LAST_MERGE_PATH,
        train_bigram_model,
    )

    t = _synth_corpus()

    def mk():
        return rd.from_arrow(t).repartition(8)

    tree = train_bigram_model(mk(), shard_merge_threshold=10**12)
    assert LAST_MERGE_PATH["path"] == "tree"
    assert LAST_MERGE_PATH["partial_rows"] > 100_000  # wide vocab fanout

    shard = train_bigram_model(mk(), shard_merge_threshold=0,
                               n_merge_shards=16)
    assert LAST_MERGE_PATH["path"] == "sharded"

    # identical model arrays, bit for bit
    for a, b, name in zip(tree, shard,
                          ("keys", "c2", "a_keys", "c1", "v", "ltab")):
        if name == "v":
            assert a == b
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_sharded_scoring_hashes_match(ray_session):
    """End-to-end: perplexity scoring through the sharded-merge model
    equals the tree-reduce model on every doc (the VERDICT 'same scoring
    hashes' criterion)."""
    import ray
    import ray.data as rd

    from anofox_forecast_ray.extras.lm import (
        LAST_MERGE_PATH,
        BigramScoreStage,
        train_bigram_model,
    )

    t = _synth_corpus(n_docs=60, doc_len=300)

    def mk():
        return rd.from_arrow(t).repartition(4)

    outs = {}
    for label, thr in (("tree", 10**12), ("sharded", 0)):
        model = train_bigram_model(mk(), shard_merge_threshold=thr)
        assert LAST_MERGE_PATH["path"] == label
        ref = ray.put(model)
        outs[label] = (
            mk()
            .map_batches(BigramScoreStage, batch_format="pyarrow",
                         concurrency=2, fn_constructor_args=(ref,))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    a, b = outs["tree"], outs["sharded"]
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == np.float64:
            assert np.array_equal(av, bv)  # bitwise, incl. NaN-free
        else:
            assert (av == bv).all()


def test_default_threshold_keeps_tree_path_for_char_vocab(ray_session):
    """The sandbox corpus (codepoint vocab) must stay on the cheap
    tree-reduce path under the default threshold."""
    import ray.data as rd

    from anofox_forecast_ray.extras.lm import (
        LAST_MERGE_PATH,
        train_bigram_model,
    )

    rows = [("a", "hello world"), ("b", "hollow word")]
    from anofox_forecast_ray.corpus import tokens_from_text_batch

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
                "source": pa.array(["s"] * len(rows), type=pa.string()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).map_batches(tokens_from_text_batch, batch_format="pyarrow")
    train_bigram_model(ds)
    assert LAST_MERGE_PATH["path"] == "tree"


def test_sharded_model_scoring_bitwise(ray_session):
    """The final LM envelope: scoring against a hash-SHARDED model
    (shard_bigram_model + BigramScoreStageSharded) must equal the
    broadcast scorer bit for bit — the per-doc fold order (ascending
    bigram key) is shard-independent by construction."""
    import ray
    import ray.data as rd

    from anofox_forecast_ray.extras.lm import (
        BigramScoreStage,
        BigramScoreStageSharded,
        shard_bigram_model,
        train_bigram_model,
    )

    t = _synth_corpus(n_docs=80, doc_len=250, vocab=5000, seed=5)

    def mk():
        return rd.from_arrow(t).repartition(4)

    model = train_bigram_model(mk())
    broadcast = (
        mk()
        .map_batches(BigramScoreStage, batch_format="pyarrow",
                     concurrency=2, fn_constructor_args=(ray.put(model),))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    shard_refs = shard_bigram_model(model, n_shards=8)
    sharded = (
        mk()
        .map_batches(BigramScoreStageSharded, batch_format="pyarrow",
                     concurrency=2, fn_constructor_args=(shard_refs,))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    cols = ["doc_id", "n_bigrams", "logprob", "mean_logprob"]
    for c in cols:
        av = broadcast[c].to_numpy()
        bv = sharded[c].to_numpy()
        if av.dtype == np.float64:
            assert np.array_equal(av, bv)
        else:
            assert (av.astype(str) == bv.astype(str)).all()
    # shards form a partition of the key space
    keys = model[0]
    total = sum(ray.get(r)[0].size for r in shard_refs)
    assert total == keys.size
