"""Corpus construction: the authoritative input table
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

Two deterministic producers:

1. ``tokens_from_text_batch`` — derives the corpus from the testdata
   ``documents`` table: ``tokens[i] = unicode codepoint of text[i]``.
   This keeps the DuckDB oracle exact (``unicode(unnest(string_split(
   text,'')))``) and all aggregates integer-exact.

2. ``generate_corpus`` — seeded synthetic generator (rng(42)) with a
   heavy-tailed length distribution (a few docs >= 100x median to exercise
   the chunk-aligned long-doc path), per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized text -> (flat codepoints int32, per-row char lengths)."""
    joined = "".join(texts)
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int32)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return flat, lengths


def tokens_from_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches(pyarrow) stage: documents(text) -> corpus(tokens).

    Output schema: doc_id:string, tokens:list<int32>, n_tok:int32,
    source:string. doc_id is cast to string (input_hint shape).
    """
    texts = batch.column("text").to_pylist()
    flat, lengths = _codepoints([t if t is not None else "" for t in texts])
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": batch.column("source"),
        }
    )


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    mean_len: float = 512.0,
    sigma: float = 1.0,
    vocab: int = 50257,
    n_heavy: int = 3,
    heavy_factor: int = 100,
    sources: tuple[str, ...] = ("web", "books", "code", "wiki"),
) -> pa.Table:
    """Deterministic synthetic corpus (FIXTURES.md §1).

    Lognormal lengths (heavy-tailed) + ``n_heavy`` docs stretched to
    ``heavy_factor`` x median length to exercise salted chunking.
    """
    rng = np.random.default_rng(seed)
    lengths = np.maximum(
        1, rng.lognormal(np.log(mean_len), sigma, n_docs).astype(np.int64)
    )
    if n_docs > n_heavy > 0:
        idx = rng.choice(n_docs, size=n_heavy, replace=False)
        lengths[idx] = int(np.median(lengths)) * heavy_factor
    flat = rng.integers(0, vocab, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    values = pa.array(flat, type=pa.int32())
    if offsets[-1] < 2**31:
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)), values
        )
    else:  # >2B tokens in one table: large_list offsets
        tokens = pa.LargeListArray.from_arrays(pa.array(offsets), values)
    src = rng.integers(0, len(sources), size=n_docs)
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:08d}" for i in range(n_docs)]),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array([sources[s] for s in src]),
        }
    )


def write_corpus(
    path: str, n_docs: int, seed: int = 42, row_group_size: int = 256, **kw
) -> str:
    """Small row groups are deliberate: Ray's parquet reader cannot split
    below row-group granularity, so one big row group = a serial read."""
    import pyarrow.parquet as pq

    pq.write_table(
        generate_corpus(n_docs, seed=seed, **kw), path,
        row_group_size=row_group_size,
    )
    return path
