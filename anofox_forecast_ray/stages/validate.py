"""Corpus validation guards.

The reference validates construction invariants (strictly-increasing
timestamps, duplicate rejection — time_series.rs:262-366, 1279-1301). The
engine's analogues over the corpus table (SURVEY.md §2.8 "doc_id
uniqueness check = GB-agg count>1 -> error rows"):

- ``duplicate_doc_ids``: GB-agg on doc_id, keep count > 1 (error rows —
  reported, never crashing the pipeline)
- ``validate_corpus_batch``: per-batch structural checks (n_tok ==
  len(tokens), non-negative lengths) emitting violation rows
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def duplicate_doc_ids(corpus_ds):
    """Dataset of (doc_id, dup_count) for doc_ids appearing more than once."""
    from ray.data.aggregate import Count

    counts = corpus_ds.groupby("doc_id").aggregate(Count(alias_name="dup_count"))
    return counts.filter(lambda r: r["dup_count"] > 1)


def validate_corpus_batch(batch: pa.Table) -> pa.Table:
    """Structural violations per row: kind in {n_tok_mismatch}."""
    from .rollup import _flat_tokens

    _, lengths = _flat_tokens(batch)
    n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
    bad = np.flatnonzero(lengths != n_tok)
    ids = batch.column("doc_id").take(pa.array(bad)).cast(pa.string())
    return pa.table(
        {
            "doc_id": ids,
            "kind": pa.array(["n_tok_mismatch"] * bad.size, type=pa.string()),
            "expected": pa.array(n_tok[bad]),
            "actual": pa.array(lengths[bad]),
        }
    )


def corpus_violations(corpus_ds):
    return corpus_ds.map_batches(validate_corpus_batch, batch_format="pyarrow")
