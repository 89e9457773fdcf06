"""Distributed BPE tokenizer training (top-K merges) over the corpus.

The canonical tokenizer-fit loop (Sennrich et al. 2016): repeatedly
count adjacent-pair frequencies, merge the most frequent pair into a
new token id, rewrite the corpus, repeat. Per round:

  1. COUNT: per-batch np.unique bigram partials (bounded by observed
     pairs), tree-reduced — token rows never shuffle;
  2. PICK: deterministic argmax by (cnt desc, t0 asc, t1 asc);
  3. MERGE: one vectorized map_batches rewrite — greedy left-to-right
     non-overlapping replacement inside each doc (overlaps only arise
     for a==b runs; resolved by even-offset-within-run parity, the
     exact semantics of a sequential scan). The rewritten corpus is
     materialized per round (iterative algorithm — same checkpoint
     discipline as extras/components.py label propagation; the object
     store holds the working set, nothing lands on the driver).

New ids start at NEW_ID_BASE (above the unicode codepoint space) so
merged tokens never collide with input tokens. Determinism: integer
counts, total-order tie-break, content-only rewrite — retries and any
partitioning give identical rules (golden-checked against a pure
sequential Python BPE in tools/golden_oracles.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NEW_ID_BASE = 1 << 21  # codepoints < 2^21
_SHIFT = 32  # pair key = t0 << 32 | t1 (ids < 2^31)


def merge_pair_flat(values: np.ndarray, lengths: np.ndarray,
                    a: int, b: int, new_id: int):
    """Greedy left-to-right non-overlapping (a,b)->new_id within docs.
    Returns (new_values, new_lengths)."""
    if values.size < 2:
        return values, lengths
    m = (values[:-1] == a) & (values[1:] == b)
    ends = np.cumsum(lengths)[:-1] - 1  # pair index spanning a boundary
    ok = (ends >= 0) & (ends < m.size)
    m[ends[ok]] = False
    if not m.any():
        return values, lengths
    idx = np.arange(m.size, dtype=np.int64)
    run_start = m & ~np.concatenate(([False], m[:-1]))
    start_idx = np.maximum.accumulate(np.where(run_start, idx, -1))
    keep = m & ((idx - start_idx) % 2 == 0)
    kept = np.flatnonzero(keep)
    out = values.copy()
    out[kept] = new_id
    drop = np.zeros(values.size, dtype=bool)
    drop[kept + 1] = True
    doc_end = np.cumsum(lengths)
    doc_of = np.searchsorted(doc_end, kept, side="right")
    mc = np.bincount(doc_of, minlength=lengths.size).astype(lengths.dtype)
    return out[~drop], lengths - mc


class MergePairStage:
    """map_batches(pyarrow): rewrite the tokens list column with one
    merge rule."""

    def __init__(self, a: int, b: int, new_id: int):
        self.a, self.b, self.new_id = int(a), int(b), int(new_id)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.rollup import _flat_tokens

        values, lengths = _flat_tokens(t)
        nv, nl = merge_pair_flat(
            values.astype(np.int32, copy=False),
            lengths,
            self.a, self.b, self.new_id,
        )
        offsets = np.concatenate(([0], np.cumsum(nl))).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(nv, type=pa.int32())
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tokens": tokens,
                "n_tok": pa.array(nl.astype(np.int32), type=pa.int32()),
                "source": t.column("source"),
            }
        )


def _pair_counts(ds) -> pa.Table:
    from ..stages.rollup import _flat_tokens
    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        values, lengths = _flat_tokens(t)
        empty = pa.table(
            {"key": pa.array([], type=pa.int64()),
             "cnt": pa.array([], type=pa.int64())}
        )
        if values.size < 2:
            return empty
        v = values.astype(np.int64)
        keys = (v[:-1] << _SHIFT) | v[1:]
        ends = np.cumsum(lengths)[:-1] - 1
        keep = np.ones(keys.size, dtype=bool)
        ok = (ends >= 0) & (ends < keys.size)
        keep[ends[ok]] = False
        keys = keys[keep]
        if keys.size == 0:
            return empty
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {"key": pa.array(uk, type=pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())}
        )

    def merge(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        uk, start = np.unique(k[order], return_index=True)
        return pa.table(
            {"key": pa.array(uk, type=pa.int64()),
             "cnt": pa.array(
                 np.add.reduceat(c[order], start).astype(np.int64),
                 type=pa.int64())}
        )

    refs = list(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    )
    if not refs:
        return pa.table(
            {"key": pa.array([], type=pa.int64()),
             "cnt": pa.array([], type=pa.int64())}
        )
    return tree_reduce_tables(refs, merge)


def train_bpe(ds, k: int = 6, min_count: int = 2):
    """corpus Dataset -> (rules, final_ds). rules = list of
    (t0, t1, new_id, cnt) in merge order. The most frequent pair wins
    each round; ties break by (t0 asc, t1 asc); stops early when the
    best count drops below ``min_count``."""
    rules: list[tuple[int, int, int, int]] = []
    for i in range(k):
        counts = _pair_counts(ds)
        key = counts.column("key").to_numpy(zero_copy_only=False)
        cnt = counts.column("cnt").to_numpy(zero_copy_only=False)
        if key.size == 0:
            break
        t0 = key >> _SHIFT
        t1 = key & ((np.int64(1) << _SHIFT) - 1)
        best = np.lexsort((t1, t0, -cnt))[0]
        if cnt[best] < min_count:
            break
        a, b, c = int(t0[best]), int(t1[best]), int(cnt[best])
        new_id = NEW_ID_BASE + i
        rules.append((a, b, new_id, c))
        ds = ds.map_batches(
            MergePairStage(a, b, new_id), batch_format="pyarrow"
        ).materialize()
    return rules, ds


def bpe_merges_sequential(texts, k: int = 6, min_count: int = 2):
    """Pure sequential reference BPE (the golden oracle): same counts,
    same tie-break, same greedy scan — no numpy, no Ray."""
    docs = [[ord(ch) for ch in (t or "")] for t in texts]
    rules = []
    for i in range(k):
        counts: dict[tuple[int, int], int] = {}
        for d in docs:
            for x, y in zip(d, d[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        new_id = NEW_ID_BASE + i
        rules.append((a, b, new_id, c))
        nxt = []
        for d in docs:
            out, j = [], 0
            while j < len(d):
                if j + 1 < len(d) and d[j] == a and d[j + 1] == b:
                    out.append(new_id)
                    j += 2
                else:
                    out.append(d[j])
                    j += 1
            nxt.append(out)
        docs = nxt
    return rules, docs
