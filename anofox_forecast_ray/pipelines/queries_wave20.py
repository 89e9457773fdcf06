"""Twentieth query wave: distributed BPE tokenizer training — the
tokenizer-fit loop (count pairs -> merge argmax -> rewrite corpus) run
as K rounds of bounded-partial counting + one vectorized map_batches
rewrite per round. Golden-checked against a pure sequential Python BPE
(tools/golden_oracles.check_bpe) — merge rules, tie-breaks and the
rewritten token count are all-integer exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import corpus_ds

BPE_K = 6


def _bpe_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.bpe import train_bpe

        rules, final = train_bpe(corpus_ds(sf_dir), k=BPE_K)
        tokens_after = int(final.sum("n_tok") or 0)
        n = len(rules)
        return rd.from_arrow(
            pa.table(
                {
                    "rnk": pa.array(
                        np.arange(1, n + 1, dtype=np.int64),
                        type=pa.int64(),
                    ),
                    "t0": pa.array(
                        [r[0] for r in rules], type=pa.int64()
                    ),
                    "t1": pa.array(
                        [r[1] for r in rules], type=pa.int64()
                    ),
                    "new_id": pa.array(
                        [r[2] for r in rules], type=pa.int64()
                    ),
                    "cnt": pa.array(
                        [r[3] for r in rules], type=pa.int64()
                    ),
                    "tokens_after": pa.array(
                        [tokens_after] * n, type=pa.int64()
                    ),
                }
            )
        )

    return q


def build_wave20_queries():
    queries, oracles = {}, {}
    queries[f"bpe_train_merges_k{BPE_K}"] = _bpe_query()
    # non-SQL-expressible (iterative corpus rewrite): golden oracle in
    # tools/golden_oracles.py (check_bpe) — no oracle_sql entry
    return queries, oracles
