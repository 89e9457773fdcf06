"""Trivially-sequential NumPy oracle for the rollup engine (FIXTURES.md §2).

Single process, per-doc Python loop — deliberately simple and obviously
correct; engine output must match BITWISE at every tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def oracle_rollup(corpus: pa.Table, tiers) -> pd.DataFrame:
    rows = []
    doc_ids = corpus.column("doc_id").to_pylist()
    tokens = corpus.column("tokens").to_pylist()
    sources = corpus.column("source").to_pylist()
    for doc_id, toks, source in zip(doc_ids, tokens, sources):
        arr = np.asarray(toks, dtype=np.int64)
        for tier in tiers:
            w = tier.width
            for k in range(0, (len(arr) + w - 1) // w):
                seg = arr[k * w : (k + 1) * w]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "source": source,
                        "tier": tier.name,
                        "window_id": k,
                        "cnt": len(seg),
                        "sum": int(seg.sum()),
                        "min": int(seg.min()),
                        "max": int(seg.max()),
                        "mean": float(int(seg.sum()) / len(seg)),
                    }
                )
    return pd.DataFrame(rows)


def sort_rollup(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["doc_id", "tier", "window_id"])
        .reset_index(drop=True)
        .astype({"cnt": "int64", "sum": "int64", "min": "int32", "max": "int32"})
    )
