"""Distinct-count sketches over token streams.

HyperLogLog (Flajolet et al. 2007) with sha256-derived hashes so every
register update is a deterministic integer operation — which makes the
whole sketch, including its float estimate, replayable bit-for-bit by a
DuckDB oracle (the estimate's harmonic sum is a SEQUENTIAL fold over
registers in index order, per the repo's float-fold invariant).

Scale shape: per-batch partial registers (one uint8[m] per key) are
ALGEBRAIC — combine = elementwise max — so they tree-reduce like the
source rollup: token bytes never shuffle, only (key, register, rank)
rows bounded by keys × m. This is the sketch answer to "how many
distinct tokens per source" at 10^12 docs, where an exact
count(DISTINCT) would shuffle every token.

An exact companion (`distinct_tokens_exact`) hashes tokens FIRST and
shuffles only int64 hashes (the hash-first dedup discipline), providing
both the small-scale ground truth for the sketch's error and the
oracle-checked exact path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

P_BITS = 8          # m = 256 registers
M = 1 << P_BITS


def _token_registers(tokens) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rank) per token; sha256-based, deterministic.

    register = first hex byte of sha256(token); rank = leading zeros of
    the NEXT 64 hash bits + 1 (65 when those bits are all zero).
    """
    regs = np.empty(len(tokens), dtype=np.int64)
    ranks = np.empty(len(tokens), dtype=np.int64)
    for i, tok in enumerate(tokens):
        hx = hashlib.sha256(tok.encode()).hexdigest()
        regs[i] = int(hx[:2], 16)
        v = int(hx[2:18], 16)
        ranks[i] = 65 - v.bit_length() if v else 65
    return regs, ranks


class HLLPartialStage:
    """map_batches(pyarrow): docs -> per-(source, register) max-rank
    partial rows. At most keys*256 rows leave each task."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, np.ndarray] = {}
        for src, text in zip(srcs, texts):
            toks = list(set((text or "").split()))
            if not toks:
                continue
            regs, ranks = _token_registers(toks)
            r = acc.setdefault(src, np.zeros(M, dtype=np.int64))
            np.maximum.at(r, regs, ranks)
        out_src, out_reg, out_rank = [], [], []
        for src, r in acc.items():
            nz = np.flatnonzero(r)
            out_src.extend([src] * nz.size)
            out_reg.extend(nz.tolist())
            out_rank.extend(r[nz].tolist())
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "register": pa.array(out_reg, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def hll_estimate(registers: np.ndarray) -> tuple[float, int]:
    """HLL estimate from a dense rank vector (len M). Sequential float
    fold in register-index order; linear-counting correction below
    2.5m when empty registers remain (reference formula)."""
    import math

    alpha = 0.7213 / (1.0 + 1.079 / M)
    s = 0.0
    for r in registers:            # sequential — SQL list_reduce replays
        s += 2.0 ** (-float(r))
    est = alpha * M * M / s
    zeros = int((registers == 0).sum())
    if est <= 2.5 * M and zeros > 0:
        est = M * math.log(M / zeros)  # scalar math.log == DuckDB ln
    return est, zeros


def distinct_tokens_hll(docs, concurrency: int = 2):
    """Dataset(doc_id, source, text) -> (source, est_distinct,
    n_zero_registers). Combine is groupby-max over (source, register)
    — bounded cardinality, shuffle of ≤ keys*256 rows."""
    import math

    partial = docs.map_batches(
        HLLPartialStage, batch_format="pyarrow", concurrency=concurrency
    )
    merged = partial.groupby(["source", "register"]).max("rank")

    def finalize(group):
        import pandas as pd

        dense = np.zeros(M, dtype=np.int64)
        dense[group["register"].to_numpy(np.int64)] = group[
            "max(rank)"
        ].to_numpy(np.int64)
        est, zeros = hll_estimate(dense)
        return pd.DataFrame(
            {
                "source": [group["source"].iloc[0]],
                "est_distinct": [est],
                "n_zero_registers": [zeros],
            }
        )

    return merged.groupby("source").map_groups(
        finalize, batch_format="pandas"
    )


def hll_sql() -> str:
    """DuckDB oracle: replays register assignment (sha256 string math),
    the max-rank merge, and the sequential estimate fold."""
    alpha = "0.7213 / (1.0 + 1.079 / 256.0)"
    return f"""
    WITH w AS (
        SELECT DISTINCT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ),
    h AS (
        SELECT source,
               CAST(('0x' || substr(sha256(word), 1, 2)) AS BIGINT)
                   AS register,
               CAST(('0x' || substr(sha256(word), 3, 16)) AS UBIGINT)
                   AS v
        FROM w
    ),
    r AS (
        SELECT source, register,
               max(CASE WHEN v = 0 THEN 65
                        ELSE 65 - (64 - length(ltrim(
                            lpad(bin(v), 64, '0'), '0'))) END) AS rank
        FROM h GROUP BY source, register
    ),
    dense AS (
        SELECT s.source, g.register,
               COALESCE(r.rank, 0) AS rank
        FROM (SELECT DISTINCT source FROM r) s
        CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS register) g
        LEFT JOIN r ON r.source = s.source AND r.register = g.register
    ),
    folded AS (
        SELECT source,
               list_reduce(
                   list_prepend(0.0, list(pow(2.0, -CAST(rank AS DOUBLE))
                                          ORDER BY register)),
                   (acc, x) -> acc + x) AS s,
               CAST(sum(CASE WHEN rank = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS zeros
        FROM dense GROUP BY source
    )
    SELECT source,
           CASE WHEN ({alpha}) * 256.0 * 256.0 / s <= 2.5 * 256.0
                     AND zeros > 0
                THEN 256.0 * ln(256.0 / zeros)
                ELSE ({alpha}) * 256.0 * 256.0 / s END AS est_distinct,
           zeros AS n_zero_registers
    FROM folded
    """


class TokenHashStage:
    """Hash-first exact distinct: docs -> (source, int64 token hash)
    rows, deduped per batch — only 8-byte hashes ever shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        out_src, out_h = [], []
        for src, text in zip(srcs, texts):
            toks = set((text or "").split())
            for tok in toks:
                out_src.append(src)
                out_h.append(
                    int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16)
                )
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "h": pa.array(out_h, type=pa.int64()),
            }
        )


def distinct_tokens_exact(docs, concurrency: int = 2):
    """Exact per-source distinct token count via hash-first shuffle."""

    def count_group(group):
        import pandas as pd

        return pd.DataFrame(
            {
                "source": [group["source"].iloc[0]],
                "n_distinct": [int(group["h"].nunique())],
            }
        )

    return (
        docs.map_batches(TokenHashStage, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby("source")
        .map_groups(count_group, batch_format="pandas")
    )


def distinct_exact_sql() -> str:
    return """
    SELECT source,
           CAST(count(DISTINCT word) AS BIGINT) AS n_distinct
    FROM (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    ) GROUP BY source
    """
