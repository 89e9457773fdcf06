"""Twelfth query wave: training-data prep operators — GPT-style sequence
packing over a distributed prefix sum, deterministic sha256 sampling, and
per-source quota draws. All integer / hash arithmetic, so every query has
a bitwise DuckDB oracle.

These extend the reference's data-prep surface (corpus slicing and
per-source accounting, e.g. src/preprocessing/*.rs) with the operations a
100 TB tokenized corpus needs before training: packing docs into
fixed-length context windows, and reproducible downsampling that keeps
the same rows on any cluster size, retry, or resume.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def build_wave12_queries():
    queries, oracles = {}, {}

    from ..extras.packing import (
        hash_sample,
        hash_sample_sql,
        pack_sequences,
        pack_sequences_sql,
        quota_sample,
        quota_sample_sql,
    )

    def pack_q(sf_dir: str):
        ds = pack_sequences(
            _docs(sf_dir, ["doc_id", "text"]), seq_len=512, bucket_size=64
        )
        return _cast(
            ds,
            {
                "doc_id": pa.string(), "n_tok": pa.int64(),
                "tok_start": pa.int64(), "seq_first": pa.int64(),
                "seq_last": pa.int64(), "n_seqs": pa.int64(),
                "seq_offset": pa.int64(),
            },
        )

    queries["doc_pack_sequences"] = pack_q
    oracles["doc_pack_sequences"] = pack_sequences_sql(seq_len=512)

    def sample_q(sf_dir: str):
        ds = hash_sample(_docs(sf_dir, ["doc_id", "n_chars"]))
        return _cast(ds, {"doc_id": pa.string(), "n_chars": pa.int64()})

    queries["doc_hash_sample"] = sample_q
    oracles["doc_hash_sample"] = hash_sample_sql()

    def quota_q(sf_dir: str):
        ds = quota_sample(_docs(sf_dir, ["doc_id", "source"]), k=10)
        return _cast(
            ds,
            {"source": pa.string(), "doc_id": pa.int64(),
             "h": pa.string()},
        )

    queries["source_quota_sample"] = quota_q
    oracles["source_quota_sample"] = quota_sample_sql(k=10)

    return queries, oracles
