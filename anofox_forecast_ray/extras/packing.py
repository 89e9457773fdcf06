"""Sequence packing and deterministic sampling for training-data prep.

Packing assigns every document a contiguous token range in a global
concatenation ordered by ``doc_id``, then maps that range onto
fixed-length training sequences (GPT-style document packing: docs are
concatenated and chunked into ``seq_len``-token windows, long docs
spanning several windows). All outputs are integer arithmetic over a
global prefix sum, so a DuckDB window-function oracle replays them
bitwise.

Scale shape (the part that matters at 10^12 docs):

- Pass 0 projects each doc to ``(doc_id, bucket, n_tok)`` inside
  ``map_batches`` — the text never leaves the read stage, so the shuffle
  moves ~24 bytes/doc, not document bytes.
- Pass 1 computes per-bucket token sums with a bounded-cardinality
  ``groupby`` (``bucket = doc_id // bucket_size``); the driver holds one
  row per bucket (10^6 rows at 10^12 docs / bucket_size 10^6) and does an
  exclusive scan — a classic two-pass distributed prefix sum.
- Pass 2 re-groups by bucket, sorts the (small) group in doc_id order,
  and adds the broadcast bucket offset to an in-bucket exclusive cumsum.
  Bucket offsets travel via ``ray.put`` once, not per batch.

Deterministic sampling (``hash_sample_sql`` / ``quota_sample``) uses
sha256 prefixes as the random source so the engine and the SQL oracle
agree bit-for-bit and a resumed job keeps/drops the same rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# the whitespace token count matches the proven token_counts oracle:
# len(text.split()) == length(string_split_regex(trim(text),'\s+'))
_NTOK_SQL = (
    "CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
)


def tokenize_counts(batch: pa.Table, bucket_size: int) -> pa.Table:
    """Project docs to (doc_id, bucket, n_tok); drops text immediately."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False
    )
    n = np.fromiter(
        (len((t or "").split()) for t in texts), np.int64, len(texts)
    )
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "bucket": pa.array(ids // np.int64(bucket_size)),
            "n_tok": pa.array(n),
        }
    )


def pack_sequences(docs, seq_len: int = 512, bucket_size: int = 64):
    """Assign each doc its global token range and sequence span.

    Returns a Dataset with columns (doc_id, n_tok, tok_start, seq_first,
    seq_last, n_seqs, seq_offset); ``seq_*`` are derived from the global
    prefix sum by integer division, so a zero-token doc gets n_seqs=0 and
    seq_first == seq_last == tok_start // seq_len.

    ONE shuffle total: the single ``groupby`` co-locates each bucket,
    emits the in-bucket exclusive cumsum (``local_start``) plus the
    bucket's token total, the driver scans the bounded bucket totals into
    global offsets, and a final broadcast ``map_batches`` adds offsets and
    derives the sequence columns. (The earlier shape ran TWO groupbys over
    the same rows — one for bucket sums, one for the cumsum — doubling the
    all-to-all volume for no information gain; the bucket total is free
    once the group is already co-located.) All integer arithmetic, so the
    DuckDB window-function oracle still replays it bitwise.
    """
    import ray

    tok = docs.map_batches(
        lambda b: tokenize_counts(b, bucket_size), batch_format="pyarrow"
    )
    # the projection shrinks rows ~1000x (text -> 24 B of metadata), so
    # coalesce before the sort shuffle: Ray's sort fans out one partition
    # per input block, and dozens of tiny blocks cost ~3x in pure task
    # overhead (measured 1.58 s -> 0.52 s at sf0.1). shuffle=False is a
    # split/merge, not an all-to-all.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    tok = tok.repartition(max(4, cpus // 2), shuffle=False)

    def local_pack(group: pa.Table) -> pa.Table:  # one bucket per group
        # pyarrow-native on purpose: keeping pandas out of the group UDF
        # keeps the one-time pandas import out of every worker process
        g = group.sort_by("doc_id")
        n = g.column("n_tok").to_numpy(zero_copy_only=False)
        local_start = np.concatenate(([np.int64(0)], np.cumsum(n)[:-1]))
        total = np.int64(local_start[-1] + n[-1]) if len(n) else np.int64(0)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "bucket": g.column("bucket"),
                "n_tok": pa.array(n),
                "local_start": pa.array(local_start),
                "bucket_total": pa.array(np.full(len(n), total)),
            }
        )

    packed_local = (
        tok.groupby("bucket")
        .map_groups(local_pack, batch_format="pyarrow")
        .materialize()  # ~40 B/doc metadata, reused by both consumers
    )

    # driver-side exclusive scan over the BOUNDED bucket totals (one row
    # per bucket after per-block dedup; 10^6 rows at 10^12 docs)
    def bucket_totals(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        t = batch.column("bucket_total").to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(b, return_index=True)
        return pa.table({"bucket": pa.array(uniq), "total": pa.array(t[idx])})

    sums = packed_local.select_columns(["bucket", "bucket_total"]).map_batches(
        bucket_totals, batch_format="pyarrow"
    ).take_all()
    per_bucket: dict[int, int] = {}
    for r in sums:  # a bucket split across blocks repeats its total
        per_bucket[r["bucket"]] = r["total"]
    offsets, acc = {}, 0
    for b in sorted(per_bucket):
        offsets[b] = acc
        acc += per_bucket[b]
    offsets_ref = ray.put(offsets)

    L = int(seq_len)

    def finalize(batch: pa.Table) -> pa.Table:
        off = ray.get(offsets_ref)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        n = batch.column("n_tok").to_numpy(zero_copy_only=False)
        base = np.fromiter((off[x] for x in b), np.int64, len(b))
        start = base + batch.column("local_start").to_numpy(
            zero_copy_only=False
        )
        last_tok = start + np.maximum(n, 1) - 1  # n=0 -> its own start
        seq_first = start // L
        seq_last = last_tok // L
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tok": pa.array(n),
                "tok_start": pa.array(start),
                "seq_first": pa.array(seq_first),
                "seq_last": pa.array(seq_last),
                "n_seqs": pa.array(
                    np.where(n > 0, seq_last - seq_first + 1, 0)
                ),
                "seq_offset": pa.array(start % L),
            }
        )

    return packed_local.map_batches(finalize, batch_format="pyarrow")


def pack_sequences_sql(seq_len: int = 512) -> str:
    """DuckDB oracle: window-function replay of the global prefix sum."""
    return f"""
    WITH tok AS (
        SELECT doc_id, {_NTOK_SQL} AS n_tok FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tok_start
        FROM tok
    )
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_tok, tok_start,
           CAST(tok_start // {seq_len} AS BIGINT) AS seq_first,
           CAST((tok_start + greatest(n_tok, 1) - 1) // {seq_len}
                AS BIGINT) AS seq_last,
           CAST(CASE WHEN n_tok > 0
                THEN (tok_start + n_tok - 1) // {seq_len}
                     - tok_start // {seq_len} + 1
                ELSE 0 END AS BIGINT) AS n_seqs,
           CAST(tok_start % {seq_len} AS BIGINT) AS seq_offset
    FROM cum
    """


def _hex_prefixes(ids) -> list[str]:
    return [
        hashlib.sha256(str(i).encode()).hexdigest()[:8] for i in ids
    ]


def hash_sample(docs, keep_hex: str = "33"):
    """Deterministic doc sampling: keep docs whose sha256(doc_id) leading
    byte (2 hex chars) sorts below ``keep_hex`` (default 0x33/0x100 ~ 20%).
    Pure per-row filter — no shuffle, resumable, and the same rows survive
    on any cluster size or retry."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = np.fromiter(
            (h[:2] < keep_hex for h in _hex_prefixes(ids)),
            np.bool_, len(ids),
        )
        return batch.filter(pa.array(keep))

    return docs.map_batches(fn, batch_format="pyarrow")


def hash_sample_sql(keep_hex: str = "33") -> str:
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_chars
    FROM documents
    WHERE substr(lower(sha256(CAST(doc_id AS VARCHAR))), 1, 2) < '{keep_hex}'
    """


def quota_sample(docs, k: int = 10):
    """Per-source quota: keep the k docs per source that sort first by
    (sha256(doc_id) prefix, doc_id) — a deterministic uniform draw.
    Shuffles only (source, doc_id) plus the 8-char hash, never text."""

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "source": batch.column("source"),
                "doc_id": pa.array(
                    np.asarray(ids, np.int64), type=pa.int64()
                ),
                "h": pa.array(_hex_prefixes(ids), type=pa.string()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        g = group.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        return g.select(["source", "doc_id", "h"]).slice(0, k)

    return (
        docs.map_batches(project, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pick, batch_format="pyarrow")
    )


def quota_sample_sql(k: int = 10) -> str:
    return f"""
    SELECT source, doc_id, h FROM (
        SELECT source, doc_id,
               substr(lower(sha256(CAST(doc_id AS VARCHAR))), 1, 8) AS h,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY substr(lower(sha256(CAST(doc_id AS VARCHAR))),
                                   1, 8), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {k}
    """


# --- deterministic training order (distributed shuffle-sort rank) -----------

def training_order(docs, seed: int = 42, n_buckets: int = 256):
    """Dataset(doc_id) -> (doc_id, shuffle_key, rank): a seeded global
    shuffle order that is identical on any cluster size, retry or
    resume. shuffle_key = sha256(seed:doc_id); rank = position in
    ascending (shuffle_key, doc_id) order.

    This is the distributed sort done the scale-correct way: the bucket
    (first key byte) is a PREFIX of the sort key, so bucket-major order +
    within-bucket order == total order; ranks come from the same
    two-pass prefix-sum shape as pack_sequences (bounded bucket counts ->
    driver exclusive scan -> broadcast offsets), and only
    (doc_id, 32-byte key) rows ever shuffle — never text."""
    import hashlib

    import ray

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_pylist()
        keys = [
            hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shuffle_key": pa.array(keys, type=pa.string()),
                "bucket": pa.array(
                    [int(k[:2], 16) for k in keys], type=pa.int64()
                ),
            }
        )

    keyed = docs.map_batches(add_key, batch_format="pyarrow").materialize()
    counts = keyed.groupby("bucket").count().take_all()
    counts.sort(key=lambda r: r["bucket"])
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["bucket"]] = acc
        acc += r["count()"]
    offsets_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        off = ray.get(offsets_ref)
        g = group.sort_by([("shuffle_key", "ascending"),
                           ("doc_id", "ascending")])
        base = off[int(g.column("bucket")[0].as_py())]
        return pa.table(
            {
                "doc_id": g.column("doc_id").cast(pa.int64()),
                "shuffle_key": g.column("shuffle_key"),
                "rank": pa.array(
                    base + np.arange(g.num_rows, dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return keyed.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )


def training_order_sql(seed: int = 42) -> str:
    return f"""
    SELECT doc_id,
           sha256(CAST({seed} AS VARCHAR) || ':' ||
                  CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(row_number() OVER (
               ORDER BY sha256(CAST({seed} AS VARCHAR) || ':' ||
                               CAST(doc_id AS VARCHAR)) ASC,
                        doc_id ASC) - 1 AS BIGINT) AS rank
    FROM documents
    """
