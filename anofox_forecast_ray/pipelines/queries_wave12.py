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
from ._scaffold import read_cols


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

    def _purchases(sf_dir: str):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "value", "event_type"],
        )
        return t.filter(
            pc.equal(t.column("event_type"), "purchase")
        ).drop(["event_type"])

    def _events(sf_dir: str):
        import ray.data as rd

        return read_cols(sf_dir, "events", ["event_id", "user_id", "ts"])

    def asof_q(sf_dir: str):
        from ..stages.asof import asof_join_broadcast

        right = _purchases(sf_dir).rename_columns(
            ["user_id", "ts", "purchase_event_id", "purchase_value"]
        )
        ds = asof_join_broadcast(
            _events(sf_dir), right, key="user_id", ts="ts",
            payload={"purchase_event_id": -1, "purchase_value": -1.0},
            gap_col="gap_us",
        )
        return _cast(
            ds,
            {"event_id": pa.int64(), "user_id": pa.int64(),
             "purchase_event_id": pa.int64(), "gap_us": pa.int64(),
             "purchase_value": pa.float64()},
        )

    queries["events_asof_purchase"] = asof_q
    oracles["events_asof_purchase"] = """
    SELECT e.event_id, e.user_id,
           COALESCE(p.event_id, -1) AS purchase_event_id,
           COALESCE(CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT),
                    -1) AS gap_us,
           COALESCE(p.value, -1.0) AS purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts > p.ts
    """

    def range_q(sf_dir: str):
        from ..stages.asof import range_count_broadcast

        ds = range_count_broadcast(
            _events(sf_dir), _purchases(sf_dir), key="user_id", ts="ts",
            window_us=3_600_000_000, out_col="n_purchases_1h",
        )
        return _cast(
            ds,
            {"event_id": pa.int64(), "user_id": pa.int64(),
             "n_purchases_1h": pa.int64()},
        )

    def m4_q(sf_dir: str, width: int = 32):
        import numpy as np

        from ..kernels.rollup import m4_flat
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def fn(batch: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(batch)
            r = m4_flat(values, lengths, width)
            ids = batch.column("doc_id").to_pylist()
            return pa.table(
                {
                    "doc_id": pa.array(
                        np.asarray(ids, dtype=object)[r["row_idx"]],
                        type=pa.string(),
                    ),
                    **{k: pa.array(r[k]) for k in
                       ("window_id", "first_val", "last_val", "min_val",
                        "min_pos", "max_val", "max_pos")},
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(fn, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "first_val": pa.int64(), "last_val": pa.int64(),
             "min_val": pa.int64(), "min_pos": pa.int64(),
             "max_val": pa.int64(), "max_pos": pa.int64()},
        )

    from .queries import SQL_TOK

    queries["doc_m4_downsample_w32"] = m4_q
    oracles["doc_m4_downsample_w32"] = f"""
    WITH tok AS ({SQL_TOK}),
    m AS (
        SELECT doc_id, pos // 32 AS window_id,
               arg_min(token, pos) AS first_val,
               arg_max(token, pos) AS last_val,
               min(token * 32 + (pos % 32)) AS mnk,
               max(token * 32 + (31 - (pos % 32))) AS mxk
        FROM tok GROUP BY doc_id, window_id
    )
    SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
           CAST(first_val AS BIGINT) AS first_val,
           CAST(last_val AS BIGINT) AS last_val,
           CAST(mnk // 32 AS BIGINT) AS min_val,
           CAST(mnk % 32 AS BIGINT) AS min_pos,
           CAST(mxk // 32 AS BIGINT) AS max_val,
           CAST(31 - (mxk % 32) AS BIGINT) AS max_pos
    FROM m
    """

    def delta_q(sf_dir: str):
        import numpy as np
        import ray.data as rd

        def per_user(g: pa.Table) -> pa.Table:
            g = g.sort_by([("ts", "ascending")])
            ts = g.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            v = g.column("value").to_numpy(zero_copy_only=False)
            delta = np.empty_like(v)
            gap = np.empty_like(ts)
            delta[0], gap[0] = 0.0, -1
            delta[1:] = v[1:] - v[:-1]  # counter delta, bitwise exact
            gap[1:] = ts[1:] - ts[:-1]
            return pa.table(
                {"event_id": g.column("event_id"),
                 "user_id": g.column("user_id"),
                 "delta": pa.array(delta, type=pa.float64()),
                 "gap_us": pa.array(gap, type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
            .groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"event_id": pa.int64(), "user_id": pa.int64(),
             "delta": pa.float64(), "gap_us": pa.int64()},
        )

    queries["events_value_delta"] = delta_q
    oracles["events_value_delta"] = """
    SELECT event_id, user_id,
           COALESCE(value - lag(value) OVER w, 0.0) AS delta,
           COALESCE(CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         AS BIGINT), -1) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """

    queries["events_range_purchase_count"] = range_q
    oracles["events_range_purchase_count"] = """
    SELECT e.event_id, e.user_id,
           CAST(count(p.event_id) AS BIGINT) AS n_purchases_1h
    FROM events e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts < e.ts
    GROUP BY e.event_id, e.user_id
    """

    from ..extras.sketches import (
        distinct_exact_sql,
        distinct_tokens_exact,
        distinct_tokens_hll,
        hll_sql,
    )

    def hll_q(sf_dir: str):
        ds = distinct_tokens_hll(_docs(sf_dir, ["source", "text"]))
        return _cast(
            ds,
            {"source": pa.string(), "est_distinct": pa.float64(),
             "n_zero_registers": pa.int64()},
        )

    queries["source_distinct_tokens_hll"] = hll_q
    oracles["source_distinct_tokens_hll"] = hll_sql()

    def exact_q(sf_dir: str):
        ds = distinct_tokens_exact(_docs(sf_dir, ["source", "text"]))
        return _cast(
            ds, {"source": pa.string(), "n_distinct": pa.int64()}
        )

    queries["source_distinct_tokens_exact"] = exact_q
    oracles["source_distinct_tokens_exact"] = distinct_exact_sql()

    return queries, oracles
