"""Wave-67 queries: Gorilla delta-of-delta bit accounting, rolling
cross-correlation, and zigzag-varint token compression estimates.

- events_dod_bits: per-user timestamp cost of the Gorilla
  delta-of-delta codec (kernels/gorilla.py _TS_RANGES; Pelkonen et
  al. 2015) WITHOUT running the encoder — the bucket rules are pure
  integer CASE logic, so the bit count is a hard SQL oracle: first
  ts 64 bits, then dod==0 -> 1, [-64,63] -> 9, [-256,255] -> 12,
  [-2048,2047] -> 16, else 68 bits. This pins the codec's cost model
  against an independent replay (the roundtrip query pins
  correctness; this pins the compression claim).
- events_rolling_corr_24h: rolling 24-hour Pearson correlation
  between the 'error' and 'purchase' dense hourly count series —
  the monitoring joint-statistic. All window sums are int64 (cumsum
  differences; DuckDB window SUM over BIGINT is exact regardless of
  its segment-tree order), so the correlation is one scalar
  expression per window, identical on both sides.
- doc_varint_bits: zigzag + LEB128 varint size of each doc's
  token-DELTA stream (the standard int32-sequence wire encoding a
  token-corpus store would use; tokens < 2^21 keep every zigzag
  under 2^22): bytes = 1 + [zz>=2^7] + [zz>=2^14] + [zz>=2^21].
  Emits the exact byte total and the ratio vs raw 4-byte int32s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

CORR_TARGET_X = "error"
CORR_TARGET_Y = "purchase"
CORR_W = 24


# ----------------------------------------------------------- events_dod_bits
def _dod_bits_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64())}
            )

        def dod_bits(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            first = np.r_[True, users[1:] != users[:-1]]
            delta = np.r_[np.int64(0), tus[1:] - tus[:-1]]
            delta[first] = 0
            prev_delta = np.r_[np.int64(0), delta[:-1]]
            # prev_delta resets to 0 on the SECOND event of a user
            second = np.r_[False, first[:-1]]
            prev_delta[second | first] = 0
            dod = delta - prev_delta
            bits = np.select(
                [first,
                 dod == 0,
                 (dod >= -64) & (dod <= 63),
                 (dod >= -256) & (dod <= 255),
                 (dod >= -2048) & (dod <= 2047)],
                [64, 1, 9, 12, 16],
                default=68,
            ).astype(np.int64)
            uk, inv = np.unique(users, return_inverse=True)
            out = {"user_id": pa.array(uk, type=pa.int64()),
                   "n_events": pa.array(np.bincount(
                       inv, minlength=uk.size).astype(np.int64)),
                   "ts_bits": pa.array(np.bincount(
                       inv, weights=bits,
                       minlength=uk.size).astype(np.int64))}
            for name, mask in (
                ("c_zero", (~first) & (dod == 0)),
                ("c_small", (~first) & (dod != 0)
                 & (dod >= -64) & (dod <= 63)),
                ("c_big", (~first) & ((dod < -2048)
                                      | (dod > 2047))),
            ):
                out[name] = pa.array(np.bincount(
                    inv, weights=mask,
                    minlength=uk.size).astype(np.int64))
            out["bits_per_event"] = pa.array(
                out["ts_bits"].to_numpy(zero_copy_only=False)
                .astype(np.float64)
                / out["n_events"].to_numpy(zero_copy_only=False)
                .astype(np.float64),
                type=pa.float64())
            return pa.table(out)

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(dod_bits, batch_format="pyarrow")
        )
        return _cast(ds, {
            "user_id": pa.int64(),
            "n_events": pa.int64(),
            "ts_bits": pa.int64(),
            "c_zero": pa.int64(),
            "c_small": pa.int64(),
            "c_big": pa.int64(),
            "bits_per_event": pa.float64(),
        })

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
    ),
    d AS (
        SELECT user_id, tus,
               row_number() OVER w AS rn,
               tus - lag(tus) OVER w AS delta
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY tus, event_id)
    ),
    dd AS (
        SELECT user_id, rn, delta,
               CASE WHEN rn = 1 THEN NULL
                    ELSE delta - COALESCE(
                        lag(delta) OVER (PARTITION BY user_id
                                         ORDER BY rn), 0)
               END AS dod
        FROM d
    ),
    bits AS (
        SELECT user_id, rn, dod,
               CASE WHEN rn = 1 THEN 64
                    WHEN dod = 0 THEN 1
                    WHEN dod BETWEEN -64 AND 63 THEN 9
                    WHEN dod BETWEEN -256 AND 255 THEN 12
                    WHEN dod BETWEEN -2048 AND 2047 THEN 16
                    ELSE 68 END AS b
        FROM dd
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(b) AS BIGINT) AS ts_bits,
           CAST(sum(CASE WHEN rn > 1 AND dod = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS c_zero,
           CAST(sum(CASE WHEN rn > 1 AND dod <> 0
                          AND dod BETWEEN -64 AND 63
                    THEN 1 ELSE 0 END) AS BIGINT) AS c_small,
           CAST(sum(CASE WHEN rn > 1
                          AND (dod < -2048 OR dod > 2047)
                    THEN 1 ELSE 0 END) AS BIGINT) AS c_big,
           CAST(sum(b) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS bits_per_event
    FROM bits GROUP BY user_id
    """
    return q, sql


# --------------------------------------------------- events_rolling_corr_24h
def _rolling_corr_query(tx: str = CORR_TARGET_X,
                        ty: str = CORR_TARGET_Y, w: int = CORR_W):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            et = np.asarray(t.column("event_type").to_pylist())
            uk, inv = np.unique(hour, return_inverse=True)
            x = np.bincount(
                inv, weights=(et == tx), minlength=uk.size
            ).astype(np.int64)
            y = np.bincount(
                inv, weights=(et == ty), minlength=uk.size
            ).astype(np.int64)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "x": pa.array(x), "y": pa.array(y),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("x", "sum"), ("y", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "x": g.column("x_sum").cast(pa.int64()),
                "y": g.column("y_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        x = np.zeros(span, dtype=np.int64)
        y = np.zeros(span, dtype=np.int64)
        ih = a["hour"].to_numpy(np.int64) - h0
        x[ih] = a["x"].to_numpy(np.int64)
        y[ih] = a["y"].to_numpy(np.int64)

        def wsum(v):
            c = np.cumsum(v)
            return c[w - 1:] - np.r_[np.int64(0), c[:-w]]

        sx = wsum(x)
        sy = wsum(y)
        sxx = wsum(x * x)
        syy = wsum(y * y)
        sxy = wsum(x * y)
        nf = float(w)
        vx = nf * sxx.astype(np.float64) - sx.astype(
            np.float64) * sx.astype(np.float64)
        vy = nf * syy.astype(np.float64) - sy.astype(
            np.float64) * sy.astype(np.float64)
        num = nf * sxy.astype(np.float64) - sx.astype(
            np.float64) * sy.astype(np.float64)
        den = np.sqrt(vx * vy)
        corr = np.where(den > 0, num / np.where(den > 0, den, 1.0),
                        0.0)
        hours = np.arange(h0 + w - 1, h0 + span, dtype=np.int64)
        return pa.table({
            "hour": pa.array(hours),
            "sx": pa.array(sx), "sy": pa.array(sy),
            "corr": pa.array(corr, type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour, event_type
        FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour,
               CAST(sum(CASE WHEN event_type = '{tx}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = '{ty}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour,
               CAST(COALESCE(c.x, 0) AS BIGINT) AS x,
               CAST(COALESCE(c.y, 0) AS BIGINT) AS y
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    win AS (
        SELECT hour,
               CAST(count(*) OVER w AS BIGINT) AS cnt,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(y) OVER w AS BIGINT) AS sy,
               CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
               CAST(sum(y * y) OVER w AS BIGINT) AS syy,
               CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        FROM dense
        WINDOW w AS (ORDER BY hour
                     ROWS BETWEEN {w - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT hour, sx, sy,
           CASE WHEN ({w}.0e0 * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * ({w}.0e0 * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                     > 0
                THEN ({w}.0e0 * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt(({w}.0e0 * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)
                               * CAST(sx AS DOUBLE))
                            * ({w}.0e0 * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE)))
                ELSE 0.0e0 END AS corr
    FROM win WHERE cnt = {w}
    """
    return q, sql


# ----------------------------------------------------------- doc_varint_bits
def _varint_query():
    def q(sf_dir: str):
        def varint(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "varint_bytes": pa.array([], type=pa.int64()),
                "ratio_vs_raw4": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            ids = t.column("doc_id").to_pylist()
            nd = len(ids)
            if flat.size == 0:
                z = np.zeros(nd, dtype=np.int64)
                return pa.table({
                    "doc_id": pa.array(ids, type=pa.string()),
                    "n_tok": pa.array(z),
                    "varint_bytes": pa.array(z),
                    "ratio_vs_raw4": pa.array(
                        np.zeros(nd), type=pa.float64()),
                })
            grp = np.repeat(np.arange(nd), lens)
            delta = np.r_[np.int64(0), flat[1:] - flat[:-1]]
            first = np.zeros(flat.size, dtype=bool)
            first[offs[:-1][lens > 0]] = True
            delta[first] = flat[first]  # first token: delta vs 0
            zz = np.where(delta >= 0, 2 * delta, -2 * delta - 1)
            nbytes = (1 + (zz >= 128).astype(np.int64)
                      + (zz >= 16384).astype(np.int64)
                      + (zz >= 2097152).astype(np.int64))
            total = np.bincount(
                grp, weights=nbytes, minlength=nd).astype(np.int64)
            ratio = np.zeros(nd, dtype=np.float64)
            nz = lens > 0
            ratio[nz] = (total[nz].astype(np.float64)
                         / (4.0 * lens[nz].astype(np.float64)))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(lens, type=pa.int64()),
                "varint_bytes": pa.array(total),
                "ratio_vs_raw4": pa.array(ratio,
                                          type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            varint, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "varint_bytes": pa.int64(),
            "ratio_vs_raw4": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id, token,
               COALESCE(token - lag(token) OVER (
                   PARTITION BY doc_id ORDER BY pos), token)
                   AS delta
        FROM tok
    ),
    zz AS (
        SELECT doc_id,
               CASE WHEN delta >= 0 THEN 2 * delta
                    ELSE -2 * delta - 1 END AS z
        FROM d
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(1 + CASE WHEN z >= 128 THEN 1 ELSE 0 END
                          + CASE WHEN z >= 16384 THEN 1 ELSE 0 END
                          + CASE WHEN z >= 2097152 THEN 1
                                 ELSE 0 END) AS BIGINT) AS vb
        FROM zz GROUP BY doc_id
    )
    SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id,
           COALESCE(agg.n, 0) AS n_tok,
           COALESCE(agg.vb, 0) AS varint_bytes,
           CASE WHEN COALESCE(agg.n, 0) > 0
                THEN CAST(agg.vb AS DOUBLE)
                     / (4.0e0 * CAST(agg.n AS DOUBLE))
                ELSE 0.0e0 END AS ratio_vs_raw4
    FROM documents doc LEFT JOIN agg
      ON agg.doc_id = CAST(doc.doc_id AS VARCHAR)
    """
    return q, sql


def build_wave67_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_dod_bits",) + _dod_bits_query()))
    add(*(("events_rolling_corr_24h",) + _rolling_corr_query()))
    add(*(("doc_varint_bits",) + _varint_query()))
    return queries, oracles
