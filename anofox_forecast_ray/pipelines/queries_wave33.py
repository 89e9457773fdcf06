"""Wave-33 queries: RSI, Simpson diversity, MAD-based anomaly flags,
and exact-integer sigma outlier counts.

- doc_rsi: full-series Relative Strength Index per doc (simple-average
  variant). Gains/losses are exact int64 sums of positive/negative
  first differences; RSI = 100 - 100/(1+G/L) is the identical f64
  expression on both sides, with the L=0 branch pinned to 100.0.
- source_simpson: Simpson concentration index per source over the
  bounded (source, token) count table: sum n_i(n_i-1) / (N(N-1)) —
  exact int64 numerator/denominator, one f64 division. (Envelope:
  per-source token total < ~3e9 keeps the numerator in int64; shard by
  time range beyond that.)
- events_anomaly_mad: robust anomaly flags — hours whose per-type count
  deviates > 3 MAD from that type's median hourly count. Median and MAD
  use the NEAREST-RANK (lower) definition so every quantity stays an
  integer and the comparison |c-med| > 3*mad is exact on both sides.
  Bounded (type, hour) partials; flag math is driver-side.
- doc_sigma_outliers: per-doc count of tokens beyond 2 sigma, decided
  by the EXACT integer inequality (N*x - S)^2 > 4*(N*S2 - S^2) — no
  float ever enters, so engine and oracle cannot diverge. (Envelope:
  N*max_token < 2^31.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------------------------ doc_rsi
def _rsi_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def rsi(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "gains": pa.array([], type=pa.int64()),
                 "losses": pa.array([], type=pa.int64()),
                 "rsi": pa.array([], type=pa.float64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            d = np.diff(v)
            # zero out cross-doc diffs
            ends = np.cumsum(lens)[:-1] - 1  # last flat idx per doc
            seg = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
            cross = seg[1:] != seg[:-1]
            gains_flat = np.where(~cross & (d > 0), d, 0)
            losses_flat = np.where(~cross & (d < 0), -d, 0)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            keep = lens >= 2
            g = np.add.reduceat(np.r_[gains_flat, 0], starts)[keep]
            l = np.add.reduceat(np.r_[losses_flat, 0], starts)[keep]
            del ends
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )[keep]
            gf = g.astype(np.float64)
            lf = l.astype(np.float64)
            rs = np.where(
                l > 0,
                100.0 - 100.0 / (1.0 + gf / np.where(l > 0, lf, 1.0)),
                100.0,
            )
            return pa.table(
                {"doc_id": pa.array(ids),
                 "gains": pa.array(g), "losses": pa.array(l),
                 "rsi": pa.array(rs, type=pa.float64())}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(rsi, batch_format="pyarrow"),
            {"doc_id": pa.int64(), "gains": pa.int64(),
             "losses": pa.int64(), "rsi": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id,
               lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
                   - token AS diff
        FROM tok
    ),
    g AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN diff > 0 THEN diff ELSE 0 END)
                    AS BIGINT) AS gains,
               CAST(sum(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
                    AS BIGINT) AS losses
        FROM d WHERE diff IS NOT NULL GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, gains, losses,
           CASE WHEN losses = 0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + CAST(gains AS DOUBLE)
                                            / CAST(losses AS DOUBLE))
           END AS rsi
    FROM g
    """
    return q, sql


# ------------------------------------------------------------ source_simpson
def _simpson_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"source": pa.array([], type=pa.string()),
                 "token": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src_names, src_code = np.unique(
                np.asarray(t.column("source").to_pylist()),
                return_inverse=True,
            )
            rep = np.repeat(src_code.astype(np.int64),
                            lengths.astype(np.int64))
            key = rep * (1 << 21) + values.astype(np.int64)
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"source": pa.array(src_names[uk >> 21],
                                    type=pa.string()),
                 "token": pa.array(uk & ((1 << 21) - 1)),
                 "cnt": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"source": g.column("source"),
                 "token": g.column("token"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        rows = {"source": [], "n": [], "sum_nn": [], "simpson": []}
        for src, g in hp.groupby("source"):
            c = g["cnt"].to_numpy(np.int64)
            n = int(c.sum())
            s = int((c * (c - 1)).sum())
            rows["source"].append(str(src))
            rows["n"].append(n)
            rows["sum_nn"].append(s)
            rows["simpson"].append(
                float(np.float64(s)
                      / np.float64(n * (n - 1))) if n > 1 else 0.0
            )
        return pa.table(
            {"source": pa.array(rows["source"], type=pa.string()),
             "n": pa.array(rows["n"], type=pa.int64()),
             "sum_nn": pa.array(rows["sum_nn"], type=pa.int64()),
             "simpson": pa.array(rows["simpson"],
                                 type=pa.float64())}
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    c AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n,
           CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS sum_nn,
           CASE WHEN sum(cnt) > 1
                THEN CAST(sum(cnt * (cnt - 1)) AS DOUBLE)
                     / CAST(sum(cnt) * (sum(cnt) - 1) AS DOUBLE)
                ELSE 0.0 END AS simpson
    FROM c GROUP BY source
    """
    return q, sql


# -------------------------------------------------------- events_anomaly_mad
def _anomaly_mad_query(k_mad: int = 3):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"event_type": pa.array([], type=pa.string()),
                     "hour": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            tab = pa.table(
                {"event_type": t.column("event_type"),
                 "hour": pa.array(hour)}
            )
            g = tab.group_by(["event_type", "hour"]).aggregate(
                [("hour", "count")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hour": g.column("hour"),
                 "cnt": g.column("hour_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "hour"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hour": g.column("hour"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hp = tree_reduce_tables(refs, merge).to_pandas()
        out = {"event_type": [], "hour": [], "cnt": [],
               "med": [], "mad": []}

        def lower_median(x: np.ndarray) -> int:
            s = np.sort(x)
            return int(s[(s.size + 1) // 2 - 1])

        for et, g in hp.groupby("event_type"):
            c = g["cnt"].to_numpy(np.int64)
            med = lower_median(c)
            dev = np.abs(c - med)
            mad = lower_median(dev)
            flag = dev > k_mad * mad
            hrs = g["hour"].to_numpy(np.int64)[flag]
            for h, cc in zip(hrs, c[flag]):
                out["event_type"].append(str(et))
                out["hour"].append(int(h))
                out["cnt"].append(int(cc))
                out["med"].append(med)
                out["mad"].append(mad)
        return pa.table(
            {"event_type": pa.array(out["event_type"],
                                    type=pa.string()),
             "hour": pa.array(out["hour"], type=pa.int64()),
             "cnt": pa.array(out["cnt"], type=pa.int64()),
             "med": pa.array(out["med"], type=pa.int64()),
             "mad": pa.array(out["mad"], type=pa.int64())}
        )

    sql = f"""
    WITH hc AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 // 3600 AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, cnt AS med FROM (
            SELECT event_type, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM hc
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT h.event_type, h.hour, h.cnt, m.med,
               abs(h.cnt - m.med) AS d
        FROM hc h JOIN med m ON m.event_type = h.event_type
    ),
    mad AS (
        SELECT event_type, d AS mad FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT dv.event_type, CAST(dv.hour AS BIGINT) AS hour, dv.cnt,
           CAST(dv.med AS BIGINT) AS med,
           CAST(md.mad AS BIGINT) AS mad
    FROM dev dv JOIN mad md ON md.event_type = dv.event_type
    WHERE dv.d > {k_mad} * md.mad
    """
    return q, sql


# -------------------------------------------------------- doc_sigma_outliers
def _sigma_outliers_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def outliers(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64()),
                 "n_outliers": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            keep = lens > 0
            s = np.add.reduceat(v, starts[keep])
            s2 = np.add.reduceat(v * v, starts[keep])
            n = lens[keep]
            # broadcast per-doc (n, s, var_num) back to positions
            n_pos = np.repeat(n, n)
            s_pos = np.repeat(s, n)
            var_num = np.repeat(n * s2 - s * s, n)
            lhs = (n_pos * v - s_pos) ** 2
            hit = (lhs > 4 * var_num).astype(np.int64)
            cnt = np.add.reduceat(hit, starts[keep])
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )[keep]
            return pa.table(
                {"doc_id": pa.array(ids),
                 "n_tok": pa.array(n),
                 "n_outliers": pa.array(cnt)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(outliers,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_tok": pa.int64(),
             "n_outliers": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(token) AS BIGINT) AS s,
               CAST(sum(token * token) AS BIGINT) AS s2
        FROM tok GROUP BY doc_id
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(a.n AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN (a.n * t.token - a.s)
                              * (a.n * t.token - a.s)
                              > 4 * (a.n * a.s2 - a.s * a.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM tok t JOIN agg a ON a.doc_id = t.doc_id
    GROUP BY t.doc_id, a.n
    """
    return q, sql


def build_wave33_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_rsi",) + _rsi_query()))
    add(*(("source_simpson",) + _simpson_query()))
    add(*(("events_anomaly_mad",) + _anomaly_mad_query(3)))
    add(*(("doc_sigma_outliers",) + _sigma_outliers_query()))
    return queries, oracles
