"""Wave-61 queries: Flesch readability, out-of-order arrival depth,
and Theil-Sen robust trend slopes.

- doc_readability: Flesch reading-ease computed entirely from the
  codepoint token stream (corpus-quality filtering signal): words =
  maximal non-whitespace runs, sentences = '.'/'!'/'?' count,
  syllables ~= vowel-group starts — three INTEGER counts per doc
  (vectorized prev-token masks + bincount), then one float formula
  206.835 - 1.015*(W/S) - 84.6*(Y/W) spelled identically in SQL
  (lag() window replays the prev-token masks).
- events_out_of_order: per-user watermark metric for the streaming
  stages — an event is LATE if its ts precedes the running max ts
  of earlier ARRIVALS. The corpus assigns event_ids in ts order, so
  raw arrival order is degenerate (zero lateness everywhere); the
  query instead derives a deterministic pseudo-arrival key with the
  Knuth multiplicative hash (event_id * 2654435761 mod 2^32 — the
  wave-24 SQL-replayable cohort hash; ids <= ~1e8 keep the product
  inside int64 on both sides), which scrambles arrival against ts
  and genuinely exercises the late path. Emits n_late and max
  lateness in microseconds — all int64 (epoch_us differences),
  bitwise-trivial. Engine reuses the bucketed per-user groupby
  (only (user, event_id, ts) triples shuffle) with a C-level
  grouped cummax; oracle is a ROWS BETWEEN ... 1 PRECEDING running
  max over the same arrival key.
- doc_theil_sen_w8: Theil-Sen slope over the w8 window-sum series
  (the rank-robust cousin of doc_ols_trend; Siegel medians already
  back MFLES robust mode). Pairwise slopes (ws_j-ws_i)/(j-i) are
  float ratios of int64s — exact on both sides; the estimator picks
  the LOWER median by sorted VALUE (index (n-1)//2), a discrete
  selection with no interpolation, so ties cannot break bitwise
  equality. Pair expansion reuses the wave-59 vectorized i<j trick
  (windows per doc are bounded: m ~ len/8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

SEPS = (9, 10, 13, 32)
SENT = (33, 46, 63)
VOWELS = (65, 69, 73, 79, 85, 97, 101, 105, 111, 117)


# -------------------------------------------------------- doc_readability
def _readability_query():
    def q(sf_dir: str):
        def read_score(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_words": pa.array([], type=pa.int64()),
                "n_sentences": pa.array([], type=pa.int64()),
                "n_syllables": pa.array([], type=pa.int64()),
                "flesch": pa.array([], type=pa.float64()),
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
                    "n_words": pa.array(z), "n_sentences": pa.array(z),
                    "n_syllables": pa.array(z),
                    "flesch": pa.array(
                        np.zeros(nd), type=pa.float64()),
                })
            grp = np.repeat(np.arange(nd), lens)
            is_sep = np.isin(flat, SEPS)
            is_vow = np.isin(flat, VOWELS)
            is_sent = np.isin(flat, SENT)
            # prev-token masks with doc starts treated as boundary
            prev_sep = np.r_[True, is_sep[:-1]]
            prev_vow = np.r_[False, is_vow[:-1]]
            starts = offs[:-1][lens > 0]
            prev_sep[starts] = True
            prev_vow[starts] = False
            w = np.bincount(grp[~is_sep & prev_sep],
                            minlength=nd).astype(np.int64)
            s = np.bincount(grp[is_sent],
                            minlength=nd).astype(np.int64)
            y = np.bincount(grp[is_vow & ~prev_vow],
                            minlength=nd).astype(np.int64)
            fl = np.zeros(nd, dtype=np.float64)
            nz = w > 0
            s0 = np.maximum(s, 1)
            fl[nz] = (206.835
                      - 1.015 * (w[nz].astype(np.float64)
                                 / s0[nz].astype(np.float64))
                      - 84.6 * (y[nz].astype(np.float64)
                                / w[nz].astype(np.float64)))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_words": pa.array(w),
                "n_sentences": pa.array(s),
                "n_syllables": pa.array(y),
                "flesch": pa.array(fl, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            read_score, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_words": pa.int64(),
            "n_sentences": pa.int64(),
            "n_syllables": pa.int64(),
            "flesch": pa.float64(),
        })

    seps = ", ".join(str(c) for c in SEPS)
    sent = ", ".join(str(c) for c in SENT)
    vows = ", ".join(str(c) for c in VOWELS)
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lagged AS (
        SELECT doc_id, token,
               lag(token) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS prev
        FROM tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN token NOT IN ({seps})
                              AND (prev IS NULL OR prev IN ({seps}))
                         THEN 1 ELSE 0 END) AS BIGINT) AS w,
               CAST(sum(CASE WHEN token IN ({sent})
                         THEN 1 ELSE 0 END) AS BIGINT) AS s,
               CAST(sum(CASE WHEN token IN ({vows})
                              AND (prev IS NULL
                                   OR prev NOT IN ({vows}))
                         THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM lagged GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
           COALESCE(a.w, 0) AS n_words,
           COALESCE(a.s, 0) AS n_sentences,
           COALESCE(a.y, 0) AS n_syllables,
           CASE WHEN COALESCE(a.w, 0) = 0 THEN 0.0e0
                ELSE 206.835e0
                     - 1.015e0 * (CAST(a.w AS DOUBLE)
                                  / CAST(GREATEST(a.s, 1) AS DOUBLE))
                     - 84.6e0 * (CAST(a.y AS DOUBLE)
                                 / CAST(a.w AS DOUBLE))
           END AS flesch
    FROM documents d LEFT JOIN agg a
      ON a.doc_id = CAST(d.doc_id AS VARCHAR)
    """
    return q, sql


# --------------------------------------------------- events_out_of_order
def _out_of_order_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            arrival = (eid * 2654435761) % 4294967296
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": pa.array(eid, type=pa.int64()),
                 "arrival": pa.array(arrival, type=pa.int64())}
            )

        def lateness(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values(["user_id", "arrival", "event_id"])
            users = g["user_id"].to_numpy(np.int64)
            tus = g["tus"].to_numpy(np.int64)
            # per-user running max (C-level grouped cummax)
            wm = (g.groupby("user_id", sort=False)["tus"]
                  .cummax().to_numpy(np.int64))
            uk, segid = np.unique(users, return_inverse=True)
            prev_wm = np.r_[np.int64(0), wm[:-1]]
            first = np.r_[True, users[1:] != users[:-1]]
            late = (~first) & (tus < prev_wm)
            lateness_us = np.where(late, prev_wm - tus, 0)
            n = np.bincount(segid).astype(np.int64)
            nl = np.bincount(
                segid, weights=late, minlength=uk.size
            ).astype(np.int64)
            mx = np.zeros(uk.size, dtype=np.int64)
            np.maximum.at(mx, segid, lateness_us)
            return pa.table({
                "user_id": pa.array(uk, type=pa.int64()),
                "n_events": pa.array(n),
                "n_late": pa.array(nl),
                "max_late_us": pa.array(mx),
            })

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lateness, batch_format="pandas")
        )
        return _cast(ds, {
            "user_id": pa.int64(),
            "n_events": pa.int64(),
            "n_late": pa.int64(),
            "max_late_us": pa.int64(),
        })

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id,
               (event_id * 2654435761) % 4294967296 AS arrival
        FROM events
    ),
    wm AS (
        SELECT user_id, tus,
               max(tus) OVER (PARTITION BY user_id
                              ORDER BY arrival, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_wm
        FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_wm IS NOT NULL AND tus < prev_wm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COALESCE(max(CASE WHEN prev_wm IS NOT NULL
                                   AND tus < prev_wm
                              THEN prev_wm - tus END), 0) AS BIGINT)
               AS max_late_us
    FROM wm GROUP BY user_id
    """
    return q, sql


# ------------------------------------------------------- doc_theil_sen_w8
def _theil_sen_query(width: int = 8):
    def q(sf_dir: str):
        def theil_sen(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "n_pairs": pa.array([], type=pa.int64()),
                "slope": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            # window ALL non-empty docs first (reduceat boundaries
            # must stay contiguous), then drop 1-window docs row-wise
            # — filtering docs before reduceat would make the
            # previous doc's last window swallow their tokens
            kt = lens > 0
            if not kt.any():
                return empty
            starts_a = offs[:-1][kt]
            ends_a = offs[1:][kt]
            nw_a = (ends_a - starts_a + width - 1) // width
            tot_a = int(nw_a.sum())
            grp_a = np.repeat(np.arange(kt.sum()), nw_a)
            wid_a = (np.arange(tot_a)
                     - np.repeat(np.cumsum(nw_a) - nw_a, nw_a))
            ws_a = np.add.reduceat(
                flat, starts_a[grp_a] + wid_a * width)
            dkeep = nw_a >= 2  # Theil-Sen needs >= 2 windows
            if not dkeep.any():
                return empty
            ids_all = [d for d, k in zip(
                t.column("doc_id").to_pylist(), kt) if k]
            ids = [d for d, k in zip(ids_all, dkeep) if k]
            nw = nw_a[dkeep]
            newidx = np.cumsum(dkeep) - 1
            rkeep = dkeep[grp_a]
            grp = newidx[grp_a[rkeep]]
            wid = wid_a[rkeep]
            ws = ws_a[rkeep]
            bounds = np.cumsum(nw) - nw
            sq = nw * nw
            tot2 = int(sq.sum())
            g2 = np.repeat(np.arange(len(nw)), sq)
            within = (np.arange(tot2)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = nw[g2]
            ii = within // c
            jj = within % c
            mask = ii < jj
            g2 = g2[mask]
            ii = ii[mask]
            jj = jj[mask]
            dy = (ws[bounds[g2] + jj]
                  - ws[bounds[g2] + ii]).astype(np.float64)
            dx = (jj - ii).astype(np.float64)
            sl = dy / dx
            # lower median by value per doc: sort (doc, slope), pick
            # index (n-1)//2 within each doc's run
            order = np.lexsort((sl, g2))
            sls = sl[order]
            npairs = nw * (nw - 1) // 2
            pb = np.cumsum(npairs) - npairs
            med = sls[pb + (npairs - 1) // 2]
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw),
                "n_pairs": pa.array(npairs),
                "slope": pa.array(med, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            theil_sen, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "n_pairs": pa.int64(),
            "slope": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    sl AS (
        SELECT a.doc_id,
               (CAST(b.s AS DOUBLE) - CAST(a.s AS DOUBLE))
               / (CAST(b.wid AS DOUBLE) - CAST(a.wid AS DOUBLE))
                   AS slope
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.wid < b.wid
    ),
    ranked AS (
        SELECT doc_id, slope,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY slope) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS np
        FROM sl
    ),
    mm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM w GROUP BY doc_id HAVING count(*) >= 2
    )
    SELECT mm.doc_id, mm.m,
           CAST(r.np AS BIGINT) AS n_pairs,
           r.slope
    FROM mm JOIN ranked r
      ON r.doc_id = mm.doc_id AND r.rn = (r.np - 1) // 2 + 1
    """
    return q, sql


def build_wave61_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_readability",) + _readability_query()))
    add(*(("events_out_of_order",) + _out_of_order_query()))
    add(*(("doc_theil_sen_w8",) + _theil_sen_query()))
    return queries, oracles
