"""Wave-115 queries: Friedman test and record (running-max) statistics.

- events_friedman_daily: Friedman's nonparametric repeated-measures
  test — blocks = days, treatments = the k event types, response =
  the daily event count. Within-day ranks use DOUBLED midranks
  (2*cum_before + ties + 1, the wave-43 Mann-Whitney trick) so tie
  handling stays fully integer; with R'_j = 2*R_j the statistic is
  Q = 3*S' / (n k (k+1)) - 3 n (k+1)  (S' = sum R'_j^2, exact int)
  — one float division and one product, bitwise-replayable. The
  daily count matrix is bounded (days x 5), built from per-block
  (day, type, cnt) partials.
- doc_record_stats: record statistics of each doc's token sequence —
  how many running-maximum records occur (first token counts), and
  the position of the last record. For an i.i.d. sequence the
  expected count is H_n, so the excess flags trending/sorted
  structure. Pure integer window logic on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ---------------------------------------------------- events_friedman_daily
def _friedman_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "etype": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            et = np.asarray(t.column("event_type").to_pylist())
            names, inv = np.unique(et, return_inverse=True)
            key = inv.astype(np.int64) * np.int64(1 << 32) + day
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "day": pa.array(uk % np.int64(1 << 32),
                                type=pa.int64()),
                "etype": pa.array(names[uk >> np.int64(32)],
                                  type=pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "etype"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "etype": g.column("etype"),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        types = sorted(a["etype"].unique())
        days = sorted(a["day"].unique())
        k = len(types)
        n = len(days)
        cnt = {(int(r["day"]), r["etype"]): int(r["cnt"])
               for _, r in a.iterrows()}
        r2 = {ty: 0 for ty in types}  # doubled rank sums
        for d in days:
            vals = [cnt.get((int(d), ty), 0) for ty in types]
            order = np.asarray(vals, dtype=np.int64)
            for j, ty in enumerate(types):
                less = int((order < order[j]).sum())
                ties = int((order == order[j]).sum())
                r2[ty] += 2 * less + ties + 1
        s2 = sum(v * v for v in r2.values())
        q_stat = (3.0 * float(s2) / float(n * k * (k + 1))
                  - 3.0 * float(n * (k + 1)))
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "k": pa.array([k], type=pa.int64()),
            "s2": pa.array([s2], type=pa.int64()),
            "friedman_q": pa.array([q_stat], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type
        FROM events
    ),
    cells AS (
        SELECT d.day, t.event_type,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS cnt
        FROM (SELECT DISTINCT day FROM e) d
        CROSS JOIN (SELECT DISTINCT event_type FROM e) t
        LEFT JOIN (
            SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
            FROM e GROUP BY day, event_type
        ) c ON c.day = d.day AND c.event_type = t.event_type
    ),
    ranked AS (
        SELECT a.day, a.event_type,
               CAST(2 * sum(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END)
                    + sum(CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END)
                    + 1 AS BIGINT) AS mr2
        FROM cells a JOIN cells b ON b.day = a.day
        GROUP BY a.day, a.event_type
    ),
    rsums AS (
        SELECT event_type, CAST(sum(mr2) AS BIGINT) AS r2
        FROM ranked GROUP BY event_type
    ),
    dims AS (
        SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS k
        FROM e
    ),
    s AS (
        SELECT CAST(sum(r2 * r2) AS BIGINT) AS s2 FROM rsums
    )
    SELECT d.n AS n_days, d.k AS k, s.s2 AS s2,
           3.0e0 * CAST(s.s2 AS DOUBLE)
               / CAST(d.n * d.k * (d.k + 1) AS DOUBLE)
           - 3.0e0 * CAST(d.n * (d.k + 1) AS DOUBLE) AS friedman_q
    FROM dims d, s
    """
    return q, sql


# -------------------------------------------------------- doc_record_stats
def _record_stats_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def rec(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "n_records": pa.array([], type=pa.int64()),
                "last_record_pos": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            out_i, out_n, out_r, out_p = [], [], [], []
            off = 0
            for i, ln_ in enumerate(lengths):
                seg = values[off: off + int(ln_)].astype(np.int64)
                off += int(ln_)
                if ln_ == 0:
                    continue
                cummax = np.maximum.accumulate(seg)
                is_rec = np.empty(seg.size, dtype=bool)
                is_rec[0] = True
                is_rec[1:] = seg[1:] > cummax[:-1]
                out_i.append(ids[i])
                out_n.append(int(ln_))
                out_r.append(int(is_rec.sum()))
                out_p.append(int(np.flatnonzero(is_rec)[-1]))
            return pa.table({
                "doc_id": pa.array(out_i, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
                "n_records": pa.array(out_r, type=pa.int64()),
                "last_record_pos": pa.array(out_p, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(rec, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n": pa.int64(),
            "n_records": pa.int64(),
            "last_record_pos": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos, token,
               max(token) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS prevmax
        FROM tok
    ),
    recs AS (
        SELECT doc_id, pos,
               CASE WHEN prevmax IS NULL OR token > prevmax
                    THEN 1 ELSE 0 END AS isrec
        FROM w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(isrec) AS BIGINT) AS n_records,
           CAST(max(CASE WHEN isrec = 1 THEN pos END) AS BIGINT)
               AS last_record_pos
    FROM recs GROUP BY doc_id
    """
    return q, sql


def build_wave115_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_friedman_daily",) + _friedman_query()))
    add(*(("doc_record_stats",) + _record_stats_query()))
    return queries, oracles
