"""Wave-100 queries: bigram direction asymmetry and DAU Jaccard.

- corpus_bigram_asymmetry: how directional is the character process?
  A = sum |c_ab - c_ba| / sum (c_ab + c_ba) over unordered pairs
  a < b (1 = fully one-way, 0 = reversible). Pure int64 from the
  bounded bigram table; natural text scores high (e.g. 'q'->'u'
  almost never reverses).
- events_dau_jaccard: day-over-day active-user overlap — Jaccard
  of the daily active user sets between consecutive days (the
  classic retention diagnostic next to events_dau_wau; the weekly
  variant is degenerate on this corpus — every user is active every
  week). Distinct (day, user) pairs reduce per block; intersections
  via the consecutive-day self-join; all integer counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# --------------------------------------------------- corpus_bigram_asymmetry
def _asymmetry_query():
    def q(sf_dir: str):
        from ..extras.lm import SHIFT, train_bigram_model

        model = train_bigram_model(corpus_ds(sf_dir))
        keys, c2, _ak, _c1, _v, _lt = model
        a = keys // SHIFT
        b = keys % SHIFT
        # map each ordered pair onto its unordered key
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        ukey = lo * SHIFT + hi
        order = np.argsort(ukey, kind="stable")
        uk = ukey[order]
        cc = c2[order]
        fwd = (a <= b)[order]  # a<=b counts as "forward"
        new = np.r_[True, uk[1:] != uk[:-1]]
        gid = np.cumsum(new) - 1
        ng = int(gid[-1]) + 1 if len(gid) else 0
        f = np.zeros(ng, dtype=np.int64)
        r = np.zeros(ng, dtype=np.int64)
        np.add.at(f, gid[fwd], cc[fwd])
        np.add.at(r, gid[~fwd], cc[~fwd])
        # exclude self-pairs a == b (always symmetric)
        lo_g = uk[new] // SHIFT
        hi_g = uk[new] % SHIFT
        off_diag = lo_g != hi_g
        num = int(np.abs(f[off_diag] - r[off_diag]).sum())
        den = int((f[off_diag] + r[off_diag]).sum())
        asym = float(num) / float(den) if den > 0 else 0.0
        return pa.table({
            "n_pairs": pa.array([int(off_diag.sum())],
                                type=pa.int64()),
            "num": pa.array([num], type=pa.int64()),
            "den": pa.array([den], type=pa.int64()),
            "asymmetry": pa.array([asym], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    pr AS (
        SELECT t1.token AS a, t2.token AS b
        FROM tok t1 JOIN tok t2
          ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY a, b),
    und AS (
        SELECT LEAST(a, b) AS lo, GREATEST(a, b) AS hi,
               CAST(sum(CASE WHEN a <= b THEN c ELSE 0 END)
                    AS BIGINT) AS f,
               CAST(sum(CASE WHEN a > b THEN c ELSE 0 END)
                    AS BIGINT) AS r
        FROM c2 GROUP BY lo, hi
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(abs(f - r)) AS BIGINT) AS num,
               CAST(sum(f + r) AS BIGINT) AS den
        FROM und WHERE lo <> hi
    )
    SELECT n_pairs, num, den,
           CASE WHEN den > 0
                THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                ELSE 0.0e0 END AS asymmetry
    FROM agg
    """
    return q, sql


# --------------------------------------------------------- events_wau_jaccard
def _dau_jaccard_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "week": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            week = tus // 86_400_000_000
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            key = week * 10_000_000 + uid
            uk = np.unique(key)
            return pa.table({
                "week": pa.array(uk // 10_000_000),
                "user_id": pa.array(uk % 10_000_000),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["week", "user_id"]).aggregate([])
            return pa.table({
                "week": g.column("week").cast(pa.int64()),
                "user_id": g.column("user_id").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        weeks = sorted(a["week"].unique())
        sets = {int(w): set(g["user_id"].astype(int))
                for w, g in a.groupby("week")}
        w0 = int(weeks[0])
        out_w, out_i, out_u, out_j = [], [], [], []
        for w1, w2 in zip(weeks, weeks[1:]):
            s1, s2 = sets[int(w1)], sets[int(w2)]
            inter = len(s1 & s2)
            union = len(s1 | s2)
            out_w.append(int(w2) - w0)
            out_i.append(inter)
            out_u.append(union)
            out_j.append(float(inter) / float(union)
                         if union else 0.0)
        return pa.table({
            "day_idx": pa.array(out_w, type=pa.int64()),
            "n_inter": pa.array(out_i, type=pa.int64()),
            "n_union": pa.array(out_u, type=pa.int64()),
            "jaccard": pa.array(out_j, type=pa.float64()),
        })

    sql = """
    WITH wa AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS week,
               user_id
        FROM events
    ),
    w0 AS (SELECT min(week) AS w0 FROM wa),
    sizes AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n
        FROM wa GROUP BY week
    ),
    inter AS (
        SELECT a.week + 1 AS week,
               CAST(count(*) AS BIGINT) AS ni
        FROM wa a JOIN wa b
          ON b.week = a.week + 1 AND b.user_id = a.user_id
        GROUP BY a.week
    )
    SELECT CAST(s2.week - (SELECT w0 FROM w0) AS BIGINT)
               AS day_idx,
           COALESCE(i.ni, 0) AS n_inter,
           CAST(s1.n + s2.n - COALESCE(i.ni, 0) AS BIGINT)
               AS n_union,
           CAST(COALESCE(i.ni, 0) AS DOUBLE)
               / CAST(s1.n + s2.n - COALESCE(i.ni, 0) AS DOUBLE)
               AS jaccard
    FROM sizes s1
    JOIN sizes s2 ON s2.week = s1.week + 1
    LEFT JOIN inter i ON i.week = s2.week
    """
    return q, sql


def build_wave100_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_bigram_asymmetry",) + _asymmetry_query()))
    add(*(("events_dau_jaccard",) + _dau_jaccard_query()))
    return queries, oracles
