"""Wave-116 queries: time-reversal asymmetry and diff-in-differences.

- doc_trev_c3: two classic nonlinearity features per doc (tsfresh
  family, lag 1): c3 = mean of x_{t+2} x_{t+1} x_t (third-order
  moment sensitive to quadratic phase coupling) and trev = mean of
  (x_{t+1} - x_t)^3 (time-reversal asymmetry — zero for any
  reversible process). Triple products of codepoints stay < 2^63
  per term; the SUMS are arbitrary-precision (Python int / HUGEINT),
  each feature one float division.
- events_did_error: difference-in-differences on the per-event error
  rate — cohorts by a multiplicative-hash bit of user_id (NOT a
  residue: the corpus assigns other attributes by id parity),
  periods by the midpoint day. DiD = (treat_post - treat_pre) -
  (ctrl_post - ctrl_pre), each cell rate a single division of exact
  int counts from a bounded 4-cell partial table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

MIX32 = 2654435761


# -------------------------------------------------------------- doc_trev_c3
def _trev_c3_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def feat(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "c3": pa.array([], type=pa.float64()),
                "trev": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            out_i, out_n, out_c3, out_tr = [], [], [], []
            off = 0
            for i, ln_ in enumerate(lengths):
                seg = values[off: off + int(ln_)].astype(np.int64)
                off += int(ln_)
                n = int(ln_)
                if n < 3:
                    continue
                trip = seg[2:] * seg[1:-1] * seg[:-2]
                s_c3 = int(sum(int(x) for x in trip))
                d = seg[1:] - seg[:-1]
                cubes = d * d * d
                s_tr = int(sum(int(x) for x in cubes))
                out_i.append(ids[i])
                out_n.append(n)
                out_c3.append(float(s_c3) / float(n - 2))
                out_tr.append(float(s_tr) / float(n - 1))
            return pa.table({
                "doc_id": pa.array(out_i, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
                "c3": pa.array(out_c3, type=pa.float64()),
                "trev": pa.array(out_tr, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(feat, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n": pa.int64(),
            "c3": pa.float64(),
            "trev": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lagged AS (
        SELECT doc_id, pos, token,
               lead(token, 1) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS t1,
               lead(token, 2) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS t2
        FROM tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN t2 IS NOT NULL THEN
                   CAST(t2 AS HUGEINT) * t1 * token END)
                   AS HUGEINT) AS s_c3,
               CAST(sum(CASE WHEN t1 IS NOT NULL THEN
                   CAST(t1 - token AS HUGEINT)
                   * (t1 - token) * (t1 - token) END)
                   AS HUGEINT) AS s_tr
        FROM lagged GROUP BY doc_id
    )
    SELECT doc_id, n,
           CAST(s_c3 AS DOUBLE) / CAST(n - 2 AS DOUBLE) AS c3,
           CAST(s_tr AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS trev
    FROM agg WHERE n >= 3
    """
    return q, sql


# ---------------------------------------------------------- events_did_error
def _did_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "treat": pa.array([], type=pa.int64()),
                "errs": pa.array([], type=pa.int64()),
                "evts": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            uid = t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            treat = ((uid * np.int64(MIX32)) % np.int64(1 << 32)
                     ) // np.int64(1 << 31)
            et = np.asarray(t.column("event_type").to_pylist())
            is_err = (et == "error").astype(np.int64)
            key = treat * np.int64(1 << 32) + day
            uk, inv = np.unique(key, return_inverse=True)
            errs = np.bincount(inv, weights=is_err).astype(np.int64)
            evts = np.bincount(inv).astype(np.int64)
            return pa.table({
                "day": pa.array(uk % np.int64(1 << 32),
                                type=pa.int64()),
                "treat": pa.array(uk >> np.int64(32),
                                  type=pa.int64()),
                "errs": pa.array(errs),
                "evts": pa.array(evts),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "treat"]).aggregate(
                [("errs", "sum"), ("evts", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "treat": g.column("treat").cast(pa.int64()),
                "errs": g.column("errs_sum").cast(pa.int64()),
                "evts": g.column("evts_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        d0 = int(a["day"].min())
        d1 = int(a["day"].max())
        dmid = d0 + (d1 - d0 + 1) // 2
        cells = {}
        for _, r in a.iterrows():
            post = 1 if int(r["day"]) >= dmid else 0
            key = (int(r["treat"]), post)
            e, v = cells.get(key, (0, 0))
            cells[key] = (e + int(r["errs"]), v + int(r["evts"]))
        rate = {k: float(v[0]) / float(v[1])
                for k, v in cells.items()}
        did = ((rate[(1, 1)] - rate[(1, 0)])
               - (rate[(0, 1)] - rate[(0, 0)]))
        return pa.table({
            "ctrl_pre": pa.array([rate[(0, 0)]], type=pa.float64()),
            "ctrl_post": pa.array([rate[(0, 1)]], type=pa.float64()),
            "treat_pre": pa.array([rate[(1, 0)]], type=pa.float64()),
            "treat_post": pa.array([rate[(1, 1)]], type=pa.float64()),
            "n_events": pa.array(
                [sum(v[1] for v in cells.values())], type=pa.int64()),
            "did": pa.array([did], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               ((user_id * {MIX32}) % 4294967296) // 2147483648
                   AS treat,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    b AS (
        SELECT min(day) + (max(day) - min(day) + 1) // 2 AS dmid
        FROM e
    ),
    cells AS (
        SELECT treat,
               CASE WHEN day >= b.dmid THEN 1 ELSE 0 END AS post,
               CAST(sum(ise) AS BIGINT) AS errs,
               CAST(count(*) AS BIGINT) AS evts
        FROM e CROSS JOIN b GROUP BY treat, post
    ),
    r AS (
        SELECT
            max(CASE WHEN treat = 0 AND post = 0 THEN
                CAST(errs AS DOUBLE) / CAST(evts AS DOUBLE) END)
                AS ctrl_pre,
            max(CASE WHEN treat = 0 AND post = 1 THEN
                CAST(errs AS DOUBLE) / CAST(evts AS DOUBLE) END)
                AS ctrl_post,
            max(CASE WHEN treat = 1 AND post = 0 THEN
                CAST(errs AS DOUBLE) / CAST(evts AS DOUBLE) END)
                AS treat_pre,
            max(CASE WHEN treat = 1 AND post = 1 THEN
                CAST(errs AS DOUBLE) / CAST(evts AS DOUBLE) END)
                AS treat_post,
            CAST(sum(evts) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT ctrl_pre, ctrl_post, treat_pre, treat_post, n_events,
           (treat_post - treat_pre) - (ctrl_post - ctrl_pre) AS did
    FROM r
    """
    return q, sql


def build_wave116_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_trev_c3",) + _trev_c3_query()))
    add(*(("events_did_error",) + _did_query()))
    return queries, oracles
