"""Wave-65 queries: turning-point randomness test, distributed
Wald-Wolfowitz runs test, and seasonal Mann-Kendall trend test.

- doc_turning_points: turning-point test for serial randomness
  (Kendall & Stuart): T = # strict local extrema of the token
  series; under iid, E[T] = 2(n-2)/3, Var[T] = (16n-29)/90, z =
  (T - mu)/sigma. T is a pure integer comparison count (vectorized
  shifted masks); the oracle replays it with lag/lead windows.
- events_runs_test: Wald-Wolfowitz runs test of the error/non-error
  indicator sequence in event_id order — implemented as an ORDERED
  distributed aggregation, the one combine in the repo that is NOT
  commutative: each scan task emits a contiguous-segment summary
  (min/max event_id, n, n_err, runs, first/last indicator); Ray Data
  does not guarantee block order (preserve_order defaults off), so
  the driver sorts the bounded segment table by min_event_id and
  stitches runs sequentially (runs merge: R = R1 + R2 - [last1 ==
  first2]). z uses the exact integer (n1, n0, R) moments. The file
  is event_id-ordered, so segments are disjoint ranges by
  construction (asserted).
- doc_seasonal_mk_w8: seasonal Mann-Kendall trend test (Hirsch &
  Slack 1984) over the w8 window-sum series with period 4: per
  season S_s = sum of sign(x_j - x_i) over i<j pairs INSIDE the
  season (integer pair expansion, the wave-59 vectorized i<j trick),
  tie-corrected variance Var = sum_s [n_s(n_s-1)(2n_s+5) -
  sum_t t(t-1)(2t+5)]/18, continuity-corrected z. Everything is
  int64 until the final scalar division/sqrt.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

MK_PERIOD = 4


# ------------------------------------------------------- doc_turning_points
def _turning_points_query():
    def q(sf_dir: str):
        def tp(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "n_turning": pa.array([], type=pa.int64()),
                "z": pa.array([], type=pa.float64()),
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
            keep = lens >= 3
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            # interior positions per doc: starts+1 .. starts+len-2
            tot = int((dlens - 2).sum())
            g = np.repeat(np.arange(nd), dlens - 2)
            j = (np.arange(tot)
                 - np.repeat(np.cumsum(dlens - 2)
                             - (dlens - 2), dlens - 2))
            pos = starts[g] + j + 1
            a = flat[pos - 1]
            b = flat[pos]
            c = flat[pos + 1]
            is_tp = (((b > a) & (b > c))
                     | ((b < a) & (b < c))).astype(np.int64)
            tcnt = np.bincount(
                g, weights=is_tp, minlength=nd).astype(np.int64)
            nf = dlens.astype(np.float64)
            mu = 2.0 * (nf - 2.0) / 3.0
            sg = np.sqrt((16.0 * nf - 29.0) / 90.0)
            z = (tcnt.astype(np.float64) - mu) / sg
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "n_turning": pa.array(tcnt),
                "z": pa.array(z, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            tp, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "n_turning": pa.int64(),
            "z": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lagged AS (
        SELECT doc_id, token,
               lag(token) OVER (PARTITION BY doc_id
                                ORDER BY pos) AS a,
               lead(token) OVER (PARTITION BY doc_id
                                 ORDER BY pos) AS c
        FROM tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a IS NOT NULL AND c IS NOT NULL
                              AND ((token > a AND token > c)
                                   OR (token < a AND token < c))
                         THEN 1 ELSE 0 END) AS BIGINT) AS t
        FROM lagged GROUP BY doc_id HAVING count(*) >= 3
    )
    SELECT doc_id, n AS n_tok, t AS n_turning,
           (CAST(t AS DOUBLE)
            - 2.0e0 * (CAST(n AS DOUBLE) - 2.0e0) / 3.0e0)
           / sqrt((16.0e0 * CAST(n AS DOUBLE) - 29.0e0) / 90.0e0)
               AS z
    FROM agg
    """
    return q, sql


# ---------------------------------------------------------- events_runs_test
def _runs_test_query(target: str = "error"):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def segment(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "min_eid": pa.array([], type=pa.int64()),
                "max_eid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "n1": pa.array([], type=pa.int64()),
                "runs": pa.array([], type=pa.int64()),
                "first": pa.array([], type=pa.int8()),
                "last": pa.array([], type=pa.int8()),
            })
            if "event_id" not in t.column_names or t.num_rows == 0:
                return empty
            eid = t.column("event_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            b = np.asarray(
                [et == target
                 for et in t.column("event_type").to_pylist()],
                dtype=np.int8)
            # rows inside a block keep file order (event_id asc)
            runs = 1 + int((b[1:] != b[:-1]).sum())
            return pa.table({
                "min_eid": pa.array([int(eid[0])], type=pa.int64()),
                "max_eid": pa.array([int(eid[-1])],
                                    type=pa.int64()),
                "n": pa.array([len(b)], type=pa.int64()),
                "n1": pa.array([int(b.sum())], type=pa.int64()),
                "runs": pa.array([runs], type=pa.int64()),
                "first": pa.array([int(b[0])], type=pa.int8()),
                "last": pa.array([int(b[-1])], type=pa.int8()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["event_id", "event_type"])
            .map_batches(segment, batch_format="pyarrow")
            .to_arrow_refs()
        )
        segs = tree_reduce_tables(
            refs, lambda t: t).to_pandas()
        # Ray block order is not guaranteed: reconstruct stream order
        # from the disjoint event_id ranges, then stitch sequentially
        segs = segs.sort_values("min_eid").reset_index(drop=True)
        assert (segs["min_eid"].to_numpy()[1:]
                > segs["max_eid"].to_numpy()[:-1]).all(), \
            "segments overlap: input not event_id-ordered"
        n = int(segs["n"].sum())
        n1 = int(segs["n1"].sum())
        runs = 0
        prev_last = None
        for r in segs.itertuples():
            runs += int(r.runs)
            if prev_last is not None and prev_last == int(r.first):
                runs -= 1
            prev_last = int(r.last)
        n0 = n - n1
        mu = 2.0 * float(n1) * float(n0) / float(n) + 1.0
        var = (2.0 * float(n1) * float(n0)
               * (2.0 * float(n1) * float(n0) - float(n))
               / (float(n) * float(n) * (float(n) - 1.0)))
        z = (float(runs) - mu) / math.sqrt(var)
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "n_target": pa.array([n1], type=pa.int64()),
            "runs": pa.array([runs], type=pa.int64()),
            "z": pa.array([z], type=pa.float64()),
        })

    sql = f"""
    WITH b AS (
        SELECT event_id,
               CASE WHEN event_type = '{target}' THEN 1 ELSE 0 END
                   AS v
        FROM events
    ),
    lagged AS (
        SELECT v, lag(v) OVER (ORDER BY event_id) AS pv FROM b
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS n1,
               CAST(1 + sum(CASE WHEN pv IS NOT NULL AND v <> pv
                            THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM lagged
    )
    SELECT n, n1 AS n_target, runs,
           (CAST(runs AS DOUBLE)
            - (2.0e0 * CAST(n1 AS DOUBLE)
               * CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE)
               + 1.0e0))
           / sqrt(2.0e0 * CAST(n1 AS DOUBLE)
                  * CAST(n - n1 AS DOUBLE)
                  * (2.0e0 * CAST(n1 AS DOUBLE)
                     * CAST(n - n1 AS DOUBLE) - CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * (CAST(n AS DOUBLE) - 1.0e0))) AS z
    FROM agg
    """
    return q, sql


# ------------------------------------------------------ doc_seasonal_mk_w8
def _seasonal_mk_query(width: int = 8, period: int = MK_PERIOD):
    def q(sf_dir: str):
        def smk(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "m": pa.array([], type=pa.int64()),
                "s_stat": pa.array([], type=pa.int64()),
                "var18": pa.array([], type=pa.int64()),
                "z": pa.array([], type=pa.float64()),
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
            # window ALL non-empty docs first (reduceat boundaries
            # must stay contiguous), then drop short docs row-wise —
            # filtering docs before reduceat would make the previous
            # doc's last window swallow the dropped doc's tokens
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
            dkeep = nw_a >= 2 * period
            if not dkeep.any():
                return empty
            ids_all = [d for d, k in zip(
                t.column("doc_id").to_pylist(), kt) if k]
            ids = [d for d, k in zip(ids_all, dkeep) if k]
            nw = nw_a[dkeep]
            nd = len(ids)
            newidx = np.cumsum(dkeep) - 1
            rkeep = dkeep[grp_a]
            grp = newidx[grp_a[rkeep]]
            wid = wid_a[rkeep]
            ws = ws_a[rkeep]
            season = wid % period
            # pair expansion per (doc, season): sort by (doc, season,
            # wid) then expand i<j inside runs
            order = np.lexsort((wid, season, grp))
            sd = grp[order]
            ss = season[order]
            sv = ws[order]
            new = np.r_[True, (sd[1:] != sd[:-1])
                        | (ss[1:] != ss[:-1])]
            rstart = np.flatnonzero(new)
            rcnt = np.diff(np.r_[rstart, len(sv)])
            nruns = rcnt.size
            sq = rcnt * rcnt
            tot2 = int(sq.sum())
            g2 = np.repeat(np.arange(nruns), sq)
            within = (np.arange(tot2)
                      - np.repeat(np.cumsum(sq) - sq, sq))
            c = rcnt[g2]
            ii = within // c
            jj = within % c
            mask = ii < jj
            g2m = g2[mask]
            yi = sv[rstart[g2m] + ii[mask]]
            yj = sv[rstart[g2m] + jj[mask]]
            sgn = np.sign(yj - yi)
            s_run = np.bincount(
                g2m, weights=sgn, minlength=nruns).astype(np.int64)
            # tie groups need a VALUE-sorted pass (the wid-sorted run
            # order above only finds accidentally-adjacent ties)
            order2 = np.lexsort((ws, season, grp))
            td = grp[order2]
            ts_ = season[order2]
            tv = ws[order2]
            newt = np.r_[True, (td[1:] != td[:-1])
                         | (ts_[1:] != ts_[:-1])
                         | (tv[1:] != tv[:-1])]
            tstart = np.flatnonzero(newt)
            tcnt = np.diff(np.r_[tstart, len(tv)]).astype(np.int64)
            tie_term = tcnt * (tcnt - 1) * (2 * tcnt + 5)
            tie_doc = np.bincount(
                td[tstart], weights=tie_term, minlength=nd
            ).astype(np.int64)
            nsr = rcnt.astype(np.int64)
            run_doc = sd[rstart]
            s_doc = np.bincount(
                run_doc, weights=s_run, minlength=nd
            ).astype(np.int64)
            var_doc = np.bincount(
                run_doc,
                weights=nsr * (nsr - 1) * (2 * nsr + 5),
                minlength=nd,
            ).astype(np.int64) - tie_doc
            z = np.zeros(nd, dtype=np.float64)
            for i in range(nd):
                if var_doc[i] <= 0:
                    continue
                sd_ = math.sqrt(float(var_doc[i]) / 18.0)
                if s_doc[i] > 0:
                    z[i] = (float(s_doc[i]) - 1.0) / sd_
                elif s_doc[i] < 0:
                    z[i] = (float(s_doc[i]) + 1.0) / sd_
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "m": pa.array(nw, type=pa.int64()),
                "s_stat": pa.array(s_doc),
                "var18": pa.array(var_doc),
                "z": pa.array(z, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            smk, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "m": pa.int64(),
            "s_stat": pa.int64(),
            "var18": pa.int64(),
            "z": pa.float64(),
        })

    p = period
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               (pos // {width}) % {p} AS season,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, pos // {width}
    ),
    mm AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS m
        FROM w GROUP BY doc_id HAVING count(*) >= {2 * p}
    ),
    pairs AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.s > a.s THEN 1
                             WHEN b.s < a.s THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM w a JOIN w b
          ON a.doc_id = b.doc_id AND a.season = b.season
         AND a.wid < b.wid
        GROUP BY a.doc_id
    ),
    seas AS (
        SELECT doc_id, season, CAST(count(*) AS BIGINT) AS ns
        FROM w GROUP BY doc_id, season
    ),
    ties AS (
        SELECT doc_id, season,
               CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tt
        FROM (SELECT doc_id, season, CAST(count(*) AS BIGINT) AS c
              FROM w GROUP BY doc_id, season, s)
        GROUP BY doc_id, season
    ),
    vv AS (
        SELECT seas.doc_id,
               CAST(sum(seas.ns * (seas.ns - 1) * (2 * seas.ns + 5)
                        - ties.tt) AS BIGINT) AS var18
        FROM seas JOIN ties ON ties.doc_id = seas.doc_id
                           AND ties.season = seas.season
        GROUP BY seas.doc_id
    )
    SELECT mm.doc_id, mm.m,
           CAST(COALESCE(pairs.s_stat, 0) AS BIGINT) AS s_stat,
           vv.var18,
           CASE WHEN vv.var18 <= 0 THEN 0.0e0
                WHEN COALESCE(pairs.s_stat, 0) > 0
                THEN (CAST(pairs.s_stat AS DOUBLE) - 1.0e0)
                     / sqrt(CAST(vv.var18 AS DOUBLE) / 18.0e0)
                WHEN COALESCE(pairs.s_stat, 0) < 0
                THEN (CAST(pairs.s_stat AS DOUBLE) + 1.0e0)
                     / sqrt(CAST(vv.var18 AS DOUBLE) / 18.0e0)
                ELSE 0.0e0 END AS z
    FROM mm
    JOIN vv ON vv.doc_id = mm.doc_id
    LEFT JOIN pairs ON pairs.doc_id = mm.doc_id
    """
    return q, sql


def build_wave65_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_turning_points",) + _turning_points_query()))
    add(*(("events_runs_test",) + _runs_test_query()))
    add(*(("doc_seasonal_mk_w8",) + _seasonal_mk_query()))
    return queries, oracles
