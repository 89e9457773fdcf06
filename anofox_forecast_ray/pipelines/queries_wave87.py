"""Wave-87 queries: MTBF/MTTR run lengths and source moment shape.

- events_mtbf_mttr: mean run lengths of the error / non-error
  indicator in event_id order — the availability metrics (mean
  events between failures / mean failure-burst length). Second use
  of the wave-65 ORDERED distributed aggregation: per-segment
  partials carry (runs of 1s, first/last indicator, total 1s); the
  driver stitches the bounded segment table by min event_id, merging
  run counts across boundaries (a 1-run spanning two segments counts
  once).
- source_moments34: skewness g1 and excess kurtosis g2 of doc token
  counts per source, from raw integer power sums (sum y, y^2, y^3,
  y^4 — all within int64 at the doc-length envelope): the n-scaled
  central moments m_k = E[(y - mean)^k] expand to the identical
  float expression of exact ints on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------------------- events_mtbf_mttr
def _mtbf_query(target: str = "error"):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def segment(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "min_eid": pa.array([], type=pa.int64()),
                "max_eid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "n1": pa.array([], type=pa.int64()),
                "runs1": pa.array([], type=pa.int64()),
                "runs0": pa.array([], type=pa.int64()),
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
            change = b[1:] != b[:-1]
            starts1 = int(b[0] == 1) + int(
                ((b[1:] == 1) & change).sum())
            starts0 = int(b[0] == 0) + int(
                ((b[1:] == 0) & change).sum())
            return pa.table({
                "min_eid": pa.array([int(eid[0])],
                                    type=pa.int64()),
                "max_eid": pa.array([int(eid[-1])],
                                    type=pa.int64()),
                "n": pa.array([len(b)], type=pa.int64()),
                "n1": pa.array([int(b.sum())], type=pa.int64()),
                "runs1": pa.array([starts1], type=pa.int64()),
                "runs0": pa.array([starts0], type=pa.int64()),
                "first": pa.array([int(b[0])], type=pa.int8()),
                "last": pa.array([int(b[-1])], type=pa.int8()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["event_id", "event_type"])
            .map_batches(segment, batch_format="pyarrow")
            .to_arrow_refs()
        )
        segs = tree_reduce_tables(refs, lambda t: t).to_pandas()
        segs = segs.sort_values("min_eid").reset_index(drop=True)
        assert (segs["min_eid"].to_numpy()[1:]
                > segs["max_eid"].to_numpy()[:-1]).all()
        n = int(segs["n"].sum())
        n1 = int(segs["n1"].sum())
        runs1 = 0
        runs0 = 0
        prev_last = None
        for r in segs.itertuples():
            runs1 += int(r.runs1)
            runs0 += int(r.runs0)
            if prev_last is not None:
                if prev_last == 1 and int(r.first) == 1:
                    runs1 -= 1
                if prev_last == 0 and int(r.first) == 0:
                    runs0 -= 1
            prev_last = int(r.last)
        n0 = n - n1
        mttr = float(n1) / float(runs1)
        mtbf = float(n0) / float(runs0)
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "runs_fail": pa.array([runs1], type=pa.int64()),
            "runs_ok": pa.array([runs0], type=pa.int64()),
            "mttr_events": pa.array([mttr], type=pa.float64()),
            "mtbf_events": pa.array([mtbf], type=pa.float64()),
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
               CAST(sum(CASE WHEN v = 1 AND (pv IS NULL
                              OR pv = 0) THEN 1 ELSE 0 END)
                    AS BIGINT) AS runs1,
               CAST(sum(CASE WHEN v = 0 AND (pv IS NULL
                              OR pv = 1) THEN 1 ELSE 0 END)
                    AS BIGINT) AS runs0
        FROM lagged
    )
    SELECT n, runs1 AS runs_fail, runs0 AS runs_ok,
           CAST(n1 AS DOUBLE) / CAST(runs1 AS DOUBLE)
               AS mttr_events,
           CAST(n - n1 AS DOUBLE) / CAST(runs0 AS DOUBLE)
               AS mtbf_events
    FROM agg
    """
    return q, sql


# ------------------------------------------------------------- source_moments34
def _moments34_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s1": pa.array([], type=pa.int64()),
                "s2": pa.array([], type=pa.int64()),
                "s3": pa.array([], type=pa.int64()),
                "s4": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _v, lengths = _flat_tokens(t)
            y = np.asarray(lengths, dtype=np.int64)
            src = np.asarray(t.column("source").to_pylist())
            uk, inv = np.unique(src, return_inverse=True)

            def acc(v):
                out = np.zeros(uk.size, dtype=np.int64)
                np.add.at(out, inv, v)
                return out

            return pa.table({
                "source": pa.array(uk, type=pa.string()),
                "n": pa.array(acc(np.ones_like(y))),
                "s1": pa.array(acc(y)),
                "s2": pa.array(acc(y * y)),
                "s3": pa.array(acc(y * y * y)),
                "s4": pa.array(acc(y * y * y * y)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate(
                [(c, "sum") for c in
                 ("n", "s1", "s2", "s3", "s4")])
            return pa.table({
                "source": g.column("source"),
                **{c: g.column(f"{c}_sum").cast(pa.int64())
                   for c in ("n", "s1", "s2", "s3", "s4")},
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values("source").reset_index(drop=True)
        rows = []
        for r in a.itertuples():
            nf = float(int(r.n))
            m = float(int(r.s1)) / nf
            m2 = float(int(r.s2)) / nf - m * m
            m3 = (float(int(r.s3)) / nf
                  - 3.0 * m * (float(int(r.s2)) / nf)
                  + 2.0 * m * m * m)
            m4 = (float(int(r.s4)) / nf
                  - 4.0 * m * (float(int(r.s3)) / nf)
                  + 6.0 * m * m * (float(int(r.s2)) / nf)
                  - 3.0 * m * m * m * m)
            g1 = m3 / (m2 * math.sqrt(m2)) if m2 > 0 else 0.0
            g2 = m4 / (m2 * m2) - 3.0 if m2 > 0 else 0.0
            rows.append((r.source, int(r.n), g1, g2))
        return pa.table({
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "n_docs": pa.array([r[1] for r in rows],
                               type=pa.int64()),
            "skewness": pa.array([r[2] for r in rows],
                                 type=pa.float64()),
            "kurtosis_excess": pa.array([r[3] for r in rows],
                                        type=pa.float64()),
        })

    m = "(CAST(s1 AS DOUBLE) / nf)"
    s2n = "(CAST(s2 AS DOUBLE) / nf)"
    s3n = "(CAST(s3 AS DOUBLE) / nf)"
    s4n = "(CAST(s4 AS DOUBLE) / nf)"
    m2 = f"({s2n} - {m} * {m})"
    m3 = (f"({s3n} - 3.0e0 * {m} * {s2n}"
          f" + 2.0e0 * {m} * {m} * {m})")
    m4 = (f"({s4n} - 4.0e0 * {m} * {s3n}"
          f" + 6.0e0 * {m} * {m} * {s2n}"
          f" - 3.0e0 * {m} * {m} * {m} * {m})")
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    len AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, d.source,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS y
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n
                   FROM tok GROUP BY doc_id) c
          ON c.doc_id = CAST(d.doc_id AS VARCHAR)
    ),
    g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(y) AS BIGINT) AS s1,
               CAST(sum(y * y) AS BIGINT) AS s2,
               CAST(sum(y * y * y) AS BIGINT) AS s3,
               CAST(sum(y * y * y * y) AS BIGINT) AS s4
        FROM len GROUP BY source
    )
    SELECT source, n AS n_docs,
           CASE WHEN {m2} > 0
                THEN {m3} / ({m2} * sqrt({m2}))
                ELSE 0.0e0 END AS skewness,
           CASE WHEN {m2} > 0
                THEN {m4} / ({m2} * {m2}) - 3.0e0
                ELSE 0.0e0 END AS kurtosis_excess
    FROM g
    """
    return q, sql


def build_wave87_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mtbf_mttr",) + _mtbf_query()))
    add(*(("source_moments34",) + _moments34_query()))
    return queries, oracles
