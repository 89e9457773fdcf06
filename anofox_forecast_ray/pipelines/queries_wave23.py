"""Wave-23 queries: multi-level aggregation.

- events_grouping_sets_daily: ROLLUP/GROUPING SETS semantics — four
  aggregation levels ((type,day), (type), (day), ()) derived from ONE
  pass of bounded (type, day) partials; coarser levels compose from the
  finest by the integer semigroup, so the corpus is read once, not four
  times. Oracle = DuckDB GROUP BY GROUPING SETS.
- events_type_quantiles: EXACT per-group quantiles (q25/50/75 of value
  cents per event_type) with no global sort and no per-group gather —
  the groupwise generalization of the two-pass bucketed-count selection
  (stages/quantile.py). Oracle = quantile_cont per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _grouping_sets_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = ts // 1_000_000 // 86400
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            tab = pa.table(
                {
                    "event_type": t.column("event_type"),
                    "day": pa.array(day),
                    "cents": pa.array(cents),
                }
            )
            g = tab.group_by(["event_type", "day"]).aggregate(
                [("cents", "count"), ("cents", "sum"), ("cents", "min"),
                 ("cents", "max")]
            )
            return pa.table(
                {
                    "event_type": g.column("event_type"),
                    "day": g.column("day"),
                    "cnt": g.column("cents_count").cast(pa.int64()),
                    "sum": g.column("cents_sum").cast(pa.int64()),
                    "min": g.column("cents_min").cast(pa.int64()),
                    "max": g.column("cents_max").cast(pa.int64()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "day"]).aggregate(
                [("cnt", "sum"), ("sum", "sum"), ("min", "min"),
                 ("max", "max")]
            )
            return pa.table(
                {
                    "event_type": g.column("event_type"),
                    "day": g.column("day"),
                    "cnt": g.column("cnt_sum").cast(pa.int64()),
                    "sum": g.column("sum_sum").cast(pa.int64()),
                    "min": g.column("min_min").cast(pa.int64()),
                    "max": g.column("max_max").cast(pa.int64()),
                }
            )

        ds = read_cols(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(partial, batch_format="pyarrow")
        fine = tree_reduce_tables(list(ds.to_arrow_refs()), merge)

        # derive the coarser levels from the finest partials (semigroup)
        et = np.asarray(fine.column("event_type").to_pylist(), dtype=object)
        day = fine.column("day").to_numpy(zero_copy_only=False)
        cnt = fine.column("cnt").to_numpy(zero_copy_only=False)
        s = fine.column("sum").to_numpy(zero_copy_only=False)
        mn = fine.column("min").to_numpy(zero_copy_only=False)
        mx = fine.column("max").to_numpy(zero_copy_only=False)

        rows = {"event_type": [], "day": [], "cnt": [], "sum_cents": [],
                "min_cents": [], "max_cents": []}

        def emit(e, d, c, su, lo, hi):
            rows["event_type"].append(e)
            rows["day"].append(d)
            rows["cnt"].append(int(c))
            rows["sum_cents"].append(int(su))
            rows["min_cents"].append(int(lo))
            rows["max_cents"].append(int(hi))

        for i in range(et.size):  # level (type, day)
            emit(et[i], int(day[i]), cnt[i], s[i], mn[i], mx[i])
        for key in sorted(set(et)):  # level (type)
            m = et == key
            emit(key, -1, cnt[m].sum(), s[m].sum(), mn[m].min(),
                 mx[m].max())
        for d in sorted(set(day.tolist())):  # level (day)
            m = day == d
            emit("ALL", int(d), cnt[m].sum(), s[m].sum(), mn[m].min(),
                 mx[m].max())
        emit("ALL", -1, cnt.sum(), s.sum(), mn.min(), mx.max())  # total

        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(rows["event_type"],
                                           type=pa.string()),
                    "day": pa.array(rows["day"], type=pa.int64()),
                    "cnt": pa.array(rows["cnt"], type=pa.int64()),
                    "sum_cents": pa.array(rows["sum_cents"],
                                          type=pa.int64()),
                    "min_cents": pa.array(rows["min_cents"],
                                          type=pa.int64()),
                    "max_cents": pa.array(rows["max_cents"],
                                          type=pa.int64()),
                }
            )
        )

    sql = """
    WITH e AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 // 86400 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           CAST(COALESCE(day, -1) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM e
    GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
    """
    return q, sql


def _type_quantiles_query(qs=(0.25, 0.5, 0.75)):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.quantile import grouped_exact_quantiles

        def mk():
            def prep(t: pa.Table) -> pa.Table:
                cents = np.round(
                    t.column("value").to_numpy(zero_copy_only=False)
                    * 100.0
                ).astype(np.int64)
                return pa.table(
                    {
                        "event_type": t.column("event_type"),
                        "cents": pa.array(cents, type=pa.int64()),
                    }
                )

            return read_cols(sf_dir, "events", ["event_type", "value"]).map_batches(prep, batch_format="pyarrow")

        t = grouped_exact_quantiles(mk, "event_type", qs)
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": t.column("group"),
                    "q": t.column("q"),
                    "value": t.column("value"),
                }
            )
        )

    qlist = ", ".join(str(x) for x in qs)
    sql = f"""
    WITH c AS (
        SELECT event_type,
               CAST(round_even(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    agg AS (
        SELECT event_type, quantile_cont(cents, [{qlist}]) AS vs
        FROM c GROUP BY event_type
    )
    SELECT event_type, unnest([{qlist}]) AS q, unnest(vs) AS value
    FROM agg
    """
    return q, sql


def _gap_report_query(width: int = 8, modulus: int = 13):
    """Retention-store observability: per doc, how gappy is the sparse
    (filtered) series the gap-fill stage will densify? Emits (wmin,
    wmax, n_present, n_missing) over windows with >=1 qualifying token
    (token % modulus == 0) — the complement of gapfill_locf_w8. In-row,
    zero shuffle: the masked rollup kernel emits per-doc windows in
    ascending order, so min/max/present reduce per row segment."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat_masked
        from ..stages.rollup import _flat_tokens
        from .queries import corpus_ds

        def report(batch: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(batch)
            r = rollup_flat_masked(
                values, lengths, width, values % modulus == 0
            )
            keep = r["cnt"] > 0
            ridx = r["row_idx"][keep]
            win = r["window_id"][keep]
            if ridx.size == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], type=pa.string()),
                        "wmin": pa.array([], type=pa.int64()),
                        "wmax": pa.array([], type=pa.int64()),
                        "n_present": pa.array([], type=pa.int64()),
                        "n_missing": pa.array([], type=pa.int64()),
                    }
                )
            new = np.concatenate(([True], ridx[1:] != ridx[:-1]))
            seg = np.flatnonzero(new)
            seg_end = np.concatenate((seg[1:], [ridx.size]))
            wmin = win[seg]
            wmax = win[seg_end - 1]
            n_present = seg_end - seg
            col = batch.column("doc_id")
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            return pa.table(
                {
                    "doc_id": col.take(pa.array(ridx[seg])),
                    "wmin": pa.array(wmin),
                    "wmax": pa.array(wmax),
                    "n_present": pa.array(n_present),
                    "n_missing": pa.array(wmax - wmin + 1 - n_present),
                }
            )

        ds = corpus_ds(sf_dir).map_batches(report, batch_format="pyarrow")
        return _cast(
            ds,
            {"doc_id": pa.string(), "wmin": pa.int64(),
             "wmax": pa.int64(), "n_present": pa.int64(),
             "n_missing": pa.int64()},
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    f AS (
        SELECT doc_id, pos // {width} AS w
        FROM tok WHERE token % {modulus} = 0
    ),
    g AS (
        SELECT doc_id,
               CAST(count(DISTINCT w) AS BIGINT) AS n_present,
               CAST(min(w) AS BIGINT) AS wmin,
               CAST(max(w) AS BIGINT) AS wmax
        FROM f GROUP BY doc_id
    )
    SELECT doc_id, wmin, wmax, n_present,
           CAST(wmax - wmin + 1 - n_present AS BIGINT) AS n_missing
    FROM g
    """
    return q, sql


def _props_extract_query():
    """Semi-structured payload extraction — the ubiquitous ETL step of
    pulling a typed field out of a JSON-ish string column. Vectorized on
    both sides (pyarrow extract_regex kernel vs DuckDB regexp_extract —
    no per-row Python), then a bounded per-type aggregate."""

    def q(sf_dir: str):
        import pyarrow.compute as pc
        import ray.data as rd

        from ..stages.bucket_agg import grouped_int_rollup

        def extract(t: pa.Table) -> pa.Table:
            props = t.column("props")
            props = (props.combine_chunks()
                     if isinstance(props, pa.ChunkedArray) else props)
            m = pc.extract_regex(props, r'"k": (?P<k>\d+)')
            k = pc.struct_field(m, "k").cast(pa.int64())
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "window_id": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64)
                    ),
                    "k": k,
                }
            )

        ds = read_cols(sf_dir, "events", ["event_type", "props"]).map_batches(extract, batch_format="pyarrow")
        agg = grouped_int_rollup(
            ds, keys=["event_type", "window_id"], value_col="k",
            shuffle_partitions=4,
            aliases={"cnt": "cnt", "sum": "sum_k",
                     "min": "min_k", "max": "max_k"},
        )

        def project(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "cnt": t.column("cnt"),
                    "sum_k": t.column("sum_k"),
                    "min_k": t.column("min_k"),
                    "max_k": t.column("max_k"),
                    "mean_k": pa.array(
                        t.column("sum_k").to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        / t.column("cnt").to_numpy(zero_copy_only=False)
                    ),
                }
            )

        return _cast(
            agg.map_batches(project, batch_format="pyarrow"),
            {"event_type": pa.string(), "cnt": pa.int64(),
             "sum_k": pa.int64(), "min_k": pa.int64(),
             "max_k": pa.int64(), "mean_k": pa.float64()},
        )

    sql = """
    WITH e AS (
        SELECT event_type,
               CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(k) AS DOUBLE) / count(*) AS mean_k
    FROM e GROUP BY event_type
    """
    return q, sql


def build_wave23_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_grouping_sets_daily",) + _grouping_sets_query()))
    add(*(("events_type_quantiles",) + _type_quantiles_query()))
    add(*(("doc_gap_report_w8",) + _gap_report_query(8, 13)))
    add(*(("events_props_extract",) + _props_extract_query()))
    return queries, oracles
