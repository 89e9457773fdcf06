"""Driver-facing query suite: one entry per operator family, each with a
DuckDB oracle (ANSI SQL over the same parquet tables) where expressible.

Token derivation contract (makes every aggregate integer-exact and hence
order-insensitive/bitwise-safe): ``tokens[i] = unicode codepoint of
documents.text[i]`` — SQL side ``unicode(unnest(string_split(text,'')))``
with 0-based position ``generate_subscripts(...)-1``. cnt/sum/min/max are
int64; mean is the single f64 division sum/cnt of identical ints on both
sides; value sums over the events table use exact integer cents
(round(value*100)).

Column names/types are matched to the SQL exactly (driver hash compares
sorted-by-name columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import TierSpec
from ..corpus import tokens_from_text_batch
from ..stages.forecast import forecast_corpus
from ..stages.gapfill import gapfill_dataset
from ..stages.rollup import (
    make_filtered_rollup_fn,
    make_tier_rollup_fn,
)

DOC_COLS = ["doc_id", "text", "source"]

# SQL fragment: documents -> (doc_id, source, pos, token)
SQL_TOK = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           source,
           generate_subscripts(string_split(text, ''), 1) - 1 AS pos,
           unicode(unnest(string_split(text, ''))) AS token
    FROM documents
"""


def _num_read_blocks() -> int:
    """Single-file local testdata yields one input block -> serial stages;
    split the read so map_batches parallelizes. At real scale (many files /
    row groups) Ray's defaults already give enough blocks."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def corpus_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=DOC_COLS,
        override_num_blocks=_num_read_blocks(),
    ).map_batches(tokens_from_text_batch, batch_format="pyarrow")


def _cast(ds, schema: dict):
    """Final projection: select+cast columns to the exact oracle schema."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in schema.items():
            cols[name] = t.column(name).cast(typ)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


ROLLUP_SCHEMA = {
    "doc_id": pa.string(),
    "window_id": pa.int64(),
    "cnt": pa.int64(),
    "sum": pa.int64(),
    "min": pa.int64(),
    "max": pa.int64(),
    "mean": pa.float64(),
}


def _rollup_query(width: int):
    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        ds = corpus_ds(sf_dir).map_batches(
            make_tier_rollup_fn(tier), batch_format="pyarrow"
        )
        return _cast(ds, ROLLUP_SCHEMA)

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT doc_id,
           pos // {width} AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(token) AS BIGINT) AS "sum",
           CAST(min(token) AS BIGINT) AS "min",
           CAST(max(token) AS BIGINT) AS "max",
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok GROUP BY doc_id, window_id
    """
    return q, sql


def _filtered_rollup_query(width: int, modulus: int):
    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        ds = corpus_ds(sf_dir).map_batches(
            make_filtered_rollup_fn(tier, lambda v: v % modulus == 0),
            batch_format="pyarrow",
        )
        return _cast(ds, ROLLUP_SCHEMA)

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT doc_id,
           pos // {width} AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(token) AS BIGINT) AS "sum",
           CAST(min(token) AS BIGINT) AS "min",
           CAST(max(token) AS BIGINT) AS "max",
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok WHERE token % {modulus} = 0
    GROUP BY doc_id, window_id
    """
    return q, sql


def _gapfill_query(width: int, modulus: int):
    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        sparse = corpus_ds(sf_dir).map_batches(
            make_filtered_rollup_fn(tier, lambda v: v % modulus == 0),
            batch_format="pyarrow",
        )
        # bucketed multi-group fill: same single shuffle as the per-key
        # groupby but ~64 vectorized pandas calls instead of one per doc
        # (oracle-hash-equal to gapfill_dataset; see stages/gapfill.py)
        from ..stages.gapfill import gapfill_dataset_bucketed

        dense = gapfill_dataset_bucketed(
            sparse,
            key="doc_id",
            value_col="mean",
            start=0,
            drop_leading_nan=True,
            # test corpora are a few MB: bound the sort-shuffle task count
            shuffle_partitions=4,
        )
        return _cast(
            dense,
            {
                "doc_id": pa.string(),
                "window_id": pa.int64(),
                "mean": pa.float64(),
                "filled": pa.bool_(),
            },
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    sparse AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok WHERE token % {modulus} = 0
        GROUP BY doc_id, window_id
    ),
    grid AS (
        SELECT doc_id, unnest(generate_series(0, max(window_id))) AS window_id
        FROM sparse GROUP BY doc_id
    ),
    dense AS (
        SELECT g.doc_id, g.window_id,
               last_value(CAST(s.s AS DOUBLE) / s.cnt IGNORE NULLS)
                 OVER (PARTITION BY g.doc_id ORDER BY g.window_id) AS mean,
               (s.doc_id IS NULL) AS filled
        FROM grid g LEFT JOIN sparse s
          ON g.doc_id = s.doc_id AND g.window_id = s.window_id
    )
    SELECT doc_id, window_id, mean, filled FROM dense WHERE mean IS NOT NULL
    """
    return q, sql


def _source_rollup_query(width: int):
    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        from ..stages.source_rollup import source_window_rollup

        rollup = corpus_ds(sf_dir).map_batches(
            make_tier_rollup_fn(tier), batch_format="pyarrow"
        )
        agg = source_window_rollup(rollup)
        return _cast(
            agg,
            {
                "source": pa.string(),
                "window_id": pa.int64(),
                "cnt": pa.int64(),
                "sum": pa.int64(),
                "min": pa.int64(),
                "max": pa.int64(),
                "mean": pa.float64(),
            },
        )

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT source,
           pos // {width} AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(token) AS BIGINT) AS "sum",
           CAST(min(token) AS BIGINT) AS "min",
           CAST(max(token) AS BIGINT) AS "max",
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok GROUP BY source, window_id
    """
    return q, sql


def _source_forecast_ses_query(width: int, alpha: float = 0.5):
    """Engine composition: forecast over the AGGREGATED tier — the
    monitoring use-case (one SES level per source over its w{width}
    mean series). The series is the bounded source-rollup output
    (sources x max-doc-windows), so the per-source fold is driver-side
    scalar math; the distributed work is the tree-reduced rollup."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import source_window_rollup

        tier = (TierSpec(f"w{width}", width),)
        rollup = corpus_ds(sf_dir).map_batches(
            make_tier_rollup_fn(tier), batch_format="pyarrow"
        )
        agg = source_window_rollup(rollup, as_dataset=False)
        src = np.asarray(agg.column("source").to_pylist(), dtype=object)
        wid = agg.column("window_id").to_numpy(zero_copy_only=False)
        cnt = agg.column("cnt").to_numpy(zero_copy_only=False)
        s = agg.column("sum").to_numpy(zero_copy_only=False)
        order = np.lexsort((wid, src))
        src, wid, cnt, s = src[order], wid[order], cnt[order], s[order]
        a, b = alpha, 1.0 - alpha
        out = {"source": [], "n": [], "yhat": []}
        i = 0
        while i < src.size:
            j = i
            level = None
            while j < src.size and src[j] == src[i]:
                m = float(s[j]) / float(cnt[j])  # == CAST(sum)/count
                level = m if level is None else a * m + b * level
                j += 1
            if j - i >= 4:
                out["source"].append(src[i])
                out["n"].append(j - i)
                out["yhat"].append(level)
            i = j
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "n": pa.array(out["n"], type=pa.int64()),
                    "yhat": pa.array(out["yhat"], type=pa.float64()),
                }
            )
        )

    a, b = alpha, 1.0 - alpha
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT source, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY source, wid
    ),
    l AS (
        SELECT source, list(m ORDER BY wid) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY source HAVING count(*) >= 4
    )
    SELECT source, n,
           list_reduce(ms, (acc, x) -> {a} * x + {b} * acc) AS yhat
    FROM l
    """
    return q, sql


def _source_doc_stats_query():
    def q(sf_dir: str):
        from ..stages.source_rollup import source_doc_stats

        return _cast(
            source_doc_stats(corpus_ds(sf_dir)),
            {
                "source": pa.string(),
                "cnt_docs": pa.int64(),
                "sum_n_tok": pa.int64(),
                "min_n_tok": pa.int64(),
                "max_n_tok": pa.int64(),
                "mean_n_tok": pa.float64(),
            },
        )

    sql = """
    SELECT source,
           CAST(count(*) AS BIGINT) AS cnt_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_n_tok,
           CAST(min(length(text)) AS BIGINT) AS min_n_tok,
           CAST(max(length(text)) AS BIGINT) AS max_n_tok,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS mean_n_tok
    FROM documents GROUP BY source
    """
    return q, sql


FORECAST_SCHEMA = {
    "doc_id": pa.string(),
    "model": pa.string(),
    "h": pa.int32(),
    "yhat": pa.float64(),
}


def _forecast_query(width: int, model_name: str, model_kw: dict, horizon: int):
    from ..config import EngineConfig

    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        cfg = EngineConfig(
            tiers=tier, forecast_horizon=horizon,
            chunk_stride_windows=10**6, forecast_concurrency=8,
        )
        fc = forecast_corpus(
            corpus_ds(sf_dir), cfg, models=((model_name, model_kw),)
        )
        return _cast(fc, FORECAST_SCHEMA)

    return q


def _forecast_naive_query(width: int):
    q = _forecast_query(width, "naive", {}, 1)
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    )
    SELECT doc_id, 'naive' AS model, CAST(1 AS INTEGER) AS h,
           arg_max(m, wid) AS yhat
    FROM w GROUP BY doc_id HAVING count(*) >= 4
    """
    return q, sql


def _forecast_snaive_query(width: int, period: int = 4):
    q = _forecast_query(width, "seasonal_naive", {"period": period}, period)
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(m ORDER BY wid) AS ms, count(*) AS n
        FROM w GROUP BY doc_id HAVING count(*) >= {period}
    )
    SELECT doc_id, 'seasonal_naive' AS model, CAST(hh.h AS INTEGER) AS h,
           ms[CAST(n - {period} + ((hh.h - 1) % {period}) + 1 AS INTEGER)] AS yhat
    FROM l CROSS JOIN (SELECT unnest(generate_series(1, {period})) AS h) hh
    """
    return q, sql


def _forecast_ses_query(width: int, alpha: float = 0.5):
    q = _forecast_query(width, "ses", {"alpha": alpha}, 1)
    a, b = alpha, 1.0 - alpha
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(m ORDER BY wid) AS ms
        FROM w GROUP BY doc_id HAVING count(*) >= 4
    )
    SELECT doc_id, 'ses' AS model, CAST(1 AS INTEGER) AS h,
           list_reduce(ms, (acc, x) -> {a} * x + {b} * acc) AS yhat
    FROM l
    """
    return q, sql


def _series_list_sql(width: int, min_points: int = 4) -> str:
    """Shared CTE body: per-doc ordered list of w{width} window means.
    Ends with table ``l(doc_id, ms, n)``."""
    return f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    l AS (
        SELECT doc_id, list(m ORDER BY wid) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY doc_id HAVING count(*) >= {min_points}
    )"""


def _forecast_theta_query(width: int, alpha: float = 0.1, theta: float = 2.0):
    """Standard Theta (period=0 -> no decomposition) h=1 forecast.

    yhat = ses_level + (1 - 1/theta) * b * (1/alpha + 1 - 1) where b is
    the OLS slope on 0-indexed x. The kernel computes every float sum as a
    SEQUENTIAL fold (kernels/theta.py), so the DuckDB list_reduce folds
    below are bitwise-identical.
    """
    q = _forecast_query(width, "theta", {}, 1)
    a = alpha
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, (acc, x) -> acc + x) / n AS ym,
               (n - 1) / 2.0e0 AS xm
        FROM l
    ),
    ols AS (
        SELECT doc_id, ms,
               list_reduce(list_transform(generate_series(1, n),
                   i -> (CAST(i - 1 AS DOUBLE) - xm) * (ms[i] - ym)),
                   (acc, x) -> acc + x) AS ss_xy,
               list_reduce(list_transform(generate_series(1, n),
                   i -> (CAST(i - 1 AS DOUBLE) - xm) * (CAST(i - 1 AS DOUBLE) - xm)),
                   (acc, x) -> acc + x) AS ss_xx
        FROM st
    )
    SELECT doc_id, 'theta' AS model, CAST(1 AS INTEGER) AS h,
           list_reduce(ms, (acc, x) -> {a}e0 * x + (1.0e0 - {a}e0) * acc)
           + (1.0e0 - 1.0e0 / {theta}e0)
             * (CASE WHEN ss_xx > 0 THEN ss_xy / ss_xx ELSE 0.0e0 END)
             * (1.0e0 / {a}e0 + 1.0e0 - 1.0e0) AS yhat
    FROM ols
    """
    return q, sql


def _forecast_ets_fixed_query(width: int, alpha: float = 0.3,
                              beta: float = 0.1, period: int = 12):
    """ETS(A,A,N) with FIXED smoothing params (optimize=False): heuristic
    init by OLS on the first min(n, max(10, 2*period)) points, then the
    Holt recursion — a struct-accumulator list_reduce in SQL. Sequential
    kernel folds (kernels/smoothing._ets_initial_state) make it bitwise.
    """
    q = _forecast_query(
        width, "ets",
        {"spec": "AAN", "optimize": False, "alpha": alpha, "beta": beta,
         "period": period},
        1,
    )
    a, b = alpha, beta
    maxn = f"LEAST(n, {max(10, 2 * period)})"
    sql = f"""
    {_series_list_sql(width)},
    init AS (
        SELECT doc_id, ms, n, {maxn} AS mn,
               ({maxn} + 1) / 2.0e0 AS xm,
               list_reduce(ms[1:{maxn}], (acc, x) -> acc + x) / {maxn} AS ym
        FROM l
    ),
    ols AS (
        SELECT doc_id, ms, ym, xm,
               list_reduce(list_transform(generate_series(1, mn),
                   i -> (CAST(i AS DOUBLE) - xm) * (ms[i] - ym)),
                   (acc, x) -> acc + x) AS ss_xy,
               list_reduce(list_transform(generate_series(1, mn),
                   i -> (CAST(i AS DOUBLE) - xm) * (CAST(i AS DOUBLE) - xm)),
                   (acc, x) -> acc + x) AS ss_xx
        FROM init
    ),
    state AS (
        -- accumulator is a 2-list [level, trend]; a struct accumulator
        -- hits a DuckDB 1.0 lambda-CSE bug (second field evaluated with a
        -- stale acc), lists fold correctly
        SELECT doc_id,
               list_reduce(
                   list_prepend(
                       [ym - (CASE WHEN ss_xx > 0 THEN ss_xy / ss_xx
                                   ELSE 0.0e0 END) * xm,
                        CASE WHEN ss_xx > 0 THEN ss_xy / ss_xx
                             ELSE 0.0e0 END],
                       list_transform(ms, v -> [v, 0.0e0])),
                   (acc, e) -> [
                       {a}e0 * e[1] + (1.0e0 - {a}e0) * (acc[1] + acc[2]),
                       {b}e0 * (({a}e0 * e[1] + (1.0e0 - {a}e0)
                                 * (acc[1] + acc[2])) - acc[1])
                       + (1.0e0 - {b}e0) * acc[2]]
               ) AS fin
        FROM ols
    )
    SELECT doc_id, 'ets' AS model, CAST(1 AS INTEGER) AS h,
           fin[1] + CAST(1 AS DOUBLE) * fin[2] AS yhat
    FROM state
    """
    return q, sql


def _events_minute_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.bucket_agg import grouped_int_rollup

        def prep(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            minute = ts // 60_000_000
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "window_id": pa.array(minute),
                    "cents": pa.array(cents),
                }
            )

        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "event_type", "value"],
            override_num_blocks=_num_read_blocks(),
        ).map_batches(prep, batch_format="pyarrow")
        # vectorized Arrow partials + bucket combine instead of Ray's
        # Aggregate operator (which burned ~25s of task CPU here)
        agg = grouped_int_rollup(
            ds, keys=["event_type", "window_id"], value_col="cents",
            shuffle_partitions=4,
            aliases={"cnt": "cnt", "sum": "sum_cents",
                     "min": "min_cents", "max": "max_cents"},
        )
        return _cast(
            agg,
            {
                "event_type": pa.string(),
                "window_id": pa.int64(),
                "cnt": pa.int64(),
                "sum_cents": pa.int64(),
                "min_cents": pa.int64(),
                "max_cents": pa.int64(),
            },
        )

    sql = """
    SELECT event_type,
           CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60 AS window_id,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events GROUP BY event_type, window_id
    """
    return q, sql


def _events_user_gapfill_query():
    def q(sf_dir: str):
        import ray.data as rd

        def prep(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            hour = ts // 3_600_000_000
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    "window_id": pa.array(hour),
                    "cents": pa.array(cents),
                }
            )

        from ..stages.gapfill import events_user_gapfill_fused

        # fused single-shuffle path: per-block partial (user, hour)
        # integer combine -> hash-bucket exchange -> final combine +
        # vectorized multi-group LOCF (reference fill_gaps first..last
        # semantics)
        dense = events_user_gapfill_fused(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["ts", "user_id", "value"],
                override_num_blocks=_num_read_blocks(),
            ).map_batches(prep, batch_format="pyarrow"),
            shuffle_partitions=4,
        )
        return _cast(
            dense,
            {
                "user_id": pa.int64(),
                "window_id": pa.int64(),
                "mean_cents": pa.float64(),
                "filled": pa.bool_(),
            },
        )

    sql = """
    WITH e AS (
        SELECT user_id,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS window_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    sparse AS (
        SELECT user_id, window_id,
               CAST(count(*) AS BIGINT) AS cnt, CAST(sum(cents) AS BIGINT) AS s
        FROM e GROUP BY user_id, window_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(min(window_id), max(window_id))) AS window_id
        FROM sparse GROUP BY user_id
    )
    SELECT g.user_id, g.window_id,
           last_value(CAST(s.s AS DOUBLE) / s.cnt IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.window_id) AS mean_cents,
           (s.user_id IS NULL) AS filled
    FROM grid g LEFT JOIN sparse s
      ON g.user_id = s.user_id AND g.window_id = s.window_id
    """
    return q, sql


def _lineitem_pricing_query():
    def q(sf_dir: str):
        import ray.data as rd
        from ray.data.aggregate import Count, Sum

        def prep(t: pa.Table) -> pa.Table:
            cents = np.round(
                t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": t.column("l_returnflag"),
                    "l_linestatus": t.column("l_linestatus"),
                    "l_quantity": t.column("l_quantity"),
                    "price_cents": pa.array(cents),
                }
            )

        ds = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            ],
            override_num_blocks=_num_read_blocks(),
        ).map_batches(prep, batch_format="pyarrow")
        agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="cnt"),
        )
        return _cast(
            agg,
            {
                "l_returnflag": pa.string(),
                "l_linestatus": pa.string(),
                "sum_qty": pa.float64(),
                "sum_price_cents": pa.int64(),
                "cnt": pa.int64(),
            },
        )

    sql = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """
    return q, sql


def _dedup_exact_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.dedup import exact_dedup

        ds = exact_dedup(
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"],
                            override_num_blocks=_num_read_blocks())
        )
        return _cast(
            ds,
            {"doc_id": pa.int64(), "keep": pa.bool_(), "dup_count": pa.int64()},
        )

    sql = """
    SELECT doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY text) AS keep,
           CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS dup_count
    FROM documents
    """
    return q, sql


def _text_stats_query():
    def q(sf_dir: str):
        def stats(t: pa.Table) -> pa.Table:
            from ..corpus import _codepoints

            texts = t.column("text").to_pylist()
            flat, lengths = _codepoints([x or "" for x in texts])
            starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
            idx = np.concatenate((starts, [flat.size]))
            alpha = (
                ((flat >= 97) & (flat <= 122)) | ((flat >= 65) & (flat <= 90))
            ).astype(np.int64)
            digit = ((flat >= 48) & (flat <= 57)).astype(np.int64)
            space = (flat == 32).astype(np.int64)

            def seg_sum(x):
                out = np.add.reduceat(x, starts) if flat.size else np.zeros(
                    len(texts), dtype=np.int64
                )
                out[lengths == 0] = 0
                return out

            n_alpha = seg_sum(alpha)
            n_digit = seg_sum(digit)
            n_space = seg_sum(space)
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.string()),
                    "n_tok": pa.array(lengths.astype(np.int64)),
                    "n_alpha": pa.array(n_alpha),
                    "n_digit": pa.array(n_digit),
                    "n_ws_tokens": pa.array(n_space + 1),
                    "alpha_ratio": pa.array(
                        n_alpha.astype(np.float64) / lengths
                    ),
                }
            )

        return corpus_docs(sf_dir).map_batches(stats, batch_format="pyarrow")

    sql = """
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               unicode(unnest(string_split(text, ''))) AS token
        FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN (token BETWEEN 97 AND 122)
                           OR (token BETWEEN 65 AND 90)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
           CAST(sum(CASE WHEN token BETWEEN 48 AND 57
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_digit,
           CAST(sum(CASE WHEN token = 32 THEN 1 ELSE 0 END) + 1 AS BIGINT)
             AS n_ws_tokens,
           CAST(sum(CASE WHEN (token BETWEEN 97 AND 122)
                           OR (token BETWEEN 65 AND 90)
                    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS alpha_ratio
    FROM tok GROUP BY doc_id
    """
    return q, sql


def corpus_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=DOC_COLS,
        override_num_blocks=_num_read_blocks(),
    )


def build_queries():
    """Returns (queries: dict[name, callable], oracles: dict[name, sql]).

    Names without an oracle entry get the driver's rows-only check.
    """
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    for width in (8, 32, 128):
        q, sql = _rollup_query(width)
        add(f"rollup_w{width}", q, sql)
    add(*(("filtered_rollup_w8",) + _filtered_rollup_query(8, 7)))
    add(*(("gapfill_locf_w8",) + _gapfill_query(8, 13)))
    # fused in-row variant: same oracle SQL, no shuffle
    _, gap_sql = _gapfill_query(8, 13)

    def gapfill_inrow(sf_dir: str):
        from ..stages.gapfill import make_filtered_gapfill_fn

        ds = corpus_ds(sf_dir).map_batches(
            make_filtered_gapfill_fn(8, lambda v: v % 13 == 0),
            batch_format="pyarrow",
        )
        return _cast(
            ds,
            {
                "doc_id": pa.string(),
                "window_id": pa.int64(),
                "mean": pa.float64(),
                "filled": pa.bool_(),
            },
        )

    add("gapfill_locf_w8_inrow", gapfill_inrow, gap_sql)

    # retention compaction: derive w32 from the w8 rollup WITHOUT raw
    # tokens (raw can be expired); oracle = the direct w32 rollup SQL —
    # proves fine->coarse composition is bitwise-lossless
    _, w32_sql = _rollup_query(32)

    def compact_q(sf_dir: str):
        from ..stages.rollup import make_compact_fn, make_tier_rollup_fn

        fine = (TierSpec("w8", 8),)
        ds = (
            corpus_ds(sf_dir)
            .map_batches(make_tier_rollup_fn(fine), batch_format="pyarrow")
            .map_batches(make_compact_fn(4, "w32"), batch_format="pyarrow")
        )
        return _cast(ds, ROLLUP_SCHEMA)

    add("rollup_compact_w32", compact_q, w32_sql)
    add(*(("source_rollup_w32",) + _source_rollup_query(32)))
    add(*(("source_forecast_ses_w32",) + _source_forecast_ses_query(32)))
    add(*(("source_doc_stats",) + _source_doc_stats_query()))
    add(*(("forecast_naive_w8",) + _forecast_naive_query(8)))
    add(*(("forecast_seasonal_naive_w8",) + _forecast_snaive_query(8)))
    add(*(("forecast_ses_w8",) + _forecast_ses_query(8)))
    add(*(("events_minute_rollup",) + _events_minute_query()))
    add(*(("events_user_gapfill",) + _events_user_gapfill_query()))
    add(*(("lineitem_pricing",) + _lineitem_pricing_query()))
    add(*(("dedup_exact",) + _dedup_exact_query()))
    add(*(("text_stats",) + _text_stats_query()))

    add(*(("forecast_theta_w8",) + _forecast_theta_query(8)))
    add(*(("forecast_ets_aan_w8",) + _forecast_ets_fixed_query(8)))
    add(*(("gorilla_roundtrip_w8",) + _gorilla_roundtrip_query(8)))

    from .queries_detect import build_detect_queries
    from .queries_ext import build_ext_queries

    q2, o2 = build_ext_queries()
    queries.update(q2)
    oracles.update(o2)
    q3, o3 = build_detect_queries()
    queries.update(q3)
    oracles.update(o3)
    from .queries_sort import build_sort_queries

    q4, o4 = build_sort_queries()
    queries.update(q4)
    oracles.update(o4)
    from .queries_wave4 import build_wave4_queries

    q5, o5 = build_wave4_queries()
    queries.update(q5)
    oracles.update(o5)
    from .queries_wave5 import build_wave5_queries

    q6, o6 = build_wave5_queries()
    queries.update(q6)
    oracles.update(o6)
    from .queries_wave6 import build_wave6_queries

    q7, o7 = build_wave6_queries()
    queries.update(q7)
    oracles.update(o7)
    from .queries_wave7 import build_wave7_queries

    q8, o8 = build_wave7_queries()
    queries.update(q8)
    oracles.update(o8)
    from .queries_wave8 import build_wave8_queries

    q9, o9 = build_wave8_queries()
    queries.update(q9)
    oracles.update(o9)
    from .queries_wave9 import build_wave9_queries

    q10, o10 = build_wave9_queries()
    queries.update(q10)
    oracles.update(o10)
    from .queries_wave10 import build_wave10_queries

    q11, o11 = build_wave10_queries()
    queries.update(q11)
    oracles.update(o11)
    from .queries_wave11 import build_wave11_queries

    q12, o12 = build_wave11_queries()
    queries.update(q12)
    oracles.update(o12)
    from .queries_wave12 import build_wave12_queries

    q13, o13 = build_wave12_queries()
    queries.update(q13)
    oracles.update(o13)
    from .queries_wave13 import build_wave13_queries

    q14, o14 = build_wave13_queries()
    queries.update(q14)
    oracles.update(o14)
    from .queries_wave14 import build_wave14_queries

    q15, o15 = build_wave14_queries()
    queries.update(q15)
    oracles.update(o15)
    from .queries_wave15 import build_wave15_queries

    q16, o16 = build_wave15_queries()
    queries.update(q16)
    oracles.update(o16)
    from .queries_wave16 import build_wave16_queries

    q17, o17 = build_wave16_queries()
    queries.update(q17)
    oracles.update(o17)
    from .queries_wave17 import build_wave17_queries

    q18, o18 = build_wave17_queries()
    queries.update(q18)
    oracles.update(o18)
    from .queries_wave18 import build_wave18_queries

    q19, o19 = build_wave18_queries()
    queries.update(q19)
    oracles.update(o19)
    from .queries_wave19 import build_wave19_queries

    q20, o20 = build_wave19_queries()
    queries.update(q20)
    oracles.update(o20)
    from .queries_wave20 import build_wave20_queries

    q21, o21 = build_wave20_queries()
    queries.update(q21)
    oracles.update(o21)
    from .queries_wave21 import build_wave21_queries

    q22, o22 = build_wave21_queries()
    queries.update(q22)
    oracles.update(o22)
    from .queries_wave22 import build_wave22_queries

    q23, o23 = build_wave22_queries()
    queries.update(q23)
    oracles.update(o23)
    from .queries_wave23 import build_wave23_queries

    q24, o24 = build_wave23_queries()
    queries.update(q24)
    oracles.update(o24)
    from .queries_wave24 import build_wave24_queries

    q25, o25 = build_wave24_queries()
    queries.update(q25)
    oracles.update(o25)
    from .queries_wave25 import build_wave25_queries

    q26, o26 = build_wave25_queries()
    queries.update(q26)
    oracles.update(o26)
    from .queries_wave26 import build_wave26_queries

    q27, o27 = build_wave26_queries()
    queries.update(q27)
    oracles.update(o27)
    from .queries_wave27 import build_wave27_queries

    q28, o28 = build_wave27_queries()
    queries.update(q28)
    oracles.update(o28)
    from .queries_wave28 import build_wave28_queries

    q29, o29 = build_wave28_queries()
    queries.update(q29)
    oracles.update(o29)
    from .queries_wave29 import build_wave29_queries

    q30, o30 = build_wave29_queries()
    queries.update(q30)
    oracles.update(o30)
    from .queries_wave30 import build_wave30_queries

    q31, o31 = build_wave30_queries()
    queries.update(q31)
    oracles.update(o31)
    from .queries_wave31 import build_wave31_queries

    q32, o32 = build_wave31_queries()
    queries.update(q32)
    oracles.update(o32)
    from .queries_wave32 import build_wave32_queries

    q33, o33 = build_wave32_queries()
    queries.update(q33)
    oracles.update(o33)
    from .queries_wave33 import build_wave33_queries

    q34, o34 = build_wave33_queries()
    queries.update(q34)
    oracles.update(o34)
    from .queries_wave34 import build_wave34_queries

    q35, o35 = build_wave34_queries()
    queries.update(q35)
    oracles.update(o35)
    from .queries_wave35 import build_wave35_queries

    q36, o36 = build_wave35_queries()
    queries.update(q36)
    oracles.update(o36)
    from .queries_wave36 import build_wave36_queries

    q37, o37 = build_wave36_queries()
    queries.update(q37)
    oracles.update(o37)
    from .queries_wave37 import build_wave37_queries

    q38, o38 = build_wave37_queries()
    queries.update(q38)
    oracles.update(o38)
    from .queries_wave38 import build_wave38_queries

    q39, o39 = build_wave38_queries()
    queries.update(q39)
    oracles.update(o39)
    from .queries_wave39 import build_wave39_queries

    q40, o40 = build_wave39_queries()
    queries.update(q40)
    oracles.update(o40)
    from .queries_wave40 import build_wave40_queries

    q41, o41 = build_wave40_queries()
    queries.update(q41)
    oracles.update(o41)
    from .queries_wave41 import build_wave41_queries

    q42, o42 = build_wave41_queries()
    queries.update(q42)
    oracles.update(o42)
    from .queries_wave42 import build_wave42_queries

    q43, o43 = build_wave42_queries()
    queries.update(q43)
    oracles.update(o43)
    from .queries_wave43 import build_wave43_queries

    q44, o44 = build_wave43_queries()
    queries.update(q44)
    oracles.update(o44)
    from .queries_wave44 import build_wave44_queries

    q45, o45 = build_wave44_queries()
    queries.update(q45)
    oracles.update(o45)
    from .queries_wave45 import build_wave45_queries

    q46, o46 = build_wave45_queries()
    queries.update(q46)
    oracles.update(o46)
    from .queries_wave46 import build_wave46_queries

    q47, o47 = build_wave46_queries()
    queries.update(q47)
    oracles.update(o47)
    from .queries_wave47 import build_wave47_queries

    q48, o48 = build_wave47_queries()
    queries.update(q48)
    oracles.update(o48)
    from .queries_wave48 import build_wave48_queries

    q49, o49 = build_wave48_queries()
    queries.update(q49)
    oracles.update(o49)
    from .queries_wave49 import build_wave49_queries

    q50, o50 = build_wave49_queries()
    queries.update(q50)
    oracles.update(o50)
    from .queries_wave50 import build_wave50_queries

    q51, o51 = build_wave50_queries()
    queries.update(q51)
    oracles.update(o51)
    from .queries_wave51 import build_wave51_queries

    q52, o52 = build_wave51_queries()
    queries.update(q52)
    oracles.update(o52)
    from .queries_wave52 import build_wave52_queries

    q53, o53 = build_wave52_queries()
    queries.update(q53)
    oracles.update(o53)
    from .queries_wave53 import build_wave53_queries

    q54, o54 = build_wave53_queries()
    queries.update(q54)
    oracles.update(o54)
    from .queries_wave54 import build_wave54_queries

    q55, o55 = build_wave54_queries()
    queries.update(q55)
    oracles.update(o55)
    from .queries_wave55 import build_wave55_queries

    q56, o56 = build_wave55_queries()
    queries.update(q56)
    oracles.update(o56)
    from .queries_wave56 import build_wave56_queries

    q57, o57 = build_wave56_queries()
    queries.update(q57)
    oracles.update(o57)
    from .queries_wave57 import build_wave57_queries

    q58, o58 = build_wave57_queries()
    queries.update(q58)
    oracles.update(o58)
    from .queries_wave58 import build_wave58_queries

    q59, o59 = build_wave58_queries()
    queries.update(q59)
    oracles.update(o59)
    from .queries_wave59 import build_wave59_queries

    q60, o60 = build_wave59_queries()
    queries.update(q60)
    oracles.update(o60)
    from .queries_wave60 import build_wave60_queries

    q61, o61 = build_wave60_queries()
    queries.update(q61)
    oracles.update(o61)
    from .queries_wave61 import build_wave61_queries

    q62, o62 = build_wave61_queries()
    queries.update(q62)
    oracles.update(o62)
    from .queries_wave62 import build_wave62_queries

    q63, o63 = build_wave62_queries()
    queries.update(q63)
    oracles.update(o63)
    from .queries_wave63 import build_wave63_queries

    q64, o64 = build_wave63_queries()
    queries.update(q64)
    oracles.update(o64)
    from .queries_wave64 import build_wave64_queries

    q65, o65 = build_wave64_queries()
    queries.update(q65)
    oracles.update(o65)
    from .queries_wave65 import build_wave65_queries

    q66, o66 = build_wave65_queries()
    queries.update(q66)
    oracles.update(o66)
    from .queries_wave66 import build_wave66_queries

    q67, o67 = build_wave66_queries()
    queries.update(q67)
    oracles.update(o67)
    from .queries_wave67 import build_wave67_queries

    q68, o68 = build_wave67_queries()
    queries.update(q68)
    oracles.update(o68)
    from .queries_wave68 import build_wave68_queries

    q69, o69 = build_wave68_queries()
    queries.update(q69)
    oracles.update(o69)
    from .queries_wave69 import build_wave69_queries

    q70, o70 = build_wave69_queries()
    queries.update(q70)
    oracles.update(o70)
    from .queries_wave70 import build_wave70_queries

    q71, o71 = build_wave70_queries()
    queries.update(q71)
    oracles.update(o71)
    from .queries_wave71 import build_wave71_queries

    q72, o72 = build_wave71_queries()
    queries.update(q72)
    oracles.update(o72)
    from .queries_wave72 import build_wave72_queries

    q73, o73 = build_wave72_queries()
    queries.update(q73)
    oracles.update(o73)
    from .queries_wave73 import build_wave73_queries

    q74, o74 = build_wave73_queries()
    queries.update(q74)
    oracles.update(o74)
    from .queries_wave74 import build_wave74_queries

    q75, o75 = build_wave74_queries()
    queries.update(q75)
    oracles.update(o75)
    from .queries_wave75 import build_wave75_queries

    q76, o76 = build_wave75_queries()
    queries.update(q76)
    oracles.update(o76)
    from .queries_wave76 import build_wave76_queries

    q77, o77 = build_wave76_queries()
    queries.update(q77)
    oracles.update(o77)
    from .queries_wave77 import build_wave77_queries

    q78, o78 = build_wave77_queries()
    queries.update(q78)
    oracles.update(o78)
    from .queries_wave78 import build_wave78_queries

    q79, o79 = build_wave78_queries()
    queries.update(q79)
    oracles.update(o79)
    from .queries_wave79 import build_wave79_queries

    q80, o80 = build_wave79_queries()
    queries.update(q80)
    oracles.update(o80)
    from .queries_wave80 import build_wave80_queries

    q81, o81 = build_wave80_queries()
    queries.update(q81)
    oracles.update(o81)
    from .queries_wave81 import build_wave81_queries

    q82, o82 = build_wave81_queries()
    queries.update(q82)
    oracles.update(o82)
    from .queries_wave82 import build_wave82_queries

    q83, o83 = build_wave82_queries()
    queries.update(q83)
    oracles.update(o83)
    from .queries_wave83 import build_wave83_queries

    q84, o84 = build_wave83_queries()
    queries.update(q84)
    oracles.update(o84)
    from .queries_wave84 import build_wave84_queries

    q85, o85 = build_wave84_queries()
    queries.update(q85)
    oracles.update(o85)
    from .queries_wave85 import build_wave85_queries

    q86, o86 = build_wave85_queries()
    queries.update(q86)
    oracles.update(o86)
    from .queries_wave86 import build_wave86_queries

    q87, o87 = build_wave86_queries()
    queries.update(q87)
    oracles.update(o87)
    from .queries_wave87 import build_wave87_queries

    q88, o88 = build_wave87_queries()
    queries.update(q88)
    oracles.update(o88)
    from .queries_wave88 import build_wave88_queries

    q89, o89 = build_wave88_queries()
    queries.update(q89)
    oracles.update(o89)
    from .queries_wave89 import build_wave89_queries

    q90, o90 = build_wave89_queries()
    queries.update(q90)
    oracles.update(o90)
    from .queries_wave90 import build_wave90_queries

    q91, o91 = build_wave90_queries()
    queries.update(q91)
    oracles.update(o91)
    from .queries_wave91 import build_wave91_queries

    q92, o92 = build_wave91_queries()
    queries.update(q92)
    oracles.update(o92)
    from .queries_wave92 import build_wave92_queries

    q93, o93 = build_wave92_queries()
    queries.update(q93)
    oracles.update(o93)
    from .queries_wave93 import build_wave93_queries

    q94, o94 = build_wave93_queries()
    queries.update(q94)
    oracles.update(o94)
    from .queries_wave94 import build_wave94_queries

    q95, o95 = build_wave94_queries()
    queries.update(q95)
    oracles.update(o95)
    from .queries_wave95 import build_wave95_queries

    q96, o96 = build_wave95_queries()
    queries.update(q96)
    oracles.update(o96)
    from .queries_wave96 import build_wave96_queries

    q97, o97 = build_wave96_queries()
    queries.update(q97)
    oracles.update(o97)
    from .queries_wave97 import build_wave97_queries

    q98, o98 = build_wave97_queries()
    queries.update(q98)
    oracles.update(o98)
    from .queries_wave98 import build_wave98_queries

    q99, o99 = build_wave98_queries()
    queries.update(q99)
    oracles.update(o99)
    from .queries_wave99 import build_wave99_queries

    q100, o100 = build_wave99_queries()
    queries.update(q100)
    oracles.update(o100)
    from .queries_wave100 import build_wave100_queries

    q101, o101 = build_wave100_queries()
    queries.update(q101)
    oracles.update(o101)
    from .queries_wave101 import build_wave101_queries

    q102, o102 = build_wave101_queries()
    queries.update(q102)
    oracles.update(o102)
    from .queries_wave102 import build_wave102_queries

    q103, o103 = build_wave102_queries()
    queries.update(q103)
    oracles.update(o103)
    from .queries_wave103 import build_wave103_queries

    q104, o104 = build_wave103_queries()
    queries.update(q104)
    oracles.update(o104)
    from .queries_wave104 import build_wave104_queries

    q105, o105 = build_wave104_queries()
    queries.update(q105)
    oracles.update(o105)
    from .queries_wave105 import build_wave105_queries

    q106, o106 = build_wave105_queries()
    queries.update(q106)
    oracles.update(o106)
    from .queries_wave106 import build_wave106_queries

    q107, o107 = build_wave106_queries()
    queries.update(q107)
    oracles.update(o107)
    from .queries_wave107 import build_wave107_queries

    q108, o108 = build_wave107_queries()
    queries.update(q108)
    oracles.update(o108)
    from .queries_wave108 import build_wave108_queries

    q109, o109 = build_wave108_queries()
    queries.update(q109)
    oracles.update(o109)
    from .queries_wave109 import build_wave109_queries

    q110, o110 = build_wave109_queries()
    queries.update(q110)
    oracles.update(o110)
    from .queries_wave110 import build_wave110_queries

    q111, o111 = build_wave110_queries()
    queries.update(q111)
    oracles.update(o111)
    from .queries_wave111 import build_wave111_queries

    q112, o112 = build_wave111_queries()
    queries.update(q112)
    oracles.update(o112)
    from .queries_wave112 import build_wave112_queries

    q113, o113 = build_wave112_queries()
    queries.update(q113)
    oracles.update(o113)
    from .queries_wave113 import build_wave113_queries

    q114, o114 = build_wave113_queries()
    queries.update(q114)
    oracles.update(o114)
    from .queries_wave114 import build_wave114_queries

    q115, o115 = build_wave114_queries()
    queries.update(q115)
    oracles.update(o115)
    from .queries_wave115 import build_wave115_queries

    q116, o116 = build_wave115_queries()
    queries.update(q116)
    oracles.update(o116)
    from .queries_wave116 import build_wave116_queries

    q117, o117 = build_wave116_queries()
    queries.update(q117)
    oracles.update(o117)
    from .queries_wave117 import build_wave117_queries

    q118, o118 = build_wave117_queries()
    queries.update(q118)
    oracles.update(o118)
    from .queries_wave118 import build_wave118_queries

    q119, o119 = build_wave118_queries()
    queries.update(q119)
    oracles.update(o119)
    from .queries_wave119 import build_wave119_queries

    q120, o120 = build_wave119_queries()
    queries.update(q120)
    oracles.update(o120)
    from .queries_wave120 import build_wave120_queries

    q121, o121 = build_wave120_queries()
    queries.update(q121)
    oracles.update(o121)
    from .queries_wave121 import build_wave121_queries

    q122, o122 = build_wave121_queries()
    queries.update(q122)
    oracles.update(o122)
    from .queries_wave122 import build_wave122_queries

    q123, o123 = build_wave122_queries()
    queries.update(q123)
    oracles.update(o123)
    from .queries_wave123 import build_wave123_queries

    q124, o124 = build_wave123_queries()
    queries.update(q124)
    oracles.update(o124)
    from .queries_wave124 import build_wave124_queries

    q125, o125 = build_wave124_queries()
    queries.update(q125)
    oracles.update(o125)
    from .queries_wave125 import build_wave125_queries

    q126, o126 = build_wave125_queries()
    queries.update(q126)
    oracles.update(o126)
    from .queries_wave126 import build_wave126_queries

    q127, o127 = build_wave126_queries()
    queries.update(q127)
    oracles.update(o127)
    from .queries_wave127 import build_wave127_queries

    q128, o128 = build_wave127_queries()
    queries.update(q128)
    oracles.update(o128)
    from .queries_wave128 import build_wave128_queries

    q129, o129 = build_wave128_queries()
    queries.update(q129)
    oracles.update(o129)
    from .queries_wave129 import build_wave129_queries

    q130, o130 = build_wave129_queries()
    queries.update(q130)
    oracles.update(o130)
    from .queries_wave130 import build_wave130_queries

    q131, o131 = build_wave130_queries()
    queries.update(q131)
    oracles.update(o131)
    from .queries_wave131 import build_wave131_queries

    q132, o132 = build_wave131_queries()
    queries.update(q132)
    oracles.update(o132)
    from .queries_wave132 import build_wave132_queries

    q133, o133 = build_wave132_queries()
    queries.update(q133)
    oracles.update(o133)
    from .queries_wave133 import build_wave133_queries

    q134, o134 = build_wave133_queries()
    queries.update(q134)
    oracles.update(o134)
    from .queries_wave134 import build_wave134_queries

    q135, o135 = build_wave134_queries()
    queries.update(q135)
    oracles.update(o135)
    from .queries_wave135 import build_wave135_queries

    q136, o136 = build_wave135_queries()
    queries.update(q136)
    oracles.update(o136)
    from .queries_wave136 import build_wave136_queries

    q137, o137 = build_wave136_queries()
    queries.update(q137)
    oracles.update(o137)
    from .queries_wave137 import build_wave137_queries

    q138, o138 = build_wave137_queries()
    queries.update(q138)
    oracles.update(o138)
    from .queries_wave138 import build_wave138_queries

    q139, o139 = build_wave138_queries()
    queries.update(q139)
    oracles.update(o139)
    from .queries_wave139 import build_wave139_queries

    q140, o140 = build_wave139_queries()
    queries.update(q140)
    oracles.update(o140)
    from .queries_wave140 import build_wave140_queries

    q141, o141 = build_wave140_queries()
    queries.update(q141)
    oracles.update(o141)
    from .queries_wave141 import build_wave141_queries

    q142, o142 = build_wave141_queries()
    queries.update(q142)
    oracles.update(o142)
    from .queries_wave142 import build_wave142_queries

    q143, o143 = build_wave142_queries()
    queries.update(q143)
    oracles.update(o143)
    from .queries_wave143 import build_wave143_queries

    q144, o144 = build_wave143_queries()
    queries.update(q144)
    oracles.update(o144)
    from .queries_wave144 import build_wave144_queries

    q145, o145 = build_wave144_queries()
    queries.update(q145)
    oracles.update(o145)
    from .queries_wave145 import build_wave145_queries

    q146, o146 = build_wave145_queries()
    queries.update(q146)
    oracles.update(o146)
    from .queries_wave146 import build_wave146_queries

    q147, o147 = build_wave146_queries()
    queries.update(q147)
    oracles.update(o147)
    from .queries_wave147 import build_wave147_queries

    q148, o148 = build_wave147_queries()
    queries.update(q148)
    oracles.update(o148)
    from .queries_wave148 import build_wave148_queries

    q149, o149 = build_wave148_queries()
    queries.update(q149)
    oracles.update(o149)
    from .queries_wave149 import build_wave149_queries

    q150, o150 = build_wave149_queries()
    queries.update(q150)
    oracles.update(o150)
    from .queries_wave150 import build_wave150_queries

    q151, o151 = build_wave150_queries()
    queries.update(q151)
    oracles.update(o151)
    from .queries_wave151 import build_wave151_queries

    q152, o152 = build_wave151_queries()
    queries.update(q152)
    oracles.update(o152)
    from .queries_wave152 import build_wave152_queries

    q153, o153 = build_wave152_queries()
    queries.update(q153)
    oracles.update(o153)
    from .queries_wave153 import build_wave153_queries

    q154, o154 = build_wave153_queries()
    queries.update(q154)
    oracles.update(o154)
    from .queries_wave154 import build_wave154_queries

    q155, o155 = build_wave154_queries()
    queries.update(q155)
    oracles.update(o155)
    from .queries_wave155 import build_wave155_queries

    q156, o156 = build_wave155_queries()
    queries.update(q156)
    oracles.update(o156)
    from .queries_wave156 import build_wave156_queries

    q157, o157 = build_wave156_queries()
    queries.update(q157)
    oracles.update(o157)
    from .queries_wave157 import build_wave157_queries

    q158, o158 = build_wave157_queries()
    queries.update(q158)
    oracles.update(o158)
    from .queries_wave158 import build_wave158_queries

    q159, o159 = build_wave158_queries()
    queries.update(q159)
    oracles.update(o159)
    from .queries_wave159 import build_wave159_queries

    q160, o160 = build_wave159_queries()
    queries.update(q160)
    oracles.update(o160)
    from .queries_wave160 import build_wave160_queries

    q161, o161 = build_wave160_queries()
    queries.update(q161)
    oracles.update(o161)
    from .queries_wave161 import build_wave161_queries

    q162, o162 = build_wave161_queries()
    queries.update(q162)
    oracles.update(o162)
    from .queries_wave162 import build_wave162_queries

    q163, o163 = build_wave162_queries()
    queries.update(q163)
    oracles.update(o163)
    from .queries_wave163 import build_wave163_queries

    q164, o164 = build_wave163_queries()
    queries.update(q164)
    oracles.update(o164)
    from .queries_wave164 import build_wave164_queries

    q165, o165 = build_wave164_queries()
    queries.update(q165)
    oracles.update(o165)
    from .queries_wave165 import build_wave165_queries

    q166, o166 = build_wave165_queries()
    queries.update(q166)
    oracles.update(o166)
    from .queries_wave166 import build_wave166_queries

    q167, o167 = build_wave166_queries()
    queries.update(q167)
    oracles.update(o167)
    from .queries_wave167 import build_wave167_queries

    q168, o168 = build_wave167_queries()
    queries.update(q168)
    oracles.update(o168)
    from .queries_wave168 import build_wave168_queries

    q169, o169 = build_wave168_queries()
    queries.update(q169)
    oracles.update(o169)
    from .queries_wave169 import build_wave169_queries

    q170, o170 = build_wave169_queries()
    queries.update(q170)
    oracles.update(o170)
    from .queries_wave170 import build_wave170_queries

    q171, o171 = build_wave170_queries()
    queries.update(q171)
    oracles.update(o171)
    from .queries_wave171 import build_wave171_queries

    q172, o172 = build_wave171_queries()
    queries.update(q172)
    oracles.update(o172)
    from .queries_wave172 import build_wave172_queries

    q173, o173 = build_wave172_queries()
    queries.update(q173)
    oracles.update(o173)
    from .queries_wave173 import build_wave173_queries

    q174, o174 = build_wave173_queries()
    queries.update(q174)
    oracles.update(o174)
    from .queries_wave174 import build_wave174_queries

    q175, o175 = build_wave174_queries()
    queries.update(q175)
    oracles.update(o175)
    from .queries_wave175 import build_wave175_queries

    q176, o176 = build_wave175_queries()
    queries.update(q176)
    oracles.update(o176)
    from .queries_wave176 import build_wave176_queries

    q177, o177 = build_wave176_queries()
    queries.update(q177)
    oracles.update(o177)
    from .queries_wave177 import build_wave177_queries

    q178, o178 = build_wave177_queries()
    queries.update(q178)
    oracles.update(o178)
    from .queries_wave178 import build_wave178_queries

    q179, o179 = build_wave178_queries()
    queries.update(q179)
    oracles.update(o179)
    from .queries_wave179 import build_wave179_queries

    q180, o180 = build_wave179_queries()
    queries.update(q180)
    oracles.update(o180)
    from .queries_wave180 import build_wave180_queries

    q181, o181 = build_wave180_queries()
    queries.update(q181)
    oracles.update(o181)
    from .queries_wave181 import build_wave181_queries

    q182, o182 = build_wave181_queries()
    queries.update(q182)
    oracles.update(o182)
    from .queries_wave182 import build_wave182_queries

    q183, o183 = build_wave182_queries()
    queries.update(q183)
    oracles.update(o183)
    from .queries_wave183 import build_wave183_queries

    q184, o184 = build_wave183_queries()
    queries.update(q184)
    oracles.update(o184)
    from .queries_wave184 import build_wave184_queries

    q185, o185 = build_wave184_queries()
    queries.update(q185)
    oracles.update(o185)
    from .queries_wave185 import build_wave185_queries

    q186, o186 = build_wave185_queries()
    queries.update(q186)
    oracles.update(o186)
    from .queries_wave186 import build_wave186_queries

    q187, o187 = build_wave186_queries()
    queries.update(q187)
    oracles.update(o187)
    from .queries_wave187 import build_wave187_queries

    q188, o188 = build_wave187_queries()
    queries.update(q188)
    oracles.update(o188)
    from .queries_wave188 import build_wave188_queries

    q189, o189 = build_wave188_queries()
    queries.update(q189)
    oracles.update(o189)
    from .queries_wave189 import build_wave189_queries

    q190, o190 = build_wave189_queries()
    queries.update(q190)
    oracles.update(o190)
    from .queries_wave190 import build_wave190_queries

    q191, o191 = build_wave190_queries()
    queries.update(q191)
    oracles.update(o191)
    from .queries_wave191 import build_wave191_queries

    q192, o192 = build_wave191_queries()
    queries.update(q192)
    oracles.update(o192)
    from .queries_wave192 import build_wave192_queries

    q193, o193 = build_wave192_queries()
    queries.update(q193)
    oracles.update(o193)
    from .queries_wave193 import build_wave193_queries

    q194, o194 = build_wave193_queries()
    queries.update(q194)
    oracles.update(o194)
    from .queries_wave194 import build_wave194_queries

    q195, o195 = build_wave194_queries()
    queries.update(q195)
    oracles.update(o195)
    from .queries_wave195 import build_wave195_queries

    q196, o196 = build_wave195_queries()
    queries.update(q196)
    oracles.update(o196)
    from .queries_wave196 import build_wave196_queries

    q197, o197 = build_wave196_queries()
    queries.update(q197)
    oracles.update(o197)
    from .queries_wave197 import build_wave197_queries

    q198, o198 = build_wave197_queries()
    queries.update(q198)
    oracles.update(o198)
    from .queries_wave198 import build_wave198_queries

    q199, o199 = build_wave198_queries()
    queries.update(q199)
    oracles.update(o199)
    from .queries_wave199 import build_wave199_queries

    q200, o200 = build_wave199_queries()
    queries.update(q200)
    oracles.update(o200)
    from .queries_wave200 import build_wave200_queries

    q201, o201 = build_wave200_queries()
    queries.update(q201)
    oracles.update(o201)
    from .queries_wave201 import build_wave201_queries

    q202, o202 = build_wave201_queries()
    queries.update(q202)
    oracles.update(o202)
    from .queries_wave202 import build_wave202_queries

    q203, o203 = build_wave202_queries()
    queries.update(q203)
    oracles.update(o203)
    from .queries_wave203 import build_wave203_queries

    q204, o204 = build_wave203_queries()
    queries.update(q204)
    oracles.update(o204)
    from .queries_wave204 import build_wave204_queries

    q205, o205 = build_wave204_queries()
    queries.update(q205)
    oracles.update(o205)
    from .queries_wave205 import build_wave205_queries

    q206, o206 = build_wave205_queries()
    queries.update(q206)
    oracles.update(o206)
    from .queries_wave206 import build_wave206_queries

    q207, o207 = build_wave206_queries()
    queries.update(q207)
    oracles.update(o207)
    from .queries_wave207 import build_wave207_queries

    q208, o208 = build_wave207_queries()
    queries.update(q208)
    oracles.update(o208)
    from .queries_wave208 import build_wave208_queries

    q209, o209 = build_wave208_queries()
    queries.update(q209)
    oracles.update(o209)
    from .queries_wave209 import build_wave209_queries

    q210, o210 = build_wave209_queries()
    queries.update(q210)
    oracles.update(o210)
    from .queries_wave210 import build_wave210_queries

    q211, o211 = build_wave210_queries()
    queries.update(q211)
    oracles.update(o211)
    from .queries_wave211 import build_wave211_queries

    q212, o212 = build_wave211_queries()
    queries.update(q212)
    oracles.update(o212)
    from .queries_wave212 import build_wave212_queries

    q213, o213 = build_wave212_queries()
    queries.update(q213)
    oracles.update(o213)
    from .queries_wave213 import build_wave213_queries

    q214, o214 = build_wave213_queries()
    queries.update(q214)
    oracles.update(o214)
    from .queries_wave214 import build_wave214_queries

    q215, o215 = build_wave214_queries()
    queries.update(q215)
    oracles.update(o215)
    from .queries_wave215 import build_wave215_queries

    q216, o216 = build_wave215_queries()
    queries.update(q216)
    oracles.update(o216)
    from .queries_wave216 import build_wave216_queries

    q217, o217 = build_wave216_queries()
    queries.update(q217)
    oracles.update(o217)
    from .queries_wave217 import build_wave217_queries

    q218, o218 = build_wave217_queries()
    queries.update(q218)
    oracles.update(o218)
    from .queries_wave218 import build_wave218_queries

    q219, o219 = build_wave218_queries()
    queries.update(q219)
    oracles.update(o219)
    from .queries_wave219 import build_wave219_queries

    q220, o220 = build_wave219_queries()
    queries.update(q220)
    oracles.update(o220)
    from .queries_wave220 import build_wave220_queries

    q221, o221 = build_wave220_queries()
    queries.update(q221)
    oracles.update(o221)
    from .queries_wave221 import build_wave221_queries

    q222, o222 = build_wave221_queries()
    queries.update(q222)
    oracles.update(o222)
    from .queries_wave222 import build_wave222_queries

    q223, o223 = build_wave222_queries()
    queries.update(q223)
    oracles.update(o223)
    from .queries_wave223 import build_wave223_queries

    q224, o224 = build_wave223_queries()
    queries.update(q224)
    oracles.update(o224)
    from .queries_wave224 import build_wave224_queries

    q225, o225 = build_wave224_queries()
    queries.update(q225)
    oracles.update(o225)
    from .queries_wave225 import build_wave225_queries

    q226, o226 = build_wave225_queries()
    queries.update(q226)
    oracles.update(o226)
    from .queries_wave226 import build_wave226_queries

    q227, o227 = build_wave226_queries()
    queries.update(q227)
    oracles.update(o227)
    from .queries_wave227 import build_wave227_queries

    q228, o228 = build_wave227_queries()
    queries.update(q228)
    oracles.update(o228)
    from .queries_wave228 import build_wave228_queries

    q229, o229 = build_wave228_queries()
    queries.update(q229)
    oracles.update(o229)
    from .queries_wave229 import build_wave229_queries

    q230, o230 = build_wave229_queries()
    queries.update(q230)
    oracles.update(o230)
    from .queries_wave230 import build_wave230_queries

    q231, o231 = build_wave230_queries()
    queries.update(q231)
    oracles.update(o231)
    from .queries_wave231 import build_wave231_queries

    q232, o232 = build_wave231_queries()
    queries.update(q232)
    oracles.update(o232)
    from .queries_wave232 import build_wave232_queries

    q233, o233 = build_wave232_queries()
    queries.update(q233)
    oracles.update(o233)
    from .queries_wave233 import build_wave233_queries

    q234, o234 = build_wave233_queries()
    queries.update(q234)
    oracles.update(o234)
    from .queries_wave234 import build_wave234_queries

    q235, o235 = build_wave234_queries()
    queries.update(q235)
    oracles.update(o235)
    from .queries_wave235 import build_wave235_queries

    q236, o236 = build_wave235_queries()
    queries.update(q236)
    oracles.update(o236)
    from .queries_wave236 import build_wave236_queries

    q237, o237 = build_wave236_queries()
    queries.update(q237)
    oracles.update(o237)
    from .queries_wave237 import build_wave237_queries

    q238, o238 = build_wave237_queries()
    queries.update(q238)
    oracles.update(o238)
    from .queries_wave238 import build_wave238_queries

    q239, o239 = build_wave238_queries()
    queries.update(q239)
    oracles.update(o239)
    from .queries_wave239 import build_wave239_queries

    q240, o240 = build_wave239_queries()
    queries.update(q240)
    oracles.update(o240)
    from .queries_wave240 import build_wave240_queries

    q241, o241 = build_wave240_queries()
    queries.update(q241)
    oracles.update(o241)
    from .queries_wave241 import build_wave241_queries

    q242, o242 = build_wave241_queries()
    queries.update(q242)
    oracles.update(o242)
    from .queries_wave242 import build_wave242_queries

    q243, o243 = build_wave242_queries()
    queries.update(q243)
    oracles.update(o243)
    from .queries_wave243 import build_wave243_queries

    q244, o244 = build_wave243_queries()
    queries.update(q244)
    oracles.update(o244)
    from .queries_wave244 import build_wave244_queries

    q245, o245 = build_wave244_queries()
    queries.update(q245)
    oracles.update(o245)
    from .queries_wave245 import build_wave245_queries

    q246, o246 = build_wave245_queries()
    queries.update(q246)
    oracles.update(o246)
    from .queries_wave246 import build_wave246_queries

    q247, o247 = build_wave246_queries()
    queries.update(q247)
    oracles.update(o247)
    from .queries_wave247 import build_wave247_queries

    q248, o248 = build_wave247_queries()
    queries.update(q248)
    oracles.update(o248)
    from .queries_wave248 import build_wave248_queries

    q249, o249 = build_wave248_queries()
    queries.update(q249)
    oracles.update(o249)
    from .queries_wave249 import build_wave249_queries

    q250, o250 = build_wave249_queries()
    queries.update(q250)
    oracles.update(o250)
    from .queries_wave250 import build_wave250_queries

    q251, o251 = build_wave250_queries()
    queries.update(q251)
    oracles.update(o251)
    from .queries_wave251 import build_wave251_queries

    q252, o252 = build_wave251_queries()
    queries.update(q252)
    oracles.update(o252)
    from .queries_wave252 import build_wave252_queries

    q253, o253 = build_wave252_queries()
    queries.update(q253)
    oracles.update(o253)
    from .queries_wave253 import build_wave253_queries

    q254, o254 = build_wave253_queries()
    queries.update(q254)
    oracles.update(o254)
    from .queries_wave254 import build_wave254_queries

    q255, o255 = build_wave254_queries()
    queries.update(q255)
    oracles.update(o255)
    from .queries_wave255 import build_wave255_queries

    q256, o256 = build_wave255_queries()
    queries.update(q256)
    oracles.update(o256)
    from .queries_wave256 import build_wave256_queries

    q257, o257 = build_wave256_queries()
    queries.update(q257)
    oracles.update(o257)
    from .queries_wave257 import build_wave257_queries

    q258, o258 = build_wave257_queries()
    queries.update(q258)
    oracles.update(o258)
    from .queries_wave258 import build_wave258_queries

    q259, o259 = build_wave258_queries()
    queries.update(q259)
    oracles.update(o259)
    from .queries_wave259 import build_wave259_queries

    q260, o260 = build_wave259_queries()
    queries.update(q260)
    oracles.update(o260)
    from .queries_wave260 import build_wave260_queries

    q261, o261 = build_wave260_queries()
    queries.update(q261)
    oracles.update(o261)
    from .queries_wave261 import build_wave261_queries

    q262, o262 = build_wave261_queries()
    queries.update(q262)
    oracles.update(o262)
    from .queries_wave262 import build_wave262_queries

    q263, o263 = build_wave262_queries()
    queries.update(q263)
    oracles.update(o263)
    from .queries_wave263 import build_wave263_queries

    q264, o264 = build_wave263_queries()
    queries.update(q264)
    oracles.update(o264)
    from .queries_wave264 import build_wave264_queries

    q265, o265 = build_wave264_queries()
    queries.update(q265)
    oracles.update(o265)
    from .queries_wave265 import build_wave265_queries

    q266, o266 = build_wave265_queries()
    queries.update(q266)
    oracles.update(o266)
    from .queries_wave266 import build_wave266_queries

    q267, o267 = build_wave266_queries()
    queries.update(q267)
    oracles.update(o267)
    from .queries_wave267 import build_wave267_queries

    q268, o268 = build_wave267_queries()
    queries.update(q268)
    oracles.update(o268)
    from .queries_wave268 import build_wave268_queries

    q269, o269 = build_wave268_queries()
    queries.update(q269)
    oracles.update(o269)
    from .queries_wave269 import build_wave269_queries

    q270, o270 = build_wave269_queries()
    queries.update(q270)
    oracles.update(o270)
    from .queries_wave270 import build_wave270_queries

    q271, o271 = build_wave270_queries()
    queries.update(q271)
    oracles.update(o271)
    from .queries_wave271 import build_wave271_queries

    q272, o272 = build_wave271_queries()
    queries.update(q272)
    oracles.update(o272)
    from .queries_wave272 import build_wave272_queries

    q273, o273 = build_wave272_queries()
    queries.update(q273)
    oracles.update(o273)
    from .queries_wave273 import build_wave273_queries

    q274, o274 = build_wave273_queries()
    queries.update(q274)
    oracles.update(o274)
    from .queries_wave274 import build_wave274_queries

    q275, o275 = build_wave274_queries()
    queries.update(q275)
    oracles.update(o275)
    from .queries_wave275 import build_wave275_queries

    q276, o276 = build_wave275_queries()
    queries.update(q276)
    oracles.update(o276)
    from .queries_wave276 import build_wave276_queries

    q277, o277 = build_wave276_queries()
    queries.update(q277)
    oracles.update(o277)
    from .queries_wave277 import build_wave277_queries

    q278, o278 = build_wave277_queries()
    queries.update(q278)
    oracles.update(o278)
    from .queries_wave278 import build_wave278_queries

    q279, o279 = build_wave278_queries()
    queries.update(q279)
    oracles.update(o279)
    from .queries_wave279 import build_wave279_queries

    q280, o280 = build_wave279_queries()
    queries.update(q280)
    oracles.update(o280)
    from .queries_wave280 import build_wave280_queries

    q281, o281 = build_wave280_queries()
    queries.update(q281)
    oracles.update(o281)
    from .queries_wave281 import build_wave281_queries

    q282, o282 = build_wave281_queries()
    queries.update(q282)
    oracles.update(o282)
    from .queries_wave282 import build_wave282_queries

    q283, o283 = build_wave282_queries()
    queries.update(q283)
    oracles.update(o283)
    from .queries_wave283 import build_wave283_queries

    q284, o284 = build_wave283_queries()
    queries.update(q284)
    oracles.update(o284)
    from .queries_wave284 import build_wave284_queries

    q285, o285 = build_wave284_queries()
    queries.update(q285)
    oracles.update(o285)
    from .queries_wave285 import build_wave285_queries

    q286, o286 = build_wave285_queries()
    queries.update(q286)
    oracles.update(o286)
    from .queries_wave286 import build_wave286_queries

    q287, o287 = build_wave286_queries()
    queries.update(q287)
    oracles.update(o287)
    from .queries_wave287 import build_wave287_queries

    q288, o288 = build_wave287_queries()
    queries.update(q288)
    oracles.update(o288)
    from .queries_wave288 import build_wave288_queries

    q289, o289 = build_wave288_queries()
    queries.update(q289)
    oracles.update(o289)
    from .queries_wave289 import build_wave289_queries

    q290, o290 = build_wave289_queries()
    queries.update(q290)
    oracles.update(o290)
    from .queries_wave290 import build_wave290_queries

    q291, o291 = build_wave290_queries()
    queries.update(q291)
    oracles.update(o291)
    from .queries_wave291 import build_wave291_queries

    q292, o292 = build_wave291_queries()
    queries.update(q292)
    oracles.update(o292)
    from .queries_wave292 import build_wave292_queries

    q293, o293 = build_wave292_queries()
    queries.update(q293)
    oracles.update(o293)
    from .queries_wave293 import build_wave293_queries

    q294, o294 = build_wave293_queries()
    queries.update(q294)
    oracles.update(o294)
    from .queries_wave294 import build_wave294_queries

    q295, o295 = build_wave294_queries()
    queries.update(q295)
    oracles.update(o295)
    from .queries_wave295 import build_wave295_queries

    q296, o296 = build_wave295_queries()
    queries.update(q296)
    oracles.update(o296)
    from .queries_wave296 import build_wave296_queries

    q297, o297 = build_wave296_queries()
    queries.update(q297)
    oracles.update(o297)
    from .queries_wave297 import build_wave297_queries

    q298, o298 = build_wave297_queries()
    queries.update(q298)
    oracles.update(o298)
    from .queries_wave298 import build_wave298_queries

    q299, o299 = build_wave298_queries()
    queries.update(q299)
    oracles.update(o299)
    from .queries_wave299 import build_wave299_queries

    q300, o300 = build_wave299_queries()
    queries.update(q300)
    oracles.update(o300)
    return queries, oracles


def _gorilla_roundtrip_query(width: int):
    """Gorilla codec correctness as a HARD oracle row: encode each doc's
    w{width} mean series to blobs, decode them back in a second
    map_batches stage, and emit the decoded (doc_id, window_id, mean)
    rows. The codec is lossless, so the oracle is simply the rollup SQL —
    a bitwise roundtrip check (kernels/gorilla.py; ref
    src/compression/gorilla.rs encode/decode pair)."""
    from ..config import EngineConfig
    from ..stages.gorilla_stage import gorilla_from_corpus

    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        from ..kernels.gorilla import gorilla_decode

        cfg = EngineConfig(tiers=tier, chunk_stride_windows=10**6)
        blobs = gorilla_from_corpus(corpus_ds(sf_dir), cfg)

        def decode(t: pa.Table) -> pa.Table:
            ids, wids, means = [], [], []
            docs = t.column("doc_id").to_pylist()
            for doc, blob in zip(docs, t.column("blob").to_pylist()):
                ts, vals = gorilla_decode(blob)
                ids.extend([doc] * ts.size)
                wids.append(ts)
                means.append(vals)
            wid = (np.concatenate(wids) if wids
                   else np.zeros(0, dtype=np.int64))
            mean = (np.concatenate(means) if means
                    else np.zeros(0, dtype=np.float64))
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.string()),
                    "window_id": pa.array(wid.astype(np.int64)),
                    "mean": pa.array(mean.astype(np.float64)),
                }
            )

        ds = blobs.map_batches(decode, batch_format="pyarrow")
        return _cast(
            ds,
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "mean": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT doc_id,
           pos // {width} AS window_id,
           CAST(sum(token) AS DOUBLE) / count(*) AS mean
    FROM tok GROUP BY doc_id, window_id
    """
    return q, sql


def _gorilla_query(width: int):
    from ..config import EngineConfig
    from ..stages.gorilla_stage import gorilla_from_corpus

    tier = (TierSpec(f"w{width}", width),)

    def q(sf_dir: str):
        cfg = EngineConfig(tiers=tier, chunk_stride_windows=10**6)
        ds = gorilla_from_corpus(corpus_ds(sf_dir), cfg)
        return _cast(
            ds,
            {
                "doc_id": pa.string(),
                "tier": pa.string(),
                "blob": pa.binary(),
                "n_pts": pa.int64(),
            },
        )

    return q
