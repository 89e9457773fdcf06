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


def corpus_ds(sf_dir: str, num_blocks: int | None = None):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=DOC_COLS,
        override_num_blocks=num_blocks or _num_read_blocks(),
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


# Models whose per-series fit runs a Nelder-Mead / model-selection grid
# (~10-500 ms/series): these need tiny batches so the task pool spreads the
# optimizer compute across every CPU even on the 500-doc sf0.01 gate corpus.
# Cheap closed-form models (~0.1 ms/series) keep larger batches — task
# dispatch would otherwise dominate. Results are per-series deterministic,
# so batch partitioning cannot change output hashes.
# canonical optimizer-model set lives in models.OPTIMIZER_MODELS (review
# r4: this was a hand-copied variant that had drifted — holt/holt_winters/
# sarima run Nelder-Mead too)
from ..models import OPTIMIZER_MODELS as _HEAVY_MODELS  # noqa: E402


def _forecast_query(width: int, model_name: str, model_kw: dict, horizon: int):
    from ..config import EngineConfig

    tier = (TierSpec(f"w{width}", width),)
    heavy = model_name in _HEAVY_MODELS

    def q(sf_dir: str):
        cfg = EngineConfig(
            tiers=tier, forecast_horizon=horizon,
            chunk_stride_windows=10**6,
            forecast_concurrency=None,
            forecast_batch_size=16 if heavy else 128,
        )
        # optimizer-family models are per-series Python NM fits: the fused
        # read->tokenize->fit tasks carry ~tens of ms of real work each,
        # and per-task dispatch (~30 ms on this host) dominates when the
        # read fans into 2*cpus tiny blocks. Fewer, bigger tasks: measured
        # 2.1 s -> 0.85 s on forecast_otm_w8 at sf0.1/32 cpus. Block
        # partitioning never changes output hashes (per-series math).
        nb = None
        if heavy:
            import ray

            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                cpus = 8
            nb = max(8, cpus // 4)
        fc = forecast_corpus(
            corpus_ds(sf_dir, num_blocks=nb), cfg,
            models=((model_name, model_kw),)
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
    from .queries_models_auto import build_models_auto_queries

    qma, oma = build_models_auto_queries()
    queries.update(qma)
    oracles.update(oma)
    # Wave suites 4..299: uniform builder contract
    # (queries_wave{i}.build_wave{i}_queries() -> (queries, oracles)).
    # Disjointness is asserted so a future name collision fails loudly
    # instead of silently overwriting an earlier oracle.
    import importlib

    for _i in range(4, 301):
        _mod = importlib.import_module(f".queries_wave{_i}", __package__)
        _qw, _ow = getattr(_mod, f"build_wave{_i}_queries")()
        _dup = set(_qw) & set(queries)
        assert not _dup, f"wave{_i} redefines queries {sorted(_dup)}"
        _dupo = set(_ow) & set(oracles)
        assert not _dupo, f"wave{_i} redefines oracles {sorted(_dupo)}"
        queries.update(_qw)
        oracles.update(_ow)

    # Golden-checked queries: committed golden-verified parquet snapshots
    # as driver-visible oracles (see pipelines/golden_snapshots.py).
    from .golden_snapshots import attach_snapshot_oracles

    attach_snapshot_oracles(queries, oracles)
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
        from ..kernels.gorilla import gorilla_decode_many

        cfg = EngineConfig(tiers=tier, chunk_stride_windows=10**6)
        blobs = gorilla_from_corpus(corpus_ds(sf_dir), cfg)

        def decode(t: pa.Table) -> pa.Table:
            off, wid, mean = gorilla_decode_many(t.column("blob").to_pylist())
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(off))
            doc = t.column("doc_id").take(pa.array(idx))
            return pa.table(
                {
                    "doc_id": doc.cast(pa.string()),
                    "window_id": pa.array(wid),
                    "mean": pa.array(mean),
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
