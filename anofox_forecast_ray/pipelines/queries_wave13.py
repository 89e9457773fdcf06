"""Thirteenth query wave: dedup cluster assignment (connected components
over MinHash near-dup pairs), count-min-sketch heavy hitters, Bloom-filter
anti-join, and DTW series distances — the remaining training-data /
sketch operators, each with a bitwise DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_num_read_blocks(),
    )


def build_wave13_queries():
    queries, oracles = {}, {}

    from ..extras.components import dedup_components, dedup_components_sql

    def components_q(sf_dir: str):
        ds = dedup_components(
            _docs(sf_dir, ["doc_id", "text"]),
            _docs(sf_dir, ["doc_id"]),
        )
        return _cast(
            ds,
            {"doc_id": pa.int64(), "component": pa.int64(),
             "keep": pa.int32()},
        )

    queries["dedup_components"] = components_q
    oracles["dedup_components"] = dedup_components_sql()

    from ..extras.sketches import (
        bloom_anti_join,
        bloom_sql,
        cms_heavy_hitters,
        cms_sql,
    )

    def cms_q(sf_dir: str):
        ds = cms_heavy_hitters(_docs(sf_dir, ["source", "text"]))
        return _cast(
            ds,
            {"source": pa.string(), "token": pa.string(),
             "est_count": pa.int64(), "exact_count": pa.int64()},
        )

    queries["source_cms_counts"] = cms_q
    oracles["source_cms_counts"] = cms_sql()

    def bloom_q(sf_dir: str):
        ds = bloom_anti_join(_docs(sf_dir, ["doc_id", "text"]))
        return _cast(
            ds, {"doc_id": pa.int64(), "maybe_known": pa.int32()}
        )

    queries["doc_bloom_antijoin"] = bloom_q
    oracles["doc_bloom_antijoin"] = bloom_sql()

    def _source_series(sf_dir: str, width: int = 32):
        """Bounded (source, window_id, sum) table + broadcast ref of the
        global per-window total series (ordered by window_id)."""
        import numpy as np
        import ray

        from ..stages.rollup import TierSpec, make_tier_rollup_fn
        from ..stages.source_rollup import source_window_rollup
        from .queries import corpus_ds

        tier = (TierSpec(f"w{width}", width),)
        rollup = corpus_ds(sf_dir).map_batches(
            make_tier_rollup_fn(tier), batch_format="pyarrow"
        )
        # bounded (sources x windows) table — the same tree-reduced
        # partial set the source rollup already materializes
        agg = source_window_rollup(rollup, as_dataset=False)
        wid = agg.column("window_id").to_numpy(zero_copy_only=False)
        s = agg.column("sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # global reference series: per-window totals, ordered by window
        order = np.argsort(wid, kind="stable")
        uniq, start = np.unique(wid[order], return_index=True)
        gsum = np.add.reduceat(s[order], start)
        return agg, ray.put(gsum.astype(np.int64))

    def dtw_q(sf_dir: str, width: int = 32):
        import numpy as np
        import ray
        import ray.data as rd

        from ..kernels.dtw import dtw_int

        agg, y_ref = _source_series(sf_dir, width)

        def per_source(g: pa.Table) -> pa.Table:
            g = g.sort_by("window_id")
            x = g.column("sum").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            y = ray.get(y_ref)
            return pa.table(
                {
                    "source": pa.array(
                        [g.column("source")[0].as_py()], type=pa.string()
                    ),
                    "n_windows": pa.array([int(len(x))], type=pa.int64()),
                    "dtw": pa.array([dtw_int(x, y)], type=pa.int64()),
                }
            )

        ds = (
            rd.from_arrow(agg.select(["source", "window_id", "sum"]))
            .groupby("source")
            .map_groups(per_source, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"source": pa.string(), "n_windows": pa.int64(),
             "dtw": pa.int64()},
        )

    from .queries import SQL_TOK

    _BIG = 1 << 60
    queries["source_dtw_profile"] = dtw_q
    oracles["source_dtw_profile"] = f"""
    WITH RECURSIVE tok AS ({SQL_TOK}),
    ser AS (
        SELECT source, pos // 32 AS window_id,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY source, window_id
    ),
    g AS (
        SELECT window_id, CAST(sum(s) AS BIGINT) AS s
        FROM ser GROUP BY window_id
    ),
    ylist AS (
        SELECT list(s ORDER BY window_id) AS y,
               CAST(count(*) AS BIGINT) AS m
        FROM g
    ),
    xs AS (
        SELECT source, list(s ORDER BY window_id) AS x,
               CAST(count(*) AS BIGINT) AS n
        FROM ser GROUP BY source
    ),
    dp AS (
        SELECT source, x, n, y, m, CAST(0 AS BIGINT) AS i,
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, m + 1),
                                  j -> CAST({_BIG} AS BIGINT))) AS row
        FROM xs, ylist
        UNION ALL
        SELECT source, x, n, y, m, i + 1,
               list_reduce(
                   list_prepend([CAST({_BIG} AS BIGINT)],
                       list_transform(range(1, m + 1), j -> [j])),
                   (acc, e) -> list_append(acc,
                       abs(x[i + 1] - y[e[1]])
                       + least(row[e[1] + 1], acc[len(acc)],
                               row[e[1]])))
        FROM dp WHERE i < n
    )
    SELECT source, n AS n_windows, row[m + 1] AS dtw
    FROM dp WHERE i = n
    """

    from ..extras.lm import bigram_perplexity, bigram_perplexity_sql

    def ppl_q(sf_dir: str):
        from .queries import corpus_ds

        ds = bigram_perplexity(corpus_ds(sf_dir))
        return _cast(
            ds,
            {"doc_id": pa.string(), "n_bigrams": pa.int64(),
             "logprob": pa.float64(), "mean_logprob": pa.float64()},
        )

    queries["doc_bigram_logprob"] = ppl_q
    oracles["doc_bigram_logprob"] = bigram_perplexity_sql()

    def xcorr_q(sf_dir: str, width: int = 32, max_lag: int = 8):
        """Lead-lag between each source's token-sum series and the
        global profile via raw integer cross-products (order-free exact
        sums — no float-fold hazard). best_lag = argmax r(lag), ties to
        the smallest lag."""
        import numpy as np
        import ray
        import ray.data as rd

        agg, y_ref = _source_series(sf_dir, width)

        def per_source(g: pa.Table) -> pa.Table:
            g = g.sort_by("window_id")
            x = g.column("sum").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            y = ray.get(y_ref)
            n, m = x.size, y.size
            best = None
            for lag in range(max_lag + 1):
                t = min(n, m - lag)
                if t <= 0:
                    continue
                r = int(np.dot(x[:t], y[lag: lag + t]))
                if best is None or r > best[0]:
                    best = (r, lag)
            return pa.table(
                {
                    "source": pa.array(
                        [g.column("source")[0].as_py()], type=pa.string()
                    ),
                    "best_lag": pa.array([best[1]], type=pa.int64()),
                    "best_r": pa.array([best[0]], type=pa.int64()),
                    "n_windows": pa.array([int(n)], type=pa.int64()),
                }
            )

        ds = (
            rd.from_arrow(agg.select(["source", "window_id", "sum"]))
            .groupby("source")
            .map_groups(per_source, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"source": pa.string(), "best_lag": pa.int64(),
             "best_r": pa.int64(), "n_windows": pa.int64()},
        )

    from ..extras.packing import training_order, training_order_sql
    from ..extras.textstats import (
        pii_scan,
        pii_scan_sql,
        source_tfidf_sql,
        source_tfidf_top,
    )

    def pii_q(sf_dir: str):
        ds = pii_scan(_docs(sf_dir, ["doc_id", "text"]))
        return _cast(
            ds,
            {"doc_id": pa.int64(), "n_emails": pa.int64(),
             "n_urls": pa.int64(), "n_digit_runs": pa.int64(),
             "has_pii": pa.int32()},
        )

    queries["doc_pii_scan"] = pii_q
    oracles["doc_pii_scan"] = pii_scan_sql()

    def order_q(sf_dir: str):
        ds = training_order(_docs(sf_dir, ["doc_id"]))
        return _cast(
            ds,
            {"doc_id": pa.int64(), "shuffle_key": pa.string(),
             "rank": pa.int64()},
        )

    queries["doc_training_order"] = order_q
    oracles["doc_training_order"] = training_order_sql()

    def join_q(sf_dir: str):
        """Big x big shuffle join: lineitem x orders on orderkey, then
        revenue per order priority. The join output never re-shuffles —
        per-batch partial combine feeds a 5-key groupby."""
        import numpy as np
        import ray.data as rd

        from ..stages.join import bucketed_equi_join

        li = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

        def to_cents(t: pa.Table) -> pa.Table:
            p = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "cents": pa.array(
                        np.round(p * 100.0).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        li = li.map_batches(to_cents, batch_format="pyarrow")
        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
            lambda t: t.rename_columns(["l_orderkey", "priority"]),
            batch_format="pyarrow",
        )
        joined = bucketed_equi_join(li, orders, key="l_orderkey")

        def partial(t: pa.Table) -> pa.Table:
            pri = np.asarray(t.column("priority").to_pylist(), dtype=object)
            cents = t.column("cents").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            order = np.argsort(pri, kind="stable")
            ps, cs = pri[order], cents[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ps[1:] != ps[:-1]))
            )
            cnts = np.diff(np.concatenate((starts, [ps.size])))
            return pa.table(
                {
                    "priority": pa.array(ps[starts].tolist(),
                                         type=pa.string()),
                    "cents": pa.array(
                        np.add.reduceat(cs, starts), type=pa.int64()
                    ),
                    "n": pa.array(cnts.astype(np.int64), type=pa.int64()),
                }
            )

        agg = (
            joined.map_batches(partial, batch_format="pyarrow")
            .groupby("priority")
            .sum(["cents", "n"])
        )

        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(["priority", "revenue_cents", "n_items"])

        return _cast(
            agg.map_batches(rename, batch_format="pyarrow"),
            {"priority": pa.string(), "revenue_cents": pa.int64(),
             "n_items": pa.int64()},
        )

    def quant_q(sf_dir: str):
        from ..stages.quantile import events_value_quantiles

        return events_value_quantiles(sf_dir)

    from ..stages.quantile import events_value_quantiles_sql

    queries["events_value_quantiles"] = quant_q
    oracles["events_value_quantiles"] = events_value_quantiles_sql()

    queries["lineitem_join_priority_revenue"] = join_q
    oracles["lineitem_join_priority_revenue"] = """
    SELECT o.o_orderpriority AS priority,
           CAST(sum(CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY priority
    """

    def tfidf_q(sf_dir: str):
        ds = source_tfidf_top(_docs(sf_dir, ["source", "text"]), k=5)
        return _cast(
            ds,
            {"source": pa.string(), "token": pa.string(),
             "cnt": pa.int64(), "df": pa.int64(),
             "tfidf": pa.float64()},
        )

    queries["source_tfidf_top"] = tfidf_q
    oracles["source_tfidf_top"] = source_tfidf_sql(k=5)

    queries["source_xcorr_lag"] = xcorr_q
    oracles["source_xcorr_lag"] = f"""
    WITH tok AS ({SQL_TOK}),
    ser AS (
        SELECT source, pos // 32 AS window_id,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY source, window_id
    ),
    g AS (
        SELECT window_id, CAST(sum(s) AS BIGINT) AS s
        FROM ser GROUP BY window_id
    ),
    lags AS (SELECT unnest(generate_series(0, 8)) AS lag),
    rr AS (
        SELECT x.source, l.lag, CAST(sum(x.s * g.s) AS BIGINT) AS r
        FROM ser x
        JOIN lags l ON TRUE
        JOIN g ON g.window_id = x.window_id + l.lag
        GROUP BY x.source, l.lag
    ),
    best AS (
        SELECT source, lag, r,
               row_number() OVER (PARTITION BY source
                                  ORDER BY r DESC, lag ASC) AS rn
        FROM rr
    ),
    nw AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_windows
        FROM ser GROUP BY source
    )
    SELECT b.source, CAST(b.lag AS BIGINT) AS best_lag,
           b.r AS best_r, nw.n_windows
    FROM best b JOIN nw ON nw.source = b.source
    WHERE b.rn = 1
    """

    return queries, oracles
