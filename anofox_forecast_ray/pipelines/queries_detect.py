"""Third query wave: outlier detection and changepoints over the events
stream. The z-score oracle is made bitwise-safe by computing mean/std from
exact integer sums with the identical explicit formula on both sides
(DuckDB's stddev uses Welford internally — so the SQL spells out
sqrt((ss - s^2/n)/n) instead)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks


def _events_outliers_query(threshold: float = 3.0):
    """Per event_type z-score outliers on integer cents."""

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def prep(t: pa.Table) -> pa.Table:
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "event_id": t.column("event_id"),
                    "cents": pa.array(cents),
                }
            )

        def flag(g: pd.DataFrame) -> pd.DataFrame:
            c = g["cents"].to_numpy()
            n = c.size
            s = int(c.sum())
            ss = int(np.dot(c, c))
            mean = s / n
            var = (ss - s * s / n) / n
            std = np.sqrt(max(var, 0.0))
            z = np.abs(c - mean) / std if std > 0 else np.zeros(n)
            out = pd.DataFrame(
                {
                    "event_type": g["event_type"].to_numpy(),
                    "event_id": g["event_id"].to_numpy(),
                    "zscore": z,
                    "is_outlier": z > threshold,
                }
            )
            return out[out["is_outlier"]]

        ds = (
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_type", "event_id", "value"],
                override_num_blocks=_num_read_blocks(),
            )
            .map_batches(prep, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(flag, batch_format="pandas")
        )
        return _cast(
            ds,
            {
                "event_type": pa.string(),
                "event_id": pa.int64(),
                "zscore": pa.float64(),
                "is_outlier": pa.bool_(),
            },
        )

    sql = f"""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM e GROUP BY event_type
    ),
    scored AS (
        SELECT e.event_type, e.event_id,
               abs(e.cents - CAST(st.s AS DOUBLE) / st.n)
                 / sqrt((st.ss - CAST(st.s AS DOUBLE) * st.s / st.n) / st.n)
                 AS zscore
        FROM e JOIN stats st USING (event_type)
    )
    SELECT event_type, event_id, zscore, zscore > {threshold} AS is_outlier
    FROM scored WHERE zscore > {threshold}
    """
    return q, sql


def _pelt_sql(cost: str) -> str:
    """Exact O(n^2) PELT dynamic program in DuckDB SQL.

    PELT with Killick pruning returns the same optimum as the unpruned
    DP, so the oracle replays the full recursion F(t) = min_{s<=t-2}
    F(s) + C(s,t) + beta. Structure (shaped around three DuckDB-1.0
    lambda/recursion bugs found while building this):

    - ``pre`` builds prefix sums as SEQUENTIAL left folds (one
      list_append per step — numpy's cumsum order, see the CLAUDE.md
      float-fold invariant).
    - The full segment-cost matrix is computed OUTSIDE the recursion as
      a plain vectorized self-join (``crows``, MATERIALIZED): DuckDB 1.0
      inlines CTEs, and evaluating ``ln(...) * (t-s)`` inside a
      recursive-CTE lambda segfaults in ListExtract. Materializing keeps
      the transcendental math on the normal vectorized path.
    - ``dp`` extends [F, prev] one t per step; the lambda only does
      ``f[s+1] + crow[s+1] + pen``. Argmin is list_aggregate('min') +
      list_position (first occurrence == the Python loop's strict-<
      tie-break); list_reduce with a 2-element accumulator returns
      garbage under recursion in this DuckDB build.
    - Backtracking follows prev pointers from t=n, emitting every
      positive interior index.

    Costs (kernels/changepoint.py):
      l2            : (c2[t]-c2[s]) - (c1[t]-c1[s])^2/(t-s), beta=2 ln n
      mean_variance : nseg*(1+ln(var)), var=(s2-s1^2/nseg)/nseg,
                      0 when var < 1e-10, beta=3 ln n. The var<1e-10
                      guard is an arithmetic mask (CAST(bool AS DOUBLE)
                      *) so no branch ever feeds ln() a non-positive —
                      multiplying the kept branch by 1.0 is exact.
    """
    if cost == "l2":
        pen = "2.0e0 * ln(n)"
        cost_expr = (
            "(a.c2v - b.c2v) - (a.c1v - b.c1v) * (a.c1v - b.c1v)"
            " / (a.i - b.i)"
        )
    elif cost == "mean_variance":
        pen = "3.0e0 * ln(n)"
        var = (
            "(((a.c2v - b.c2v) - (a.c1v - b.c1v) * (a.c1v - b.c1v)"
            " / (a.i - b.i)) / (a.i - b.i))"
        )
        cost_expr = (
            f"CAST({var} >= 1e-10 AS DOUBLE)"
            f" * ((a.i - b.i) * (1.0e0 + ln(greatest({var}, 1e-10))))"
        )
    else:  # pragma: no cover
        raise ValueError(f"no SQL oracle for PELT cost {cost!r}")
    return f"""
    WITH RECURSIVE e AS (
        SELECT user_id,
               epoch_us(ts) // 3600000000 AS hour,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    hourly AS (
        SELECT user_id, hour,
               CAST(sum(cents) AS DOUBLE) / count(*) AS y
        FROM e GROUP BY user_id, hour
    ),
    series AS (
        SELECT user_id, list(y ORDER BY hour) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM hourly GROUP BY user_id
    ),
    pre AS (
        SELECT user_id, ys, n, CAST(1 AS BIGINT) AS i,
               [0.0e0] AS c1, [0.0e0] AS c2
        FROM series
        UNION ALL
        SELECT user_id, ys, n, i + 1,
               list_append(c1, c1[i] + ys[i]),
               list_append(c2, c2[i] + ys[i] * ys[i])
        FROM pre WHERE i <= n
    ),
    ready AS (
        SELECT user_id, n, c1, c2, {pen} AS pen
        FROM pre WHERE i = n + 1
    ),
    pp AS (
        SELECT user_id, CAST(u.i AS BIGINT) - 1 AS i,
               c1[u.i] AS c1v, c2[u.i] AS c2v
        FROM ready, unnest(generate_series(1, CAST(n + 1 AS BIGINT))) AS u(i)
    ),
    crows AS MATERIALIZED (
        SELECT user_id, t, list(c ORDER BY s) AS crow FROM (
            SELECT a.user_id, a.i AS t, b.i AS s, {cost_expr} AS c
            FROM pp a JOIN pp b
              ON a.user_id = b.user_id AND b.i <= a.i - 2
        ) GROUP BY user_id, t
    ),
    dp AS (
        SELECT user_id, n, pen, CAST(1 AS BIGINT) AS t,
               [-pen] AS f, [CAST(0 AS BIGINT)] AS prev
        FROM ready
        UNION ALL
        SELECT user_id, n, pen, t + 1,
               list_append(f, list_aggregate(cand, 'min')),
               list_append(prev,
                   CAST(list_position(cand, list_aggregate(cand, 'min'))
                        AS BIGINT) - 1)
        FROM (
            SELECT dp.user_id, dp.n, dp.pen, dp.t, dp.f, dp.prev,
                   CASE WHEN dp.t < 2 THEN ['infinity'::DOUBLE]
                   ELSE list_transform(range(0, dp.t - 1), s ->
                            f[s + 1] + crow[s + 1] + pen)
                   END AS cand
            FROM dp LEFT JOIN crows cr
              ON cr.user_id = dp.user_id AND cr.t = dp.t
            WHERE dp.t <= dp.n
        )
    ),
    done AS (SELECT user_id, n, prev FROM dp WHERE t = n + 1),
    bt AS (
        SELECT user_id, prev, n AS t, FALSE AS is_cp FROM done
        UNION ALL
        SELECT user_id, prev, prev[t + 1], TRUE FROM bt WHERE t > 0
    )
    SELECT user_id, CAST(t AS BIGINT) AS changepoint_idx
    FROM bt WHERE is_cp AND t > 0
    """


def _pelt_query(cost: str = "l2", model_label: str | None = None):
    """PELT changepoints per user over hourly mean cents. Oracled two
    ways: the exhaustive-DP golden (tools/golden_oracles.py) and, for
    l2 / mean_variance, an exact recursive-CTE SQL replay
    (``_pelt_sql``)."""

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.changepoint import pelt_detect

        def prep(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    "hour": pa.array(ts // 3_600_000_000),
                    "cents": pa.array(cents),
                }
            )

        def cps(g: pd.DataFrame) -> pd.DataFrame:
            h = g.groupby("hour")["cents"].mean().sort_index()
            points = pelt_detect(h.to_numpy(dtype=np.float64), cost=cost)
            return pd.DataFrame(
                {
                    "user_id": np.full(len(points), g["user_id"].iloc[0],
                                        dtype=np.int64),
                    "changepoint_idx": np.array(points, dtype=np.int64),
                }
            )

        return (
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "ts", "value"],
                override_num_blocks=_num_read_blocks(),
            )
            .map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(cps, batch_format="pandas")
        )

    return q


def _stl_strength_query():
    """Per-doc STL seasonal/trend strengths over the w8 window-mean series
    (rows-only — LOESS loops aren't SQL)."""

    def q(sf_dir: str):
        from ..config import TierSpec
        from ..kernels.stl import stl_decompose
        from ..stages.rollup import make_tier_rollup_fn
        from .queries import corpus_ds
        import pandas as pd

        tier = (TierSpec("w8", 8),)

        def strengths(t: pa.Table) -> pa.Table:
            import numpy as _np

            df = make_tier_rollup_fn(tier)(t).to_pandas()
            rows = {"doc_id": [], "seasonal_strength": [], "trend_strength": []}
            for doc, g in df.groupby("doc_id", sort=False):
                y = g.sort_values("window_id")["mean"].to_numpy()
                res = stl_decompose(y, 8) if y.size >= 16 else None
                if res is None:
                    continue
                rows["doc_id"].append(doc)
                rows["seasonal_strength"].append(res.seasonal_strength())
                rows["trend_strength"].append(res.trend_strength())
            return pa.table(
                {
                    "doc_id": pa.array(rows["doc_id"], type=pa.string()),
                    "seasonal_strength": pa.array(
                        rows["seasonal_strength"], type=pa.float64()
                    ),
                    "trend_strength": pa.array(
                        rows["trend_strength"], type=pa.float64()
                    ),
                }
            )

        return corpus_ds(sf_dir).map_batches(strengths, batch_format="pyarrow")

    return q


def _arima_query(width: int = 8):
    """ARIMA(1,1,1) one-step forecast per doc over the w8 means (rows-only
    — CSS optimization is not SQL-expressible)."""

    def q(sf_dir: str):
        from ..config import EngineConfig, TierSpec
        from ..stages.forecast import forecast_corpus
        from .queries import _cast, corpus_ds
        import pyarrow as pa

        cfg = EngineConfig(
            tiers=(TierSpec(f"w{width}", width),),
            forecast_horizon=1,
            chunk_stride_windows=10**6,
            forecast_concurrency=None, forecast_batch_size=16,
        )
        fc = forecast_corpus(
            corpus_ds(sf_dir), cfg, models=(("arima", {"p": 1, "d": 1, "q": 1}),)
        )
        return _cast(
            fc,
            {
                "doc_id": pa.string(),
                "model": pa.string(),
                "h": pa.int32(),
                "yhat": pa.float64(),
            },
        )

    return q




def _standardize_query():
    """Per-source z-scores of n_tok with population moments computed from
    exact integer sums (identical explicit formula on both sides — scale
    transform coverage, src/transform/scale.rs:39)."""

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd
        import numpy as np
        import pyarrow as pa

        from .queries import _cast, _num_read_blocks

        def z(g: pd.DataFrame) -> pd.DataFrame:
            v = g["n_tok"].to_numpy(dtype=np.int64)
            n = v.size
            s = int(v.sum())
            ss = int(np.dot(v, v))
            mean = s / n
            var = (ss - s * s / n) / n
            std = np.sqrt(max(var, 0.0))
            return pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "source": g["source"].to_numpy(),
                    "z_n_tok": (v - mean) / std if std > 0 else np.zeros(n),
                }
            )

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.string()),
                    "source": t.column("source"),
                    "n_tok": pc.utf8_length(t.column("text")).cast(pa.int64()),
                }
            )

        ds = (
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "source"],
                override_num_blocks=_num_read_blocks(),
            )
            .map_batches(prep, batch_format="pyarrow")
            .groupby("source")
            .map_groups(z, batch_format="pandas")
        )
        return _cast(
            ds,
            {
                "doc_id": pa.string(),
                "source": pa.string(),
                "z_n_tok": pa.float64(),
            },
        )

    sql = """
    WITH d AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
               CAST(length(text) AS BIGINT) AS n_tok
        FROM documents
    ),
    stats AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_tok) AS BIGINT) AS s,
               CAST(sum(n_tok * n_tok) AS BIGINT) AS ss
        FROM d GROUP BY source
    )
    SELECT d.doc_id, d.source,
           (d.n_tok - CAST(st.s AS DOUBLE) / st.n)
             / sqrt((st.ss - CAST(st.s AS DOUBLE) * st.s / st.n) / st.n)
             AS z_n_tok
    FROM d JOIN stats st USING (source)
    """
    return q, sql




def _doc_rolling_query(width: int = 8, window: int = 4):
    """Trailing rolling mean over each doc's window-mean series, computed
    IN-ROW from tokens (no shuffle; reference rolling_mean warm-up-NaN
    semantics with the prefix dropped). window=4 keeps division exact."""

    def q(sf_dir: str):
        import numpy as np
        import pyarrow as pa

        from ..config import TierSpec
        from ..kernels.rollup import rollup_flat
        from ..stages.rollup import _flat_tokens
        from .queries import _cast, corpus_ds

        def roll(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out_doc, out_wid, out_rm = [], [], []
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                from ..kernels.windows import rolling_sum

                for s0, s1 in zip(bounds, ends):
                    # token-weighted rolling mean from EXACT integer window
                    # sums/counts (float cumsum of ints < 2^53 is exact, so
                    # this is bitwise-stable across engines)
                    rs = rolling_sum(r["sum"][s0:s1].astype(np.float64), window)
                    rc = rolling_sum(r["cnt"][s0:s1].astype(np.float64), window)
                    ok = np.isfinite(rs)
                    rm = rs[ok] / rc[ok]
                    wid = r["window_id"][s0:s1][ok]
                    out_doc.extend([ids[ridx[s0]]] * int(ok.sum()))
                    out_wid.extend(wid.tolist())
                    out_rm.extend(rm.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "window_id": pa.array(out_wid, type=pa.int64()),
                    "roll_mean": pa.array(out_rm, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(roll, batch_format="pyarrow"),
            {
                "doc_id": pa.string(),
                "window_id": pa.int64(),
                "roll_mean": pa.float64(),
            },
        )

    from .queries import SQL_TOK

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(sum(token) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY doc_id, window_id
    )
    SELECT doc_id, window_id,
           CAST(sum(s) OVER win AS DOUBLE)
             / CAST(sum(cnt) OVER win AS DOUBLE) AS roll_mean
    FROM w
    WINDOW win AS (PARTITION BY doc_id ORDER BY window_id
                   ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY window_id)
            >= {window}
    """
    return q, sql


def _naive_exog_query(width: int = 8):
    """Naive forecast with exogenous regressors threaded through the model
    fit: per doc, y = w{width} means, x1 = wid % 7 (weekly sawtooth — an
    exact rational, unlike sin() whose numpy/libm results differ in the
    last ulp), x2 = wid / n, h=1 future at wid = n. The kernel's OLS uses
    sequential fold sums + Cramer (kernels/ols.py), so the SQL oracle
    replays it bitwise."""

    def q(sf_dir: str):
        import pyarrow as pa

        from ..models import make_model
        from .queries import _cast, corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..kernels.rollup import rollup_flat

        def fc(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            means = r["sum"].astype(np.float64) / r["cnt"]
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out_doc, out_yhat = [], []
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    y = means[s0:s1]
                    n = y.size
                    if n < 4:
                        continue
                    wid = np.arange(n, dtype=np.float64)
                    regs = {
                        "x1": wid % 7.0,
                        "x2": wid / n,
                    }
                    m = make_model("naive").fit_with_exog(y, regs)
                    fut = {
                        "x1": np.array([float(n) % 7.0]),
                        "x2": np.array([float(n)]) / n,
                    }
                    out_doc.append(ids[ridx[s0]])
                    out_yhat.append(float(m.predict_with_exog(1, fut)[0]))
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "model": pa.array(["naive_exog"] * len(out_doc)),
                    "h": pa.array([1] * len(out_doc), type=pa.int32()),
                    "yhat": pa.array(out_yhat, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(fc, batch_format="pyarrow"),
            {"doc_id": pa.string(), "model": pa.string(), "h": pa.int32(),
             "yhat": pa.float64()},
        )

    from .queries import _series_list_sql

    def fold(expr: str) -> str:
        return (f"list_reduce(list_transform(generate_series(1, n), "
                f"i -> {expr}), (acc, x) -> acc + x)")

    x1 = "CAST((i - 1) % 7 AS DOUBLE)"
    x2 = "(CAST(i - 1 AS DOUBLE) / n)"
    sql = f"""
    {_series_list_sql(width)},
    sums AS (
        SELECT doc_id, ms, n, CAST(n AS DOUBLE) AS nn,
               list_reduce(ms, (acc, x) -> acc + x) AS sy,
               {fold(x1)} AS s1,
               {fold(x2)} AS s2,
               {fold(f"{x1} * {x1}")} AS s11,
               {fold(f"{x1} * {x2}")} AS s12,
               {fold(f"{x2} * {x2}")} AS s22,
               {fold(f"{x1} * ms[i]")} AS s1y,
               {fold(f"{x2} * ms[i]")} AS s2y
        FROM l
    ),
    beta AS (
        SELECT doc_id, ms, n,
               nn * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det,
               sy * (s11 * s22 - s12 * s12)
               - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS d0,
               nn * (s1y * s22 - s12 * s2y)
               - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS d1,
               nn * (s11 * s2y - s1y * s12)
               - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS d2
        FROM sums
    )
    ,
    bb AS (
        -- singular design (n <= 7 makes x2 proportional to x1): the
        -- kernel falls back to intercept-only beta = [sy/n, 0, 0]
        SELECT b.doc_id, b.ms, b.n,
               CASE WHEN b.det = 0 THEN s.sy / s.nn ELSE b.d0 / b.det END AS b0,
               CASE WHEN b.det = 0 THEN 0.0e0 ELSE b.d1 / b.det END AS b1,
               CASE WHEN b.det = 0 THEN 0.0e0 ELSE b.d2 / b.det END AS b2
        FROM beta b JOIN sums s USING (doc_id)
    )
    SELECT doc_id, 'naive_exog' AS model, CAST(1 AS INTEGER) AS h,
           (ms[n] - (b0 + (b1 * CAST((n - 1) % 7 AS DOUBLE)
                           + b2 * (CAST(n - 1 AS DOUBLE) / n))))
           + (b0 + (b1 * CAST(n % 7 AS DOUBLE)
                    + b2 * (CAST(n AS DOUBLE) / n))) AS yhat
    FROM bb
    """
    return q, sql


def build_detect_queries():
    queries, oracles = {}, {}
    q, sql = _events_outliers_query()
    queries["events_outliers"] = q
    oracles["events_outliers"] = sql
    queries["events_pelt_changepoints"] = _pelt_query()
    oracles["events_pelt_changepoints"] = _pelt_sql("l2")
    queries["events_pelt_meanvar"] = _pelt_query(cost="mean_variance")
    oracles["events_pelt_meanvar"] = _pelt_sql("mean_variance")
    queries["stl_strengths_w8"] = _stl_strength_query()
    queries["forecast_arima_w8"] = _arima_query()

    def auto_ets_q(sf_dir: str):
        from ..config import EngineConfig, TierSpec
        from ..stages.forecast import forecast_corpus
        from .queries import _cast, corpus_ds
        import pyarrow as pa

        cfg = EngineConfig(
            tiers=(TierSpec("w8", 8),), forecast_horizon=1,
            chunk_stride_windows=10**6,
            forecast_concurrency=None, forecast_batch_size=16,
        )
        fc = forecast_corpus(
            corpus_ds(sf_dir), cfg,
            models=(("auto_ets", {"period": 4, "additive_only": True}),)
        )
        return _cast(
            fc,
            {"doc_id": pa.string(), "model": pa.string(), "h": pa.int32(),
             "yhat": pa.float64()},
        )

    queries["forecast_auto_ets_w8"] = auto_ets_q
    qx, sqlx = _naive_exog_query()
    queries["forecast_naive_exog_w8"] = qx
    oracles["forecast_naive_exog_w8"] = sqlx
    qz, sqlz = _standardize_query()
    queries["doc_standardize"] = qz
    oracles["doc_standardize"] = sqlz
    qr, sqlr = _doc_rolling_query()
    queries["doc_rolling_mean_w8"] = qr
    oracles["doc_rolling_mean_w8"] = sqlr
    return queries, oracles
