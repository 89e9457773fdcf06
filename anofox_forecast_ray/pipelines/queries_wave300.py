"""Round-5 wave: co-partitioned ordered joins (VERDICT r4 item 2).

``stages/asof.py`` §copart implements the documented fallback for a
right side too big to broadcast: both sides hash-bucketed on the join
key, one vectorized rank-composite merge per coarse bucket. These
queries run the SAME purchases-vs-events joins as wave12's broadcast
versions against the SAME DuckDB oracles, so the two paths are pinned
hash-equal through the driver gate.
"""

from __future__ import annotations

import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _events(sf_dir: str):
    import ray.data as rd

    return read_cols(sf_dir, "events", ["event_id", "user_id", "ts"])


def _purchases_ds(sf_dir: str, payload_names: list[str]):
    """Right side as a DATASET (the copart path's contract): filtered
    and projected inside Ray — never collected on the driver."""
    import ray.data as rd

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        cols = {"user_id": t.column("user_id"), "ts": t.column("ts")}
        src = {"purchase_event_id": "event_id",
               "purchase_value": "value"}
        for name in payload_names:
            cols[name] = t.column(src[name])
        return pa.table(cols)

    return read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "value", "event_type"]).map_batches(project, batch_format="pyarrow")


def build_wave300_queries():
    queries, oracles = {}, {}

    def asof_copart_q(sf_dir: str):
        from ..stages.asof import asof_join_copart

        ds = asof_join_copart(
            _events(sf_dir),
            _purchases_ds(sf_dir,
                          ["purchase_event_id", "purchase_value"]),
            key="user_id", ts="ts",
            payload={"purchase_event_id": -1, "purchase_value": -1.0},
            gap_col="gap_us",
            left_cols=["event_id", "user_id"],
        )
        return _cast(
            ds,
            {"event_id": pa.int64(), "user_id": pa.int64(),
             "purchase_event_id": pa.int64(), "gap_us": pa.int64(),
             "purchase_value": pa.float64()},
        )

    queries["events_asof_purchase_copart"] = asof_copart_q
    # identical oracle to wave12's broadcast events_asof_purchase — the
    # two paths must be indistinguishable at the value-hash level
    oracles["events_asof_purchase_copart"] = """
    SELECT e.event_id, e.user_id,
           COALESCE(p.event_id, -1) AS purchase_event_id,
           COALESCE(CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT),
                    -1) AS gap_us,
           COALESCE(p.value, -1.0) AS purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts > p.ts
    """

    def range_copart_q(sf_dir: str):
        from ..stages.asof import range_count_copart

        ds = range_count_copart(
            _events(sf_dir), _purchases_ds(sf_dir, []),
            key="user_id", ts="ts", window_us=3_600_000_000,
            out_col="n_purchases_1h",
            left_cols=["event_id", "user_id"],
        )
        return _cast(
            ds,
            {"event_id": pa.int64(), "user_id": pa.int64(),
             "n_purchases_1h": pa.int64()},
        )

    queries["events_range_purchase_copart"] = range_copart_q
    oracles["events_range_purchase_copart"] = """
    SELECT e.event_id, e.user_id,
           CAST(count(p.event_id) AS BIGINT) AS n_purchases_1h
    FROM events e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts < e.ts
    GROUP BY e.event_id, e.user_id
    """

    def arima_ml_q(sf_dir: str):
        """ARIMA-ML(1,1,1) one-step forecast per doc over the w8 means —
        exact state-space likelihood (VERDICT r4 item 3). Golden-
        snapshot oracled: verified by tools/golden_oracles.check_arima_ml
        (independent scalar-Kalman fit) at snapshot time."""
        from ..config import EngineConfig, TierSpec
        from ..stages.forecast import forecast_corpus
        from .queries import corpus_ds

        cfg = EngineConfig(
            tiers=(TierSpec("w8", 8),), forecast_horizon=1,
            chunk_stride_windows=10**6,
            forecast_concurrency=None, forecast_batch_size=16,
        )
        fc = forecast_corpus(
            corpus_ds(sf_dir), cfg,
            models=(("arima_ml", {"p": 1, "d": 1, "q": 1}),),
        )
        return _cast(
            fc,
            {"doc_id": pa.string(), "model": pa.string(),
             "h": pa.int32(), "yhat": pa.float64()},
        )

    queries["forecast_arima_ml_w8"] = arima_ml_q
    # oracle attaches via golden_snapshots once the verified snapshot is
    # generated (tools/make_golden.py forecast_arima_ml_w8)

    def garch_p2q1_q(sf_dir: str):
        """GARCH(2,1) MLE variance forecast over the DIFFERENCED w8 mean
        series (differences are the near-zero-mean regime the
        garch.rs/statsforecast sigma^2-on-raw-x semantics assume).
        Golden-snapshot oracled via check_garch_p2q1's independent fit."""
        from ..kernels.garch import (
            garch_fit_pq,
            garch_forecast_variance_pq,
        )
        from .queries import corpus_ds
        from .queries_wave5 import _doc_series_rows

        import numpy as np

        horizon = 4

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "h": [], "sigma2": []}
            for doc, y in _doc_series_rows(t, 8, min_points=14):
                d = np.diff(y)
                st = garch_fit_pq(d, p=2, q=1)
                f = garch_forecast_variance_pq(st, horizon)
                for h in range(1, horizon + 1):
                    out["doc_id"].append(doc)
                    out["h"].append(h)
                    out["sigma2"].append(float(f[h - 1]))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "h": pa.array(out["h"], type=pa.int32()),
                    "sigma2": pa.array(out["sigma2"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "h": pa.int32(),
             "sigma2": pa.float64()},
        )

    queries["forecast_garch_p2q1_w8"] = garch_p2q1_q

    return queries, oracles
