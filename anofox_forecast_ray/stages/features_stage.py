"""Feature-extraction stage: per-series feature vectors.

Actor-pool ``map_batches`` stage (feature registry resolved once per
actor); each series (doc's token array, or its tier window-mean series) is
materialized as NumPy only inside the call — the Ray translation of the
reference's per-series feature functions (SURVEY.md §2.6).

Output: one row per (doc_id, tier) with one float64 column per feature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, TierSpec
from ..kernels.features import FEATURES

DEFAULT_FEATURES = (
    "abs_energy", "mean", "median", "standard_deviation", "variance",
    "skewness", "kurtosis", "absolute_sum_of_changes", "mean_abs_change",
    "count_above_mean", "count_below_mean", "longest_strike_above_mean",
    "first_location_of_maximum", "last_location_of_minimum",
    "autocorrelation_lag1", "cid_ce", "c3", "binned_entropy",
    "permutation_entropy", "lempel_ziv_complexity", "linear_trend_slope",
)


class FeatureExtractor:
    """corpus batch -> per-(doc, tier) feature rows."""

    def __init__(
        self,
        tiers: tuple[TierSpec, ...],
        feature_names=DEFAULT_FEATURES,
        min_points: int = 4,
        on_raw_tokens: bool = False,
    ):
        self.tiers = tiers
        self.fns = [(name, FEATURES[name]) for name in feature_names]
        self.min_points = min_points
        self.on_raw_tokens = on_raw_tokens

    def _series_iter(self, batch: pa.Table):
        from .rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        if self.on_raw_tokens:
            starts = np.concatenate(([0], np.cumsum(lengths)))
            for i, doc in enumerate(doc_ids):
                y = values[starts[i] : starts[i + 1]].astype(np.float64)
                yield doc, "raw", y
            return
        from ..kernels.rollup import rollup_flat_tiers

        by_width = rollup_flat_tiers(
            values, lengths, [t.width for t in self.tiers]
        )
        for tier in self.tiers:
            r = by_width[tier.width]
            means = r["sum"].astype(np.float64) / r["cnt"]
            ridx = r["row_idx"]
            if ridx.size == 0:
                continue
            bounds = np.flatnonzero(
                np.concatenate(([True], ridx[1:] != ridx[:-1]))
            )
            ends = np.concatenate((bounds[1:], [ridx.size]))
            for s0, s1 in zip(bounds, ends):
                yield doc_ids[ridx[s0]], tier.name, means[s0:s1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"doc_id": [], "tier": []}
        for name, _ in self.fns:
            cols[name] = []
        for doc, tier, y in self._series_iter(batch):
            if y.size < self.min_points:
                continue
            cols["doc_id"].append(doc)
            cols["tier"].append(tier)
            for name, fn in self.fns:
                try:
                    v = fn(y)
                except Exception:
                    v = float("nan")
                cols[name].append(float(v))
        out = {
            "doc_id": pa.array(cols["doc_id"], type=pa.string()),
            "tier": pa.array(cols["tier"], type=pa.string()),
        }
        for name, _ in self.fns:
            out[name] = pa.array(cols[name], type=pa.float64())
        return pa.table(out)


def extract_features(ds, cfg: EngineConfig, feature_names=DEFAULT_FEATURES,
                     on_raw_tokens: bool = False):
    return ds.map_batches(
        FeatureExtractor(cfg.tiers, feature_names, on_raw_tokens=on_raw_tokens),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.forecast_concurrency,
        num_cpus=1,
    )
