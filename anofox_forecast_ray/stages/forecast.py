"""Forecast stage: stateful actor pool fitting per-series NumPy models.

The Ray-idiomatic translation of the reference's fit/predict loop
(SURVEY.md §2.4): a callable CLASS passed to ``map_batches(Cls,
concurrency=N)`` — model registry + config resolved ONCE per actor in
``__init__``; each ``__call__`` fits every requested model on every series
in the batch and emits forecast rows.

Two dataflow shapes:

- ``forecast_corpus``: straight from corpus rows — each doc's tier mean
  series is computed IN-ROW from its tokens (no shuffle at all), then
  models fit per (doc, tier). This is the scale path: embarrassingly
  parallel, zero exchange.
- ``forecast_grouped``: for already-aggregated (doc_id, tier, window_id,
  value) datasets (e.g. after gap-fill) — groupby + per-group fit.

Output schema (FIXTURES.md §2): doc_id, tier, model, h:int32,
yhat/lo/hi:float64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, TierSpec
from ..kernels.rollup import rollup_flat_tiers
from ..models import make_model

# ceiling for the second lockstep group (SeasonalNaive/ETS on >512-window
# lanes): bounds the zero-padded lane matrix to ~32 MB/batch; the rare
# longer lane takes the per-series path (bitwise-identical either way)
_VEC2_MAX_LEN = 4096

DEFAULT_MODELS: tuple[tuple[str, dict], ...] = (
    ("seasonal_naive", {"period": 12}),
    ("ses", {"alpha": 0.5}),
    ("ets", {"spec": "AAN", "optimize": False, "alpha": 0.3, "beta": 0.1}),
    ("theta", {}),
)


def _forecast_series(
    y: np.ndarray, models, horizon: int, level: float, instances=None
):
    """Fit each model on one series; returns list of
    (model_name, h, yhat, lo, hi) rows. Errors become NaN rows (the
    reference's per-row error surfacing, never crashing a block).

    ``instances`` lets actor stages reuse pre-built model objects —
    ``fit()`` fully overwrites state, so reuse across series is safe and
    avoids constructing hundreds of thousands of wrappers."""
    rows = []
    for i, (name, kw) in enumerate(models):
        try:
            m = instances[i] if instances is not None else make_model(name, **kw)
            m.fit(y)
            point, lo, hi = m.predict_with_intervals(horizon, level)
        except Exception:
            point = np.full(horizon, np.nan)
            lo = hi = point
        for h in range(horizon):
            rows.append((name, h + 1, float(point[h]),
                         float(lo[h]), float(hi[h])))
    return rows


class ForecastFromTokens:
    """Actor: corpus batch -> forecast rows for every tier."""

    def __init__(
        self,
        tiers: tuple[TierSpec, ...],
        models=DEFAULT_MODELS,
        horizon: int = 1,
        level: float = 0.95,
        min_points: int = 4,
    ):
        # once per actor: resolve model classes (registry import cost etc.)
        self.tiers = tiers
        self.models = [(n, dict(kw)) for n, kw in models]
        self.horizon = horizon
        self.level = level
        self.min_points = min_points
        # once per actor: instantiate each configured model (fail fast on
        # bad config); fit() overwrites state so instances are reused
        # across every series this actor processes
        self.instances = [make_model(n, **kw) for n, kw in self.models]
        # lockstep fast path: all-fixed-parameter model sets fit K series
        # at once (kernels/forecast_vec.py), bitwise-equal to the
        # per-series loop; None when any model needs per-series work
        from ..kernels.forecast_vec import plan_vec_models

        self._vec_plan = plan_vec_models(self.models)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._vec_plan is not None:
            return self._call_vectorized(batch)
        from .rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        out_doc, out_tier, out_model, out_h = [], [], [], []
        out_yhat, out_lo, out_hi = [], [], []
        by_width = rollup_flat_tiers(
            values, lengths, [t.width for t in self.tiers]
        )
        for tier in self.tiers:
            r = by_width[tier.width]
            means = r["sum"].astype(np.float64) / r["cnt"]
            ridx = r["row_idx"]
            # per-doc slices of the window-mean series (windows are emitted
            # in order per doc)
            boundaries = np.flatnonzero(
                np.concatenate(([True], ridx[1:] != ridx[:-1]))
            )
            ends = np.concatenate((boundaries[1:], [ridx.size]))
            for s0, s1 in zip(boundaries, ends):
                doc = doc_ids[ridx[s0]]
                y = means[s0:s1]
                if y.size < self.min_points:
                    continue
                for name, h, yhat, lo, hi in _forecast_series(
                    y, self.models, self.horizon, self.level,
                    instances=self.instances,
                ):
                    out_doc.append(doc)
                    out_tier.append(tier.name)
                    out_model.append(name)
                    out_h.append(h)
                    out_yhat.append(yhat)
                    out_lo.append(lo)
                    out_hi.append(hi)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "tier": pa.array(out_tier, type=pa.string()),
                "model": pa.array(out_model, type=pa.string()),
                "h": pa.array(out_h, type=pa.int32()),
                "yhat": pa.array(out_yhat, type=pa.float64()),
                "lo": pa.array(out_lo, type=pa.float64()),
                "hi": pa.array(out_hi, type=pa.float64()),
            }
        )

    def _fit_one(self, mi: int, y: np.ndarray):
        """Per-series fit of one model with the stage's error surface
        (exception -> NaN rows, exactly like _forecast_series)."""
        H = self.horizon
        try:
            m = self.instances[mi]
            m.fit(y)
            return m.predict_with_intervals(H, self.level)
        except Exception:
            nanrow = np.full(H, np.nan)
            return nanrow, nanrow, nanrow

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        """Lockstep path: same rows, same order, same bits as the loop
        above — series are fit K-at-a-time per model.

        Lane routing is PER MODEL: SES/Theta lanes longer than
        MAX_VEC_LEN use the per-series kernels (ses_scan switches
        algorithm there), while SeasonalNaive/ETS — exactly sequential at
        any length — stay lockstep up to _VEC2_MAX_LEN windows (bounding
        the padded-matrix memory); only lanes beyond that take the full
        per-series fallback."""
        from ..kernels.forecast_vec import MAX_VEC_LEN
        from .rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_col = batch.column("doc_id").cast(pa.string())
        M, H = len(self.models), self.horizon
        names = [n for n, _ in self.models]
        name_block = []
        for nm in names:
            name_block.extend([nm] * H)
        parts = []
        # one raw pass for the finest tier; coarser tiers compose from it
        # (bitwise-identical int semigroup — kernels/rollup.py)
        by_width = rollup_flat_tiers(
            values, lengths, [t.width for t in self.tiers]
        )
        for tier in self.tiers:
            r = by_width[tier.width]
            means = r["sum"].astype(np.float64) / r["cnt"]
            ridx = r["row_idx"]
            bounds = np.flatnonzero(
                np.concatenate(([True], ridx[1:] != ridx[:-1]))
            )
            ends = np.concatenate((bounds[1:], [ridx.size]))
            ns = ends - bounds
            keep = ns >= self.min_points
            bounds, ends, ns = bounds[keep], ends[keep], ns[keep]
            doc_index = ridx[bounds]
            D = ns.size
            if D == 0:
                continue
            point = np.empty((D, M, H))
            lo = np.empty((D, M, H))
            hi = np.empty((D, M, H))

            def _lockstep(lane_idx, model_indices):
                order = lane_idx[np.argsort(ns[lane_idx], kind="stable")]
                n_sorted = ns[order]
                Y = np.zeros((order.size, int(n_sorted[-1])))
                for j, d in enumerate(order):
                    Y[j, : ns[d]] = means[bounds[d]:ends[d]]
                for mi in model_indices:
                    p, lo_, hi_ = self._vec_plan[mi][0](
                        Y, n_sorted, H, self.level
                    )
                    point[order, mi, :] = p
                    lo[order, mi, :] = lo_
                    hi[order, mi, :] = hi_

            vi = np.flatnonzero(ns <= MAX_VEC_LEN)
            if vi.size:
                _lockstep(vi, range(M))
            v2 = np.flatnonzero((ns > MAX_VEC_LEN) & (ns <= _VEC2_MAX_LEN))
            if v2.size:
                # longest lanes leave the lockstep group when their solo
                # tail steps cost more than per-series fits (the gorilla
                # cost-argmin; both paths are bitwise-equal so the split
                # cannot change output)
                v2s = v2[np.argsort(ns[v2], kind="stable")]
                L = v2s.size
                nn = ns[v2s]
                csum = np.concatenate(([0], np.cumsum(nn)))
                jj = np.arange(L + 1)
                nmax_rem = np.concatenate(([0], nn))[L - jj]
                pts_seq = csum[-1] - csum[L - jj]
                cost = 12.0 * nmax_rem + 0.1 * (csum[-1] - pts_seq) \
                    + 0.8 * pts_seq
                jbest = int(np.argmin(cost))
                v2_lock = v2s[: L - jbest]
                v2_seq = v2s[L - jbest:]
                unbounded = [mi for mi, (_, cap) in enumerate(self._vec_plan)
                             if cap is None]
                bounded = [mi for mi in range(M) if mi not in unbounded]
                if unbounded and v2_lock.size:
                    _lockstep(v2_lock, unbounded)
                for d in v2_lock:
                    y = means[bounds[d]:ends[d]]
                    for mi in bounded:
                        point[d, mi], lo[d, mi], hi[d, mi] = (
                            self._fit_one(mi, y)
                        )
            else:
                v2_seq = np.zeros(0, dtype=np.int64)
            for d in np.concatenate(
                (v2_seq, np.flatnonzero(ns > _VEC2_MAX_LEN))
            ):
                rows = _forecast_series(
                    means[bounds[d]:ends[d]], self.models, H, self.level,
                    instances=self.instances,
                )
                arr = np.array([row[2:5] for row in rows]).reshape(M, H, 3)
                point[d] = arr[:, :, 0]
                lo[d] = arr[:, :, 1]
                hi[d] = arr[:, :, 2]
            per_doc = M * H
            take_idx = pa.array(np.repeat(doc_index, per_doc))
            parts.append(
                pa.table(
                    {
                        "doc_id": doc_col.take(take_idx),
                        "tier": pa.array([tier.name] * (D * per_doc),
                                         type=pa.string()),
                        "model": pa.array(name_block * D, type=pa.string()),
                        "h": pa.array(
                            np.tile(np.arange(1, H + 1, dtype=np.int32),
                                    D * M)
                        ),
                        "yhat": pa.array(point.ravel()),
                        "lo": pa.array(lo.ravel()),
                        "hi": pa.array(hi.ravel()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "tier": pa.array([], type=pa.string()),
                    "model": pa.array([], type=pa.string()),
                    "h": pa.array([], type=pa.int32()),
                    "yhat": pa.array([], type=pa.float64()),
                    "lo": pa.array([], type=pa.float64()),
                    "hi": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(parts).combine_chunks()


def forecast_corpus(ds, cfg: EngineConfig, models=DEFAULT_MODELS):
    return ds.map_batches(
        ForecastFromTokens(
            cfg.tiers, models, cfg.forecast_horizon, cfg.interval_level
        ),
        batch_format="pyarrow",
        batch_size=cfg.forecast_batch_size or cfg.batch_size,
        concurrency=cfg.forecast_concurrency,
        num_cpus=1,
    )


def make_grouped_forecast_fn(
    models=DEFAULT_MODELS,
    value_col: str = "mean",
    horizon: int = 1,
    level: float = 0.95,
    min_points: int = 4,
):
    """Per-group pyarrow UDF for forecast over aggregated series rows
    (arrow-native: no per-group pandas conversion copy)."""

    def _mk(rows, doc, tier):
        n = len(rows)
        return pa.table(
            {
                "doc_id": pa.array([doc] * n, type=pa.string()),
                "tier": pa.array([tier] * n, type=pa.string()),
                "model": pa.array([r[0] for r in rows], type=pa.string()),
                "h": pa.array([r[1] for r in rows], type=pa.int32()),
                "yhat": pa.array([r[2] for r in rows], type=pa.float64()),
                "lo": pa.array([r[3] for r in rows], type=pa.float64()),
                "hi": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )

    def fn(g: pa.Table) -> pa.Table:
        wid = g.column("window_id").to_numpy(zero_copy_only=False)
        order = np.argsort(wid, kind="stable")
        y = (
            g.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[order]
        )
        y = y[np.isfinite(y)]
        doc = (g.column("doc_id")[0].as_py()
               if "doc_id" in g.column_names else "")
        tier = (g.column("tier")[0].as_py()
                if "tier" in g.column_names else "")
        if y.size < min_points:
            return _mk([], doc, tier)
        return _mk(_forecast_series(y, models, horizon, level), doc, tier)

    return fn


def forecast_grouped(ds, keys=("doc_id", "tier"), **kw):
    return ds.groupby(list(keys)).map_groups(
        make_grouped_forecast_fn(**kw), batch_format="pyarrow"
    )
