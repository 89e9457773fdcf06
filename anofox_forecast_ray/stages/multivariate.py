"""Multivariate series pass-through.

Reference parity: ``src/core/time_series.rs:164-174`` stores values
column-major as ``Vec<Vec<f64>>`` (one inner vec per dimension) with
``dimension_metadata``; every model consumes ``primary_values()`` — the
FIRST dimension only (``:420-422``).  The engine mirrors that contract on
the Dataset plane: a multivariate series row carries

    series_id: string
    values:    list<list<double>>   (values[d][t], dimension-major)
    dim_labels: list<string>

and the forecast stage fits each model on ``values[0]``, ignoring (but
never corrupting) the remaining dimensions — structural completeness for
pipelines that ship covariate dims alongside the target.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..models import make_model


class MultivariateForecast:
    """map_batches(pyarrow) actor stage: (series_id, values, ...) ->
    (series_id, model, h, yhat, n_dims).  Models are instantiated once
    per actor; ``fit()`` fully overwrites state so reuse is safe."""

    def __init__(self, models, horizon: int = 1, min_points: int = 4):
        self.models = tuple(models)
        self.horizon = horizon
        self.min_points = min_points
        self.instances = [make_model(n, **kw) for n, kw in self.models]

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_model, out_h, out_yhat, out_dims = [], [], [], [], []
        ids = t.column("series_id").to_pylist()
        vals = t.column("values").to_pylist()
        for sid, dims in zip(ids, vals):
            if not dims:
                continue
            y = np.asarray(dims[0], dtype=np.float64)  # primary dim only
            if y.size < self.min_points:
                continue
            for (name, _), inst in zip(self.models, self.instances):
                try:
                    inst.fit(y)
                    point = inst.predict(self.horizon)
                except Exception:
                    point = np.full(self.horizon, np.nan)
                for h in range(self.horizon):
                    out_id.append(sid)
                    out_model.append(name)
                    out_h.append(h + 1)
                    out_yhat.append(float(point[h]))
                    out_dims.append(len(dims))
        return pa.table(
            {
                "series_id": pa.array(out_id, type=pa.string()),
                "model": pa.array(out_model, type=pa.string()),
                "h": pa.array(out_h, type=pa.int32()),
                "yhat": pa.array(out_yhat, type=pa.float64()),
                "n_dims": pa.array(out_dims, type=pa.int32()),
            }
        )


def normalize_values_layout(ds, layout: str = "column"):
    """Normalize a multivariate Dataset's ``values`` column to the
    engine's canonical column-major layout (``values[d][t]``).

    Reference parity: ``src/core/time_series.rs:304-337``
    (``ValueLayout::Row``) — a row-major builder input (each inner list
    is one observation across dimensions) is transposed to column-major
    at construction; ragged rows are a ``DimensionMismatch`` error. The
    engine mirrors both: ``layout="row"`` transposes per series inside
    ``map_batches`` and raises ``ValueError`` on ragged rows;
    ``layout="column"`` is the identity.
    """
    if layout == "column":
        return ds
    if layout != "row":
        raise ValueError(f"unknown values layout {layout!r}")

    def tx(t: pa.Table) -> pa.Table:
        ids = t.column("series_id").to_pylist()
        vals = t.column("values").to_pylist()
        out = []
        for sid, rows in zip(ids, vals):
            if not rows:
                out.append([])
                continue
            dims = len(rows[0])
            for r in rows:
                if len(r) != dims:
                    raise ValueError(
                        f"series {sid!r}: ragged row-major values "
                        f"(expected {dims} dims, got {len(r)})"
                    )
            # transpose observation-major -> dimension-major
            out.append(
                [[r[d] for r in rows] for d in range(dims)]
                if dims else []
            )
        cols = {name: t.column(name) for name in t.column_names}
        cols["values"] = pa.array(
            out, type=pa.list_(pa.list_(pa.float64()))
        )
        return pa.table(cols)

    return ds.map_batches(tx, batch_format="pyarrow")


def docs_to_multivariate(corpus, width: int = 8, layout: str = "column"):
    """Corpus Dataset (doc_id, tokens) -> multivariate series rows:
    dim 0 = per-window token mean (the standard target series), dim 1 =
    per-window token count (a covariate dimension the models must ignore
    per the primary_values() contract).

    ``layout="row"`` emits observation-major values (``values[t][d]``,
    the reference's ``ValueLayout::Row`` builder input) for pipelines
    that normalize via :func:`normalize_values_layout`."""
    if layout not in ("column", "row"):
        raise ValueError(f"unknown values layout {layout!r}")
    row_major = layout == "row"

    def tx(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        toks = t.column("tokens").to_pylist()
        out_id, out_vals, out_labels = [], [], []
        for doc, tk in zip(ids, toks):
            a = np.asarray(tk, dtype=np.int64)
            if a.size == 0:
                continue
            wid = np.arange(a.size) // width
            n_w = int(wid[-1]) + 1
            sums = np.zeros(n_w, dtype=np.int64)
            cnts = np.zeros(n_w, dtype=np.int64)
            np.add.at(sums, wid, a)
            np.add.at(cnts, wid, 1)
            mean = sums.astype(np.float64) / cnts
            out_id.append(str(doc))
            cols = [mean.tolist(), cnts.astype(np.float64).tolist()]
            if row_major:  # values[t][d] (ValueLayout::Row builder input)
                out_vals.append([list(obs) for obs in zip(*cols)])
            else:  # values[d][t] (canonical column-major)
                out_vals.append(cols)
            out_labels.append(["token_mean", "token_count"])
        return pa.table(
            {
                "series_id": pa.array(out_id, type=pa.string()),
                "values": pa.array(
                    out_vals, type=pa.list_(pa.list_(pa.float64()))
                ),
                "dim_labels": pa.array(
                    out_labels, type=pa.list_(pa.string())
                ),
            }
        )

    return corpus.map_batches(tx, batch_format="pyarrow")


from ..models import OPTIMIZER_MODELS as _OPTIMIZER_MODELS  # noqa: E402


def multivariate_forecast(ds, models, horizon: int = 1,
                          concurrency: int | None = None):
    """Multivariate Dataset -> per-series forecasts on the primary dim.

    Dispatch follows the ann.py/lm.py convention (ADVICE r4):
    ``concurrency=None`` (default) picks the measured-best pool per
    model set — closed-form models ship a pre-built instance into a
    TASK pool (fit() fully overwrites state, so the serialized instance
    is reused safely per task; actor-pool spin-up costs ~1 s that
    closed-form fits never amortize), optimizer models get an actor
    pool of 4 (their per-series NM fits amortize the spin-up and reuse
    per-actor model objects). An EXPLICIT int always pins an actor pool
    of that size, for callers using concurrency as a resource cap."""
    if concurrency is None:
        if any(n in _OPTIMIZER_MODELS for n, _ in models):
            concurrency = 4
        else:
            return ds.map_batches(
                MultivariateForecast(tuple(models), horizon),
                batch_format="pyarrow",
            )
    return ds.map_batches(
        MultivariateForecast,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(tuple(models), horizon),
    )
