"""anofox_forecast_ray — a Ray-Data-native time-series rollup / downsample /
retention engine with the query and forecasting capabilities of the
``sipemu/anofox-forecast`` reference (Rust), rebuilt from scratch on
``ray.data.Dataset`` + zero-copy Arrow batches.

Layout
------
- ``kernels/``   pure-NumPy numeric kernels (rollup, gap-fill, smoothing,
                 baseline/theta models, rolling windows, Gorilla codec, ...)
- ``models/``    ``Forecaster`` ABC + registry (reference: src/models/traits.rs)
- ``stages/``    Ray Data stage factories (map_batches / groupby compositions)
- ``pipelines/`` end-to-end pipelines (flagship rollup->forecast->gorilla)
- ``state/``     per-partition lineage manifests + checkpointed resume
- ``extras/``    large-scale training-data ops: dedup, ANN, text stats,
                 multimodal stubs

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (bench.py, CLI, test fixture, or the evaluation driver).
"""

__version__ = "0.1.0"

from .config import TierSpec, DEFAULT_TIERS, SMALL_TIERS  # noqa: F401
