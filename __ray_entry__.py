"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship rollup pipeline on sf0.001.
``queries()``/``oracle_sql()`` expose the operator suite from
``anofox_forecast_ray.pipelines.queries`` — each query has a DuckDB oracle
over the same parquet tables where the semantics are SQL-expressible;
stateful/optimizer models and the Gorilla codec are rows-only.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived token
    corpus -> tiered rollup (driver checks rows >= 0, stable schema)."""
    from anofox_forecast_ray.config import EngineConfig, SMALL_TIERS
    from anofox_forecast_ray.pipelines.queries import corpus_ds
    from anofox_forecast_ray.stages.rollup import rollup_dataset

    cfg = EngineConfig(tiers=SMALL_TIERS)
    return rollup_dataset(corpus_ds("/root/testdata/sf0.001"), cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    from anofox_forecast_ray.pipelines.queries import build_queries

    q, _ = build_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from anofox_forecast_ray.pipelines.queries import build_queries

    _, sql = build_queries()
    return sql
