"""Engine configuration: retention tiers, window widths, scale knobs.

The north-star layout is ``raw -> 1m -> 1h -> 1d`` (window widths 1 / 60 /
3600 / 86400 positions; position i in a ``tokens`` array == time step i,
unit spacing — the reference legitimizes integer-indexed series via
``Frequency::from_step``, src/core/time_series.rs:90-92).

Tier widths are configurable because the sf0.01 correctness corpus has
series of only a few hundred points: ``SMALL_TIERS`` keeps several windows
per doc at every tier so the compaction math is actually exercised.

Invariant that makes the engine shuffle-free and bitwise-reproducible: every
coarser tier width is an integer multiple of every finer one, and the
long-doc chunking stride is a multiple of the coarsest width — so each
output window is wholly contained in one chunk of one row, and integer
(int64) partial aggregates compose associatively with no float-order issues
(SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TierSpec:
    name: str
    width: int  # window width in positions (time steps)


# North-star production tiers (positions == seconds for a 1-per-second feed).
DEFAULT_TIERS: tuple[TierSpec, ...] = (
    TierSpec("1m", 60),
    TierSpec("1h", 3600),
    TierSpec("1d", 86400),
)

# Small-scale tiers for the testdata-derived corpus (n_tok ~ 48..553 chars):
# several windows per doc at each tier; 8 | 32 | 128 keep the multiple-of
# invariant (32 = 4*8, 128 = 4*32).
SMALL_TIERS: tuple[TierSpec, ...] = (
    TierSpec("w8", 8),
    TierSpec("w32", 32),
    TierSpec("w128", 128),
)


def validate_tiers(tiers: tuple[TierSpec, ...]) -> None:
    widths = [t.width for t in tiers]
    if sorted(widths) != widths:
        raise ValueError(f"tier widths must be ascending: {widths}")
    for fine, coarse in zip(widths, widths[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"coarser tier width {coarse} must be a multiple of finer {fine}"
            )


@dataclass
class EngineConfig:
    tiers: tuple[TierSpec, ...] = DEFAULT_TIERS
    include_raw: bool = False          # raw tier = width-1 identity windows
    # rows (docs) per map_batches call. Sized so a task is ~100-500 ms of
    # vectorized kernel work: Ray bundles read blocks up to batch_size
    # rows per task, so an oversized batch CAPS STAGE PARALLELISM — at
    # 4096 a 30k-doc corpus ran the forecast/gorilla stages as 7 tasks on
    # a 32-cpu box (measured 5.15 -> 3.46 s flagship e2e after the change,
    # 1.74 -> 0.93 s at sf0.1). At 100 TB the same math holds per node:
    # tasks must outnumber cores by >= 4x for the scheduler to pack.
    batch_size: int = 1024
    # Long-doc salting: a doc with n_tok > chunk_stride is exploded into
    # chunk rows before rollup. The stride MUST be a multiple of the
    # coarsest tier width so every window stays inside one chunk.
    chunk_stride_windows: int = 16     # stride = coarsest_width * this
    forecast_concurrency: int | None = 8  # max concurrent forecast tasks
    # Heavy per-series optimizers (NM-fit ETS/theta/ARIMA families) need
    # MANY SMALL tasks to spread across the box: per-doc fit cost is ~ms,
    # so a 4096-doc batch serializes seconds of compute into one task.
    # Default 128 docs ~= 100 ms/task for the cheap closed-form flagship
    # models; heavy-optimizer query paths override to 16.
    # None -> fall back to batch_size.
    forecast_batch_size: int | None = 128
    forecast_horizon: int = 1
    interval_level: float = 0.95

    def __post_init__(self) -> None:
        validate_tiers(self.tiers)

    @property
    def chunk_stride(self) -> int:
        return self.tiers[-1].width * self.chunk_stride_windows
