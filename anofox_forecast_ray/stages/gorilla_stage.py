"""Gorilla encode stage: rolled-up points -> compressed binary blobs.

Output schema (FIXTURES.md §2): doc_id, tier, blob:binary, n_pts:int64.
Ordering requirement: delta-of-delta needs strictly increasing window_ids
per series — guaranteed by sorting within the group before encoding
(SURVEY.md §7.4).

Two shapes, mirroring the forecast stage:
- ``gorilla_from_corpus``: in-row — tokens -> tier mean series -> blob in
  one map_batches, zero shuffle (the scale path).
- ``gorilla_grouped``: groupby(doc_id, tier) over aggregated rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, TierSpec
from ..kernels.gorilla import gorilla_encode, gorilla_encode_fast
from ..kernels.rollup import rollup_flat_tiers

# vectorized encoder wins above ~128 points; sequential below (call overhead)
_FAST_THRESHOLD = 128


def _encode(ts: np.ndarray, vals: np.ndarray) -> bytes:
    if ts.size >= _FAST_THRESHOLD:
        return gorilla_encode_fast(ts, vals)
    return gorilla_encode(ts, vals)


class GorillaFromTokens:
    def __init__(self, tiers: tuple[TierSpec, ...], value: str = "mean"):
        self.tiers = tiers
        self.value = value

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.gorilla import gorilla_encode_many
        from .rollup import _flat_tokens

        values, lengths = _flat_tokens(batch)
        doc_col = batch.column("doc_id").cast(pa.string())
        parts = []
        # one raw pass for the finest tier; coarser tiers compose from it
        # (bitwise-identical int semigroup — kernels/rollup.py)
        by_width = rollup_flat_tiers(
            values, lengths, [t.width for t in self.tiers]
        )
        for tier in self.tiers:
            r = by_width[tier.width]
            if self.value == "mean":
                series = r["sum"].astype(np.float64) / r["cnt"]
            else:
                series = r[self.value].astype(np.float64)
            ridx = r["row_idx"]
            if ridx.size == 0:
                continue
            bounds = np.flatnonzero(
                np.concatenate(([True], ridx[1:] != ridx[:-1]))
            )
            offsets = np.concatenate((bounds, [ridx.size]))
            # lockstep batch encoder: byte-identical to gorilla_encode
            # per lane (kernels/gorilla.py:gorilla_encode_many)
            blob_arr = gorilla_encode_many(r["window_id"], series, offsets)
            D = bounds.size
            parts.append(
                pa.table(
                    {
                        "doc_id": doc_col.take(pa.array(ridx[bounds])),
                        "tier": pa.array([tier.name] * D, type=pa.string()),
                        "blob": blob_arr,
                        "n_pts": pa.array(np.diff(offsets)),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "tier": pa.array([], type=pa.string()),
                    "blob": pa.array([], type=pa.binary()),
                    "n_pts": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(parts).combine_chunks()


def gorilla_from_corpus(ds, cfg: EngineConfig, value: str = "mean"):
    return ds.map_batches(
        GorillaFromTokens(cfg.tiers, value),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def make_gorilla_group_fn(value_col: str = "mean"):
    def fn(g: pa.Table) -> pa.Table:
        wid = g.column("window_id").to_numpy(zero_copy_only=False)
        order = np.argsort(wid, kind="stable")
        blob = _encode(
            wid[order].astype(np.int64),
            g.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[order],
        )
        doc = (g.column("doc_id")[0].as_py()
               if "doc_id" in g.column_names else "")
        tier = (g.column("tier")[0].as_py()
                if "tier" in g.column_names else "")
        return pa.table(
            {
                "doc_id": pa.array([doc], type=pa.string()),
                "tier": pa.array([tier], type=pa.string()),
                "blob": pa.array([blob], type=pa.binary()),
                "n_pts": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    return fn


def gorilla_grouped(ds, keys=("doc_id", "tier"), value_col: str = "mean"):
    return ds.groupby(list(keys)).map_groups(
        make_gorilla_group_fn(value_col), batch_format="pyarrow"
    )


def decode_blob_table(table: pa.Table):
    """Driver-side helper: decode blobs back to (doc_id, tier, window_id,
    value) rows for verification."""
    import numpy as np

    from ..kernels.gorilla import gorilla_decode_many

    off, wids, vals = gorilla_decode_many(table.column("blob").to_pylist())
    idx = pa.array(np.repeat(np.arange(table.num_rows, dtype=np.int64),
                             np.diff(off)))
    return pa.table(
        {
            "doc_id": table.column("doc_id").take(idx).cast(pa.string()),
            "tier": table.column("tier").take(idx).cast(pa.string()),
            "window_id": pa.array(wids, type=pa.int64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )
