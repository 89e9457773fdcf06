"""Consumer-side retention reads: range-pruned access to the tiered store.

The write side lays out ``out/rollup/shard=K/tier=X/*.parquet`` and
``out/gorilla/shard=K/*.parquet``. These helpers are the query side:

- ``read_rollup``: tier + window-range reads with hive-partition pruning
  (tier) and parquet predicate pushdown (window_id) — only matching
  row groups leave storage.
- ``read_series``: one doc's rolled-up series from the compact Gorilla
  blobs (decode only the requested doc's blob).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


def read_rollup(
    out_dir: str,
    tier: str | None = None,
    window_range: tuple[int, int] | None = None,
    columns=None,
):
    """Ray Dataset over the rollup store, pruned at the read."""
    import glob

    import ray.data as rd

    root = os.path.join(out_dir, "rollup")
    if tier is not None:
        # tier is a hive partition: select it by PATH (no bytes read from
        # other tiers at all — stronger than a filter)
        paths = sorted(
            glob.glob(os.path.join(root, "shard=*", f"tier={tier}", "*.parquet"))
        )
        if not paths:
            raise FileNotFoundError(f"no tier={tier} under {root}")
    else:
        paths = [root]
    flt = None
    if window_range is not None:
        lo, hi = window_range
        flt = (pc.field("window_id") >= lo) & (pc.field("window_id") <= hi)
    ds = rd.read_parquet(paths, filter=flt, columns=columns)
    if tier is not None and columns is None:
        import pyarrow as _pa

        def norm(t: _pa.Table) -> _pa.Table:
            # the reader may or may not infer hive columns from file paths;
            # normalize to exactly one string `tier` column
            cols = {}
            for name in t.column_names:
                if name in ("tier", "shard") and name in cols:
                    continue
                cols[name] = t.column(name)
            if "tier" in cols:
                cols["tier"] = cols["tier"].cast(_pa.string())
            else:
                cols["tier"] = _pa.array([tier] * t.num_rows, type=_pa.string())
            cols.pop("shard", None)
            return _pa.table(cols)

        ds = ds.map_batches(norm, batch_format="pyarrow")
    return ds


def apply_retention(out_dir: str, tier: str, keep_last: int,
                    columns=None):
    """Per-doc last-``keep_last``-windows retention over one tier of the
    store: the expiry half of the downsample/retention policy (fine
    tiers keep short history, coarse tiers keep long history).

    Shuffle shape: the store rows never move. Pass 1 computes the
    per-doc max window as a per-batch Arrow partial reduced on the
    driver (small side: one int per doc); pass 2 ``ray.put``-broadcasts
    the cutoff map into a vectorized filter ``map_batches``. At 100 TB
    the store is sharded by input shard (flagship layout), so the map
    this broadcasts is per-shard-bounded; a doc's windows never span
    shards."""
    import ray

    ds = read_rollup(out_dir, tier=tier, columns=columns)

    def partial_max(t: pa.Table) -> pa.Table:
        return t.group_by("doc_id").aggregate([("window_id", "max")])

    small = pa.concat_tables(
        ray.get(
            ds.map_batches(partial_max, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    final = small.group_by("doc_id").aggregate([("window_id_max", "max")])
    cutoff = {
        d: int(m) - keep_last + 1
        for d, m in zip(final.column("doc_id").to_pylist(),
                        final.column("window_id_max_max").to_pylist())
    }
    ref = ray.put(cutoff)

    def filt(t: pa.Table) -> pa.Table:
        co = ray.get(ref)
        w = t.column("window_id").to_numpy(zero_copy_only=False)
        lo = np.array([co[d] for d in t.column("doc_id").to_pylist()],
                      dtype=np.int64)
        return t.filter(pa.array(w >= lo))

    return ds.map_batches(filt, batch_format="pyarrow")


def read_series(out_dir: str, doc_id: str, tier: str):
    """Decode one doc's tier series from its Gorilla blob.

    Returns (window_ids:int64, values:float64). Reads only the gorilla
    rows matching (doc_id, tier) — a point lookup against the compact
    retention format.
    """
    from ..kernels.gorilla import gorilla_decode_many

    ds = pads.dataset(
        os.path.join(out_dir, "gorilla"), format="parquet", partitioning="hive"
    )
    t = ds.to_table(
        filter=(pc.field("doc_id") == doc_id) & (pc.field("tier") == tier),
        columns=["blob", "n_pts"],
    )
    if t.num_rows == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    _, wids, vals = gorilla_decode_many(
        [b.as_py() for b in t.column("blob")]
    )
    order = np.argsort(wids)
    return wids[order], vals[order]
