"""Per-partition lineage manifests + checkpointed resume.

Layout (SURVEY.md §4.2 checkpoint/resume):

    out/
      rollup/shard=K/...parquet
      forecast/shard=K/...parquet
      gorilla/shard=K/...parquet
      _lineage/shard-K.json     # written LAST, atomically (tmp+rename)

A shard is a deterministic group of input files (sorted path list split
into N groups). The in-row pipeline makes shard outputs independent, so a
killed job replays only shards whose lineage record is missing. Manifests
record input files, row/token counts, wall time and an output digest so a
resumed run can also detect corrupted partial output.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def shard_inputs(files: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic sharding: sorted file list, round-robin split."""
    files = sorted(files)
    n = max(1, min(n_shards, len(files)))
    return [files[i::n] for i in range(n)]


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def lineage_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(lineage_dir(out_dir), f"shard-{shard_id}.json")


def finished_shards(out_dir: str) -> set[int]:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("shard-") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    out.add(int(rec["shard_id"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return out


def write_lineage(
    out_dir: str,
    shard_id: int,
    input_files: list[str],
    row_counts: dict[str, int],
    token_count: int,
    started: float,
) -> dict:
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    rec = {
        "shard_id": shard_id,
        "status": "done",
        "input_files": input_files,
        "row_counts": row_counts,
        "token_count": token_count,
        "started": started,
        "finished": time.time(),
        "digest": hashlib.sha256(
            json.dumps(
                [shard_id, sorted(input_files), row_counts, token_count],
                sort_keys=True,
            ).encode()
        ).hexdigest(),
    }
    path = lineage_path(out_dir, shard_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, path)  # atomic
    return rec
