"""Flagship pipeline: tiered rollup + downsample + retention engine.

    read_parquet(corpus)
      -> ExplodeChunks (aligned long-doc split, zero-merge)
      -> tier rollups (in-row, no shuffle) -> write out/rollup/shard=K (per tier)
      -> source_rollup (the one genuine groupby shuffle) -> out/source_rollup
      -> ForecastFromTokens actor pool -> out/forecast/shard=K
      -> GorillaFromTokens -> out/gorilla/shard=K
    with per-shard lineage manifests and checkpointed resume.

Everything streams EXCEPT one deliberate per-shard checkpoint: the
tokenized corpus is materialized ONCE into the object store and shared by
the rollup / forecast / gorilla consumers (``share_corpus_read=True``,
round-3 change) — previously each of the three stages re-read and
re-tokenized the shard from parquet, tripling scan volume at 100 TB. A
shard is the unit of resume, so the checkpoint is bounded by shard size
(the object store spills if a shard exceeds memory); outputs land via
write_parquet and only the tiny source aggregates are collected.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from ..config import EngineConfig
from ..stages.forecast import DEFAULT_MODELS, forecast_corpus
from ..stages.gorilla_stage import gorilla_from_corpus
from ..stages.rollup import rollup_dataset
from ..stages.source_rollup import (finalize_source_window,
                                    source_doc_stats,
                                    source_window_partials)
from ..state.lineage import finished_shards, shard_inputs, write_lineage

logger = logging.getLogger(__name__)


def _materialize_corpus(ds):
    """Seam for the shard read+checkpoint (tests patch this to inject
    prefetch-thread failures deterministically)."""
    return ds.materialize()


def run_flagship(
    input_files: list[str] | str,
    out_dir: str,
    cfg: EngineConfig | None = None,
    n_shards: int = 1,
    models=DEFAULT_MODELS,
    resume: bool = True,
    with_forecast: bool = True,
    with_gorilla: bool = True,
    parallel_stages: bool = True,
    input_format: str = "corpus",
    share_corpus_read: bool = True,
) -> dict:
    """Run the full engine; returns summary metrics per stage.

    ``input_format``: "corpus" = pre-tokenized (doc_id, tokens:list<int32>,
    n_tok, source) — the input_hint shape; "documents" = raw (doc_id, text,
    source, n_chars) tables, tokenized on read (codepoint tokens, n_chars
    is the exact token count)."""
    import ray.data as rd

    if input_format not in ("corpus", "documents"):
        raise ValueError(f"unknown input_format {input_format!r}")
    from_docs = input_format == "documents"
    cfg = cfg or EngineConfig()
    if isinstance(input_files, str):
        input_files = [input_files]
    shards = shard_inputs(list(input_files), n_shards)
    done = finished_shards(out_dir) if resume else set()
    summary = {"shards_total": len(shards), "shards_skipped": len(done),
               "rollup_rows": 0, "forecast_rows": 0, "gorilla_rows": 0,
               "token_count": 0, "doc_count": 0}

    def _read(files, **kw):
        import ray

        if isinstance(files, str):
            files = [files]
        # the row-group path forwards only `columns`; any new kwarg must
        # be wired through read_parquet_rowgroups too, not silently lost
        # (a hard raise, not assert: must survive `python -O`)
        if not set(kw) <= {"columns"}:
            raise ValueError(f"unsupported _read kwargs: {sorted(kw)}")
        blocks = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
        if len(files) < blocks:
            # fewer files than target read tasks: read_parquet would pin
            # each file to ONE task (SplitBlocks splits output, not work),
            # serializing the scan — fan out by row group instead
            from ..sources.parquet_rowgroups import read_parquet_rowgroups

            return read_parquet_rowgroups(
                files, columns=kw.get("columns"), target_units=blocks
            )
        return rd.read_parquet(files, override_num_blocks=blocks, **kw)

    def _read_corpus(files):
        """Corpus-shaped Dataset regardless of input_format."""
        if not from_docs:
            return _read(files)
        from ..corpus import tokens_from_text_batch

        return _read(files, columns=["doc_id", "text", "source"]).map_batches(
            tokens_from_text_batch, batch_format="pyarrow"
        )

    _len_col = "n_chars" if from_docs else "n_tok"

    def _count_written(path: str) -> int:
        """Row count from parquet footers only — no Ray execution."""
        import pyarrow.dataset as pads

        return sum(
            frag.metadata.num_rows
            for frag in pads.dataset(path, format="parquet").get_fragments()
        )

    stage_sec: dict[str, float] = {}
    summary["stage_sec"] = stage_sec

    def _timed(name, fn):
        t0 = time.time()
        out = fn()
        stage_sec[name] = round(stage_sec.get(name, 0.0) + time.time() - t0, 3)
        return out

    from concurrent.futures import ThreadPoolExecutor

    _install_fsspec_http_stub()

    # cross-shard source aggregates (small, bounded cardinality): each
    # shard writes one bounded INT partial table, derived from ITS OWN
    # just-written rollup dir (page-cache warm, overlapped with the
    # forecast/gorilla executions), and the final source_rollup is a
    # merge of those tiny partials. The int (cnt,sum,min,max) semigroup
    # + mean-derived-last makes this bitwise-equal to one aggregation
    # over every written rollup row — which at 100 TB would be a full
    # re-read of ~1/8 corpus volume concentrated in a serial tail.
    source_jobs_done = {"rollup": False, "stats": False}

    def _partials_path(sid: int) -> str:
        return os.path.join(out_dir, "source_partials",
                            f"shard-{sid}.parquet")

    def _partial_from_rollup_dir(sid: int):
        """Bounded int partial from one shard's written rollup dir —
        1/8 the shard's token volume, page-cache-warm right after the
        rollup write (and the ONLY route for shards finished by an
        older engine version, which have no partial file)."""
        return source_window_partials(
            _read(
                os.path.join(out_dir, "rollup", f"shard={sid}"),
                columns=["source", "tier", "window_id",
                         "cnt", "sum", "min", "max"],
            ).map_batches(_restore_tier_column, batch_format="pyarrow")
        )

    def _shard_source_partial_job(sid: int):
        import pyarrow.parquet as pq

        part = _timed(
            "source_partials", lambda: _partial_from_rollup_dir(sid)
        )
        os.makedirs(os.path.join(out_dir, "source_partials"), exist_ok=True)
        pq.write_table(part, _partials_path(sid))

    def _source_rollup_job():
        """Merge per-shard partials; shards without a partial on disk
        fall back to aggregating only THAT shard's written rollup."""
        import pyarrow.parquet as pq

        def _merge():
            import shutil as _sh

            # write_parquet appends: a resume re-run must not stack a
            # second copy of the final table into the output dir
            _sh.rmtree(os.path.join(out_dir, "source_rollup"),
                       ignore_errors=True)
            parts = []
            for sid in range(len(shards)):
                p = _partials_path(sid)
                if os.path.exists(p):
                    parts.append(pq.read_table(p))
                elif os.path.isdir(
                    os.path.join(out_dir, "rollup", f"shard={sid}")
                ):
                    parts.append(_partial_from_rollup_dir(sid))
                else:
                    # a resume-finished shard whose outputs were pruned
                    # out-of-band would otherwise vanish silently from
                    # the merged aggregate
                    logger.warning(
                        "source_rollup: shard %d contributes neither a "
                        "partial file nor a rollup dir; omitted", sid
                    )
                    summary["source_partials_missing"] = (
                        summary.get("source_partials_missing", 0) + 1
                    )
            finalize_source_window(parts).write_parquet(
                os.path.join(out_dir, "source_rollup")
            )

        _timed("source_rollup", _merge)

    def _source_stats_job():
        def _ds():
            ds = _read(sorted(input_files), columns=["source", _len_col])
            if from_docs:
                ds = ds.map_batches(
                    lambda t: t.rename_columns(["source", "n_tok"]),
                    batch_format="pyarrow",
                )
            return ds

        import shutil as _sh

        _sh.rmtree(os.path.join(out_dir, "source_doc_stats"),
                   ignore_errors=True)
        _timed(
            "source_doc_stats",
            lambda: source_doc_stats(_ds()).write_parquet(
                os.path.join(out_dir, "source_doc_stats")
            ),
        )

    n_consumers = 1 + int(with_forecast) + int(with_gorilla)
    share = share_corpus_read and n_consumers > 1
    pending = [(sid, fs) for sid, fs in enumerate(shards) if sid not in done]
    # depth-1 shard prefetch: while shard N's consumers run, shard N+1's
    # corpus is read+materialized by a pool thread, so the per-shard
    # barrier (read planning + object-store checkpoint) overlaps compute
    # instead of draining the cluster between shards. Object store holds
    # at most TWO shards' decoded corpora (the resume unit bounds both).
    prefetched: dict[int, object] = {}

    for pos, (shard_id, files) in enumerate(pending):
        # A shard without a lineage record may still have PARTIAL output
        # from a killed run; write_parquet appends new files, so replaying
        # over the remnants would duplicate rows. Lineage is written last,
        # so any output under an unfinished shard is safe to delete.
        import shutil as _shutil

        for sub in ("rollup", "forecast", "gorilla"):
            _shutil.rmtree(
                os.path.join(out_dir, sub, f"shard={shard_id}"),
                ignore_errors=True,
            )
        try:
            os.remove(_partials_path(shard_id))
        except OSError:
            pass
        started = time.time()
        row_counts: dict[str, int] = {}

        # One tokenized read, three consumers: materialize the shard's
        # corpus into the object store so rollup/forecast/gorilla share
        # the decoded blocks zero-copy instead of each re-reading (and,
        # in documents mode, re-tokenizing) the same parquet. Skipped
        # when only one consumer runs — streaming straight off the read
        # avoids the checkpoint barrier there.
        shared = prefetched.pop(shard_id, None)
        if share and shared is None:
            shared = _timed(
                "corpus_read",
                lambda: _materialize_corpus(_read_corpus(files)),
            )

        def _corpus():
            return shared if shared is not None else _read_corpus(files)

        # The three corpus passes are independent — run them as concurrent
        # Dataset executions so the cluster stays packed through each
        # stage's serial sections (read planning, final writes). The
        # streaming executor schedules them against the same CPU pool.
        def _rollup_job():
            p = os.path.join(out_dir, "rollup", f"shard={shard_id}")
            _timed(
                "rollup",
                lambda: rollup_dataset(_corpus(), cfg).write_parquet(
                    p, partition_cols=["tier"]
                ),
            )
            row_counts["rollup"] = _count_written(p)

        def _forecast_job():
            p = os.path.join(out_dir, "forecast", f"shard={shard_id}")
            _timed(
                "forecast",
                lambda: forecast_corpus(_corpus(), cfg, models).write_parquet(p),
            )
            row_counts["forecast"] = _count_written(p)

        def _gorilla_job():
            p = os.path.join(out_dir, "gorilla", f"shard={shard_id}")
            _timed(
                "gorilla",
                lambda: gorilla_from_corpus(_corpus(), cfg).write_parquet(p),
            )
            row_counts["gorilla"] = _count_written(p)

        is_first_run = not source_jobs_done["stats"]
        is_last_pending = pos == len(pending) - 1

        def _rollup_then_partial_job():
            # the shard's bounded source partial derives from the rollup
            # rows just written (1/8 token volume, page-cache warm), so
            # it chains after the rollup write in the same thread —
            # overlapping the longer forecast/gorilla executions. On the
            # last pending shard the final merge chains here too (every
            # other partial is already on disk).
            _rollup_job()
            _shard_source_partial_job(shard_id)
            if is_last_pending:
                _source_rollup_job()
                source_jobs_done["rollup"] = True

        # token/doc counts straight off the input footers + n_tok column —
        # independent of the consumer outputs, so it runs in the job pool
        counts = {"token_count": 0, "doc_count": 0}

        def _count_job():
            import pyarrow.parquet as pq

            for f in files:
                t = pq.read_table(f, columns=[_len_col])
                counts["token_count"] += int(
                    t.column(_len_col).to_numpy(zero_copy_only=False)
                    .astype(np.int64).sum()
                )
                counts["doc_count"] += t.num_rows

        def _prefetch_job():
            if share and pos + 1 < len(pending):
                nid, nfiles = pending[pos + 1]
                try:
                    prefetched[nid] = _timed(
                        "corpus_prefetch",
                        lambda: _materialize_corpus(_read_corpus(nfiles)),
                    )
                except Exception as e:
                    # a bad NEXT shard must not abort THIS shard before
                    # its lineage is written — the next iteration's
                    # synchronous read surfaces the real error. Count it
                    # so a silently-serial run is visible in the summary.
                    summary["prefetch_failures"] = (
                        summary.get("prefetch_failures", 0) + 1
                    )
                    import logging

                    logging.getLogger(__name__).warning(
                        "shard %d prefetch failed (%s: %s); falling back "
                        "to the synchronous read", nid, type(e).__name__, e
                    )

        jobs = [_rollup_then_partial_job]
        if with_forecast:
            jobs.append(_forecast_job)
        if with_gorilla:
            jobs.append(_gorilla_job)
        if is_first_run:
            # source_doc_stats only reads the raw input: fully independent
            jobs.append(_source_stats_job)
            source_jobs_done["stats"] = True
        jobs.append(_count_job)
        if parallel_stages and len(jobs) > 1:
            jobs.append(_prefetch_job)
            with ThreadPoolExecutor(len(jobs)) as ex:
                futs = [ex.submit(j) for j in jobs]
                for f in futs:
                    f.result()
        else:
            for j in jobs:
                j()

        token_count = counts["token_count"]
        doc_count = counts["doc_count"]
        write_lineage(out_dir, shard_id, files, row_counts, token_count, started)
        summary["rollup_rows"] += row_counts.get("rollup", 0)
        summary["forecast_rows"] += row_counts.get("forecast", 0)
        summary["gorilla_rows"] += row_counts.get("gorilla", 0)
        summary["token_count"] += token_count
        summary["doc_count"] += doc_count

    # Fallback (e.g. every shard was resume-skipped): the source stages
    # normally run inside the shard job pools above, overlapped with the
    # forecast/gorilla executions.
    if not source_jobs_done["rollup"]:
        _source_rollup_job()
    if not source_jobs_done["stats"]:
        _source_stats_job()
    return summary


def _install_fsspec_http_stub() -> None:
    """Make ``fsspec.implementations.http`` importable exactly once.

    Without aiohttp the module fails to import EVERY time Ray's
    path_util probes it (per read/write call); concurrent probes from
    stage threads race mid-failure and surface as a plain ImportError,
    which Ray does not catch (it only catches ModuleNotFoundError). A
    cached stub with an isinstance-only HTTPFileSystem ends the retries.
    """
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # isinstance probe target only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations as _fi

        _fi.http = mod
    except ImportError:
        pass


def _restore_tier_column(t):
    """Hive-partitioned rollup reads bring `tier` back as a partition
    column; normalize its position/type."""
    import pyarrow as pa

    cols = {name: t.column(name) for name in t.column_names}
    cols["tier"] = cols["tier"].cast(pa.string())
    return pa.table(cols)
