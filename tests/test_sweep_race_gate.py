"""Pin the Ray 2.49 TaskManager-race signature that tools/sweep_all.py
works around, and version-gate the workaround.

The race (`task_manager.cc:930` / `reference_count.cc:581` check-fail)
aborts a long single-process sweep ~50% of the time with zero
query-level failures; sweep_all runs the gate in chunked fresh
processes with per-name retry. These tests (a) pin the signature
classification so a FAIL caused by the race is retried, never recorded
as a wrong answer, and (b) fail loudly on a Ray upgrade so the
workaround is re-evaluated (and possibly retired) instead of silently
outliving its reason.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from sweep_all import GREEN, RACE_RE, parse_verdicts  # noqa: E402

# the exact signatures observed from the Ray 2.49 race, verbatim from
# crashed sweep logs (NOTES.md round-3)
KNOWN_RACE_LINES = [
    "FAIL rollup_w8: engine raised RaySystemError: System error: "
    "Broken pipe",
    "FAIL doc_ppl_buckets: engine raised RayError: task died "
    "unexpectedly",
    "FAIL forecast_ses_w8: Check failed: it != submissible_tasks_.end() "
    "task_manager.cc:930",
    "FAIL dedup_exact: engine raised ActorDiedError: the actor died "
    "before completing",
    "FAIL lang_id: reference_count.cc:581 check-fail",
    "FAIL token_counts: engine raised ObjectLostError: object lost",
]

# genuine wrong-answer verdicts must NOT match the race signature;
# value mismatches are TERMINAL (never retried to green), while an
# unrecognized in-query exception is "FAIL-EXC" (one fresh re-check)
REAL_FAIL_LINES = [
    "FAIL rollup_w8: hash mismatch (col 'sum' row 17: 12 != 13)",
    "FAIL doc_standardize: rows 499 != 500",
    "FAIL lang_id: schema mismatch: int32 vs int64",
]
EXC_FAIL_LINE = "FAIL events_outliers: engine raised ValueError: bad window"


def test_race_signatures_marked_flaky():
    out = "\n".join(KNOWN_RACE_LINES)
    seen, flaky = parse_verdicts(out)
    assert seen == {}, f"race lines must not produce verdicts: {seen}"
    assert set(flaky) == {
        "rollup_w8", "doc_ppl_buckets", "forecast_ses_w8", "dedup_exact",
        "lang_id", "token_counts",
    }
    # ADVICE r4: the suppressed detail must survive for diagnosis
    assert all(isinstance(d, str) and d for d in flaky.values())


def test_multiline_race_detail_marked_flaky():
    """Ray exception strings are multi-line; the signature usually sits
    BELOW the first line of the FAIL detail."""
    out = (
        "FAIL rollup_w8: engine raised RayTaskError: ray::MapBatches()\n"
        "  File worker.py, line 123\n"
        "  The worker died unexpectedly while executing this task\n"
        "OK lang_id: 500 rows hash-match\n"
    )
    seen, flaky = parse_verdicts(out)
    assert set(flaky) == {"rollup_w8"}
    assert "died unexpectedly" in flaky["rollup_w8"]
    assert seen == {"lang_id": "OK"}


def test_value_mismatches_terminal_exceptions_once_retried():
    out = "\n".join(REAL_FAIL_LINES + [EXC_FAIL_LINE])
    seen, flaky = parse_verdicts(out)
    assert flaky == {}, f"real failures wrongly marked flaky: {flaky}"
    # hash/rows/schema mismatches are terminal FAIL — a nondeterministic
    # wrong answer must never be retried into a green sweep
    assert [seen[n] for n in ("rollup_w8", "doc_standardize", "lang_id")] \
        == ["FAIL", "FAIL", "FAIL"]
    # an unrecognized exception gets one fresh-process re-check
    assert seen["events_outliers"] == "FAIL-EXC"


def test_green_verdicts_parse():
    out = (
        "OK rollup_w8: 18855 rows hash-match\n"
        "GOLDEN-OK forecast_mfles_w8: snapshot match\n"
        "rows-only streaming_thing: 42 rows\n"
    )
    seen, flaky = parse_verdicts(out)
    assert seen == {
        "rollup_w8": "OK",
        "forecast_mfles_w8": "OK",
        "streaming_thing": "OK",
    }
    assert flaky == {}
    assert GREEN == {"OK", "GOLDEN-OK", "rows-only"}


def test_ray_version_gate():
    """sweep_all's chunked-fresh-process workaround exists for the Ray
    2.49 TaskManager race. On a Ray upgrade this test fails on purpose:
    re-run a few single-process 732-query sweeps on the new Ray; if the
    check-fail is gone, retire the chunking (keep per-name retry) and
    bump the version pin here. See CLAUDE.md + NOTES.md round-3."""
    import ray

    assert ray.__version__.startswith("2.49."), (
        f"Ray upgraded to {ray.__version__}: re-evaluate the "
        "sweep_all.py chunked-process workaround for the 2.49 "
        "TaskManager race (task_manager.cc:930 / reference_count.cc:581) "
        "before bumping this pin."
    )
    # the signature regex must keep matching the pinned crash strings
    assert RACE_RE.search("task_manager.cc:930")
    assert RACE_RE.search("reference_count.cc:581")
