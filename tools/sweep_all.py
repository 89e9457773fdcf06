"""Crash-resilient full-gate sweep: run every queries() entry vs its
oracle in CHUNKS, each chunk in a fresh subprocess.

Ray 2.49 has a rare TaskManager race (`task_manager.cc:930` check-fail,
also seen as `reference_count.cc:581`) that aborts the whole process
mid-run roughly once per several hundred dataset executions. A full
732-query sweep in one process therefore dies ~50% of the time with
zero query-level failures. This wrapper makes the sweep a non-event:

- splits the registry into chunks (default 40 names),
- runs ``tools/check_queries.py`` per chunk in a fresh process,
- on a crashed chunk, re-runs only the names that had not printed a
  verdict yet (up to ``--retries`` times; the flake is not sticky),
- aggregates one JSON summary to stdout + ``--out``.

Usage (options are --name=value ONLY; bare tokens are query names):
  PYTHONPATH=/root/repo python tools/sweep_all.py [sf_dir] [name...] \
      [--chunk=N] [--retries=K] [--out=/tmp/sweep.json]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

OK_RE = re.compile(r"^(OK|GOLDEN-OK|rows-only|FAIL)\s+(\S+):(.*)$", re.M)
# every verdict except FAIL counts as green (GOLDEN-OK / rows-only are
# the weaker driver verdicts for non-SQL queries; all 732 currently
# carry SQL or snapshot oracles so in practice everything prints OK)
GREEN = {"OK", "GOLDEN-OK", "rows-only"}
# the Ray 2.49 TaskManager race usually aborts the process, but can
# surface as an in-query exception instead — a FAIL whose detail matches
# this signature is a transient flake, not a wrong answer, and must be
# retried rather than recorded as a permanent FAIL
RACE_RE = re.compile(
    r"RayError|RaySystemError|ActorDiedError|ActorUnavailableError|"
    r"OwnerDiedError|ObjectLostError|Check failed|check-fail|"
    r"task_manager|reference_count|died unexpectedly|IOError: Broken pipe",
    re.I,
)


def all_query_names() -> list[str]:
    sys.path.insert(0, REPO)
    from anofox_forecast_ray.pipelines.queries import build_queries

    qs, _ = build_queries()
    return sorted(qs)


def parse_verdicts(out: str) -> tuple[dict[str, str], dict[str, str]]:
    """Parse check_queries output into ({name: 'OK'|'FAIL'}, flaky_names).

    A FAIL whose detail matches RACE_RE is returned in ``flaky`` (and NOT
    in the verdict dict) so the caller retries it instead of recording a
    transient Ray-race exception as a wrong answer. The race signature is
    searched over the FULL span from the FAIL line to the next verdict
    line — Ray exception strings are multi-line, and the signature
    usually sits below the first line. A FAIL that is an exception
    ("engine raised ...") but matches no known signature is recorded as
    "FAIL-EXC": an infra-shaped failure eligible for ONE fresh-process
    re-check; a value mismatch (hash/rows/schema) is terminal and never
    retried to green.
    """
    seen: dict[str, str] = {}
    flaky: dict[str, str] = {}
    matches = list(OK_RE.finditer(out))
    for i, m in enumerate(matches):
        verdict, name = m.group(1), m.group(2)
        span_end = matches[i + 1].start() if i + 1 < len(matches) else len(out)
        detail = out[m.start(3):span_end]
        if verdict == "FAIL":
            if RACE_RE.search(detail):
                # keep the suppressed detail: if a "flake" repeats, the
                # signature that triggered the classification must be
                # diagnosable from the summary (ADVICE r4)
                flaky[name] = detail.strip()[:500]
                continue
            if ("engine raised" in detail or "oracle raised" in detail
                    or "Traceback" in detail):
                seen[name] = "FAIL-EXC"
                continue
            seen[name] = "FAIL"
            continue
        seen[name] = "OK" if verdict in GREEN else "FAIL"
    return seen, flaky


def run_chunk(sf_dir: str, names: list[str], retries: int,
              flaky_log: dict[str, list[str]] | None = None) -> dict[str, str]:
    """Run one chunk; returns {name: 'OK'|'FAIL'|'CRASH'} per name.
    Race-classified FAIL details are appended to ``flaky_log`` so a
    repeating "flake" stays diagnosable from the summary JSON."""
    verdicts: dict[str, str] = {}
    todo = list(names)
    for attempt in range(retries + 1):
        if not todo:
            break
        env = dict(os.environ, PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_queries.py"), sf_dir]
            + todo,
            capture_output=True, text=True, env=env,
        )
        # parse the two streams separately: verdict lines print to
        # stdout, and bounding the LAST verdict's detail span at the end
        # of ITS OWN stream stops unrelated stderr (e.g. a Ray race
        # crash dump after a genuine value-mismatch FAIL) from being
        # folded into that verdict's detail and reclassifying it
        seen, _flaky = parse_verdicts(proc.stdout)
        seen_err, flaky_err = parse_verdicts(proc.stderr)
        for n, v in seen_err.items():
            seen.setdefault(n, v)
        _flaky.update(flaky_err)
        if flaky_log is not None:
            for n, detail in _flaky.items():
                flaky_log.setdefault(n, []).append(detail)
        verdicts.update(seen)
        remaining = [n for n in todo if n not in seen]
        if proc.returncode == 0 and not remaining:
            return verdicts
        if remaining and attempt < retries:
            # process died (Ray race) or a name errored before printing;
            # retry only what has no verdict yet
            print(
                f"  chunk retry {attempt + 1}: rc={proc.returncode}, "
                f"{len(remaining)} names pending",
                file=sys.stderr, flush=True,
            )
        todo = remaining
    for n in todo:
        verdicts[n] = "CRASH"
    return verdicts


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bad_opts = [
        a for a in sys.argv[1:]
        if a.startswith("--")
        and not any(a.startswith(f"--{o}=") for o in ("chunk", "retries", "out"))
    ]
    if bad_opts:
        print(
            f"bad options {bad_opts}: use --chunk=N --retries=K --out=PATH "
            "(--name=value form only)",
            file=sys.stderr,
        )
        return 2
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    def opt(name, default):
        for a in sys.argv[1:]:
            if a.startswith(f"--{name}="):
                return a.split("=", 1)[1]
        return default

    chunk = int(opt("chunk", "40"))
    retries = int(opt("retries", "2"))
    out_path = opt("out", "/tmp/sweep_all.json")
    only = args[1:]

    registry = all_query_names()
    if only:
        unknown = sorted(set(only) - set(registry))
        if unknown:
            # a typo'd name would otherwise burn every retry and be
            # misreported as CRASH (check_queries skips unknown names)
            print(f"unknown query names: {unknown}", file=sys.stderr)
            return 2
    names = only or registry
    t0 = time.time()
    verdicts: dict[str, str] = {}
    flaky_log: dict[str, list[str]] = {}
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        verdicts.update(run_chunk(sf_dir, part, retries, flaky_log))
        n_ok = sum(1 for v in verdicts.values() if v == "OK")
        n_bad = len(verdicts) - n_ok
        print(
            f"[{len(verdicts)}/{len(names)}] ok={n_ok} bad={n_bad} "
            f"({time.time() - t0:.0f}s)",
            file=sys.stderr, flush=True,
        )
    # final safety net: EXCEPTION-shaped FAILs (engine raised / crash,
    # race signature not recognized) get ONE fresh-process re-check —
    # an infra transient must not masquerade as a wrong answer. Value
    # mismatches (hash/rows/schema FAILs) are terminal: retrying those
    # to green would hide nondeterministic wrong answers, the exact
    # defect class this gate exists to catch. Retried greens stay
    # visible in the summary.
    fails = sorted(n for n, v in verdicts.items() if v == "FAIL-EXC")
    retried_green = []
    if fails:
        print(f"re-checking {len(fails)} exception FAILs in a fresh "
              "process", file=sys.stderr, flush=True)
        recheck = run_chunk(sf_dir, fails, 1, flaky_log)
        for n, v in recheck.items():
            if v == "OK":
                verdicts[n] = "OK"
                retried_green.append(n)
    bad = sorted(n for n, v in verdicts.items() if v != "OK")
    summary = {
        "sf_dir": sf_dir,
        "total": len(names),
        "ok": len(names) - len(bad),
        "bad": {n: verdicts[n] for n in bad},
        "retried_green": retried_green,
        # suppressed FAIL details for every race-classified name — a
        # deterministic failure misclassified as a flake surfaces here
        # instead of being silently discarded (ADVICE r4)
        "flaky_details": flaky_log,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
