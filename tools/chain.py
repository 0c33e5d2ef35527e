#!/usr/bin/env python
"""The round-closing verification chain, as ONE runnable command
(VERDICT r14 item 7: the chain verify_driver -> pytest -> plan
hygiene -> bench was re-derived by hand each round from BASELINE.md
prose; this script IS the chain and emits the closing-record numbers
in one JSON).

Usage:
    python tools/chain.py [--round N] [--skip-bench] [--skip-pytest]

Steps, strictly sequential (bench runs LAST so it sees an idle
machine — a concurrent pytest contends for every core and inflates
all timings; the calibration factor corrects host drift, not
in-process contention):

1. verify_driver  — the driver simulation (entry + all registry
   entries vs their DuckDB oracles at sf0.01), run from a temp cwd in
   a fresh process to catch path assumptions.
2. pytest tests/  — the full local suite.
3. plan hygiene   — tests/test_plans.py alone, reported separately
   (it is also part of step 2; the explicit number is what the
   closing record cites).
4. bench.py       — the sf0.1 headline battery; the compact LAST
   stdout line is parsed.

Writes CHAIN_r{N}.json at the repo root when --round is given, and
always prints the summary JSON as the last stdout line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], cwd: str) -> tuple[int, str]:
    p = subprocess.run(
        cmd, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    return p.returncode, p.stdout


def step_verify() -> dict:
    src = os.path.join(REPO, ".claude", "skills", "verify",
                       "verify_driver.py")
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(src, td)
        rc, out = _run([sys.executable, "verify_driver.py"], cwd=td)
    parsed = None
    for line in reversed(out.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except ValueError:
            continue
    return {
        "rc": rc,
        "result": parsed,
        "green": bool(rc == 0 and parsed and parsed.get("fails") == 0),
        "wall_sec": round(time.perf_counter() - t0, 1),
    }


_PYTEST_SUMMARY = re.compile(
    r"(?:(\d+) failed, )?(\d+) passed(?:, (\d+) skipped)?"
)


def _pytest(args: list[str]) -> dict:
    t0 = time.perf_counter()
    rc, out = _run(
        [sys.executable, "-m", "pytest", *args, "-q"], cwd=REPO
    )
    failed = passed = skipped = None
    for line in reversed(out.strip().splitlines()):
        m = _PYTEST_SUMMARY.search(line)
        if m:
            failed = int(m.group(1) or 0)
            passed = int(m.group(2))
            skipped = int(m.group(3) or 0)
            break
    return {
        "rc": rc,
        "passed": passed,
        "failed": failed,
        "skipped": skipped,
        "green": rc == 0,
        "wall_sec": round(time.perf_counter() - t0, 1),
        "tail": out.strip().splitlines()[-1] if out.strip() else "",
    }


def step_bench() -> dict:
    t0 = time.perf_counter()
    rc, out = _run([sys.executable, "bench.py"], cwd=REPO)
    compact = detailed = None
    for line in out.strip().splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "queries" in d:
            detailed = d
        else:
            compact = d
    return {
        "rc": rc,
        "green": rc == 0 and compact is not None,
        "compact": compact,
        "value": (detailed or compact or {}).get("value"),
        "calibration_factor": (detailed or compact or {}).get(
            "calibration_factor"
        ),
        "anchor_median": (detailed or {}).get("anchor_median"),
        "class_subtotals": (detailed or {}).get("class_subtotals"),
        "n_entries": len((detailed or {}).get("queries", {})) or None,
        "wall_sec": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-pytest", action="store_true")
    args = ap.parse_args()

    t0 = time.perf_counter()
    record: dict = {"chain": "verify_driver,pytest,plan_hygiene,bench"}
    if args.round is not None:
        record["round"] = args.round

    record["verify_driver"] = step_verify()
    if not args.skip_pytest:
        record["pytest"] = _pytest(["tests/"])
        record["plan_hygiene"] = _pytest(["tests/test_plans.py"])
    if not args.skip_bench:
        record["bench"] = step_bench()

    record["green"] = all(
        v.get("green") for k, v in record.items() if isinstance(v, dict)
    )
    record["wall_sec"] = round(time.perf_counter() - t0, 1)

    if args.round is not None:
        path = os.path.join(REPO, f"CHAIN_r{args.round:02d}.json")
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
        record["written"] = os.path.basename(path)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
