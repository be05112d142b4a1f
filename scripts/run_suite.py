#!/usr/bin/env python
"""Crash-resuming full-suite runner (round-4 VERDICT #6).

The XLA persistent-cache (de)serialize SIGSEGV flake (CLAUDE.md; diagnosed
round 4) is quarantined for the KNOWN victim files via
conftest.ISOLATED_FILES + tests/test_zz_isolated.py — but a NEW victim
file would still kill one full-suite run and cost a manual rerun. This
runner closes that window:

  python scripts/run_suite.py [extra pytest args]

1. Runs `python -m pytest tests/ -q` with BVT_SUITE_STATE pointed at a
   scratch file; the conftest records the test file currently executing.
2. If the pytest process exits by SIGNAL (negative returncode), the file
   named in the state file is the new victim: it is re-run standalone in
   a child pytest (where every historical victim passes — with one
   retry on a second signal-death, the test_zz_isolated playbook), and
   the suite RESUMES from the file after it. Repeats until done.
3. Normal (0 or positive) exit codes pass through: real test failures
   are never retried or masked.

Guarantee: no single signal-death costs a manual rerun or skips the rest
of the suite. A victim that also dies standalone after a retry is a real
failure and reported as such (add it to conftest.ISOLATED_FILES).
"""

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"
MAX_CRASHES = 8  # runaway backstop; each crash consumes one victim file


def _ordered_files() -> list:
    """Collection order of the suite's test files (pytest default:
    sorted). conftest excludes ISOLATED_FILES from in-process collection,
    but they still appear here harmlessly (their run is a no-op collect)."""
    return sorted(p.name for p in TESTS.glob("test_*.py"))


def _run(files, state, extra, label):
    cmd = [sys.executable, "-m", "pytest", "-q", *extra,
           *(str(TESTS / f) for f in files)]
    env = dict(os.environ, BVT_SUITE_STATE=str(state))
    print(f"[run_suite] {label}: pytest over {len(files)} file(s)",
          flush=True)
    return subprocess.run(cmd, env=env, cwd=str(REPO))


def _run_victim(fname, extra) -> bool:
    """Standalone child run of the crash victim; one retry on a second
    signal-death (content-independent flake). True = green."""
    cmd = [sys.executable, "-m", "pytest", "-q", "-rs", *extra,
           str(TESTS / fname)]
    env = dict(os.environ, BVT_ISOLATED="1")
    for attempt in (1, 2):
        print(f"[run_suite] victim {fname}: standalone attempt {attempt}",
              flush=True)
        p = subprocess.run(cmd, env=env, cwd=str(REPO))
        if p.returncode == 0:
            return True
        if p.returncode > 0:
            print(f"[run_suite] victim {fname}: REAL failure "
                  f"(rc={p.returncode}), not a flake", flush=True)
            return False
    print(f"[run_suite] victim {fname}: died by signal twice — treat as "
          f"real; add to conftest.ISOLATED_FILES", flush=True)
    return False


def main(argv) -> int:
    extra = list(argv)
    files = _ordered_files()
    state = Path(tempfile.mkstemp(prefix="bvt_suite_state_")[1])
    t0 = time.time()
    crashes = 0
    failed = False
    remaining = files
    while remaining:
        state.write_text("")
        proc = _run(remaining, state, extra,
                    "full" if remaining == files else "resume")
        if proc.returncode >= 0:
            failed |= proc.returncode != 0
            break
        crashes += 1
        victim_path = state.read_text().strip()
        victim = Path(victim_path).name if victim_path else None
        print(f"[run_suite] pytest died by signal {-proc.returncode} "
              f"in {victim or '<unknown file>'}", flush=True)
        if victim is None or victim not in remaining or crashes > MAX_CRASHES:
            print("[run_suite] cannot attribute/resume — giving up",
                  flush=True)
            failed = True
            break
        failed |= not _run_victim(victim, extra)
        remaining = remaining[remaining.index(victim) + 1:]
        if remaining:
            print(f"[run_suite] resuming after {victim}: "
                  f"{len(remaining)} file(s) left", flush=True)
    state.unlink(missing_ok=True)
    mins = (time.time() - t0) / 60
    print(f"[run_suite] {'FAILED' if failed else 'GREEN'} in {mins:.1f} min "
          f"({crashes} signal-death(s) absorbed)", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
