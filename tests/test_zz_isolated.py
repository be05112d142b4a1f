"""Runner for the subprocess-isolated heavyweight mesh-compile files.

Companion to ``conftest.ISOLATED_FILES`` (see the comment there for the
crash history): each listed file is executed in a CHILD pytest process so
the known XLA persistent-cache (de)serialize SIGSEGV can only kill the
child — the suite detects the signal-death and retries once (the flake is
content-independent; the same file passes on the very next attempt, which
is exactly the manual playbook this automates). A genuine test failure
(nonzero-but-positive exit) is NOT retried.

Named ``test_zz_*`` so it runs at the tail of the suite, where the
isolated files used to sit alphabetically.
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from conftest import ISOLATED_FILES

TESTS_DIR = Path(__file__).resolve().parent


def _run_with_signal_retry(path, env, timeout=1800):
    """Run `pytest <path>` in a child; retry ONCE if the child dies by
    signal (negative returncode). Returns (ok, attempts, note)."""
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", "-rs"]
    attempts = []
    note = ""
    for attempt in (1, 2):
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout,
            cwd=str(TESTS_DIR.parent),
        )
        attempts.append(proc)
        if proc.returncode == 0:
            if attempt > 1:
                note = (f"attempt 1 died with signal "
                        f"{-attempts[0].returncode}, attempt 2 green "
                        f"(XLA cache (de)serialize flake, CLAUDE.md)")
            return True, attempts, note
        if proc.returncode > 0:
            break  # real test failure: do not retry, report it
    return False, attempts, note


@pytest.mark.parametrize("fname", ISOLATED_FILES)
def test_isolated_file(fname):
    path = TESTS_DIR / fname
    assert path.exists(), path
    env = dict(os.environ, BVT_ISOLATED="1")
    ok, attempts, note = _run_with_signal_retry(path, env)
    if ok:
        if note:
            print(f"[isolated] {fname}: {note}")
        return
    last = attempts[-1]
    pytest.fail(
        f"[isolated] {fname} failed (rc={last.returncode}, "
        f"{len(attempts)} attempt(s))\n"
        f"--- stdout tail ---\n{last.stdout[-4000:]}\n"
        f"--- stderr tail ---\n{last.stderr[-2000:]}"
    )


# ---------------------------------------------------------------------------
# self-tests of the retry mechanism (no jax, fast)
# ---------------------------------------------------------------------------

def _write_crashy(tmp_path, marker_name, then_fail=False):
    """A test file that SIGSEGVs itself on the first run (before the marker
    exists) and passes (or fails) on the second."""
    body = f"""
        import os, signal
        def test_flaky():
            marker = {str(tmp_path)!r} + "/" + {marker_name!r}
            if not os.path.exists(marker):
                open(marker, "w").close()
                os.kill(os.getpid(), signal.SIGSEGV)
            assert not {then_fail}
    """
    f = tmp_path / "test_crashy.py"
    f.write_text(textwrap.dedent(body))
    return f


def test_signal_death_is_retried_once(tmp_path):
    f = _write_crashy(tmp_path, "m1")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    ok, attempts, note = _run_with_signal_retry(f, env, timeout=300)
    assert ok and len(attempts) == 2
    assert "died with signal" in note


def test_real_failure_is_not_retried(tmp_path):
    f = tmp_path / "test_failing.py"
    f.write_text("def test_nope():\n    assert False\n")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    ok, attempts, _ = _run_with_signal_retry(f, env, timeout=300)
    assert not ok and len(attempts) == 1  # deterministic failure, one shot
