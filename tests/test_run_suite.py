"""Self-test of scripts/run_suite.py (the crash-resuming suite runner,
round-4 VERDICT #6): a synthetic mini-suite whose middle file SIGSEGVs
when run in-suite but passes standalone (the exact shape of the XLA
(de)serialize flake) must yield a GREEN run with no manual intervention,
with the files after the victim still executed; a real failure must NOT
be retried into green."""

import importlib.util
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the mini-suite needs its own conftest implementing the BVT_SUITE_STATE
# protocol (the tmp dir is outside tests/, so the real conftest does not
# apply to it)
_MINI_CONFTEST = """
import os

_STATE = os.environ.get("BVT_SUITE_STATE")
_last = [None]


def pytest_runtest_setup(item):
    fspath = str(item.fspath)
    if fspath != _last[0] and _STATE:
        with open(_STATE, "w") as f:
            f.write(fspath)
    _last[0] = fspath
"""

_CRASHY = """
import os, signal


def test_flaky():
    # dies when run as part of the suite (BVT_SUITE_STATE set by the
    # runner) but passes standalone (BVT_ISOLATED=1) — the flake's shape
    if os.environ.get("BVT_SUITE_STATE") and not os.environ.get("BVT_ISOLATED"):
        os.kill(os.getpid(), signal.SIGSEGV)
"""


def _load_runner():
    spec = importlib.util.spec_from_file_location(
        "bvt_run_suite", REPO / "scripts" / "run_suite.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mini_suite(tmp_path, crashy_body):
    d = tmp_path / "mini"
    d.mkdir()
    (d / "conftest.py").write_text(textwrap.dedent(_MINI_CONFTEST))
    (d / "test_a_first.py").write_text(
        "def test_a():\n    assert True\n")
    (d / "test_m_victim.py").write_text(textwrap.dedent(crashy_body))
    marker = d / "after_ran.marker"
    (d / "test_z_after.py").write_text(
        f"def test_z():\n    open({str(marker)!r}, 'w').close()\n")
    return d, marker


def test_signal_victim_is_absorbed_and_suite_resumes(tmp_path, capsys):
    mod = _load_runner()
    d, marker = _mini_suite(tmp_path, _CRASHY)
    mod.TESTS = d
    rc = mod.main(["-p", "no:cacheprovider"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert marker.exists(), "files after the victim did not run"
    assert "died by signal" in out and "GREEN" in out
    assert "1 signal-death(s) absorbed" in out


def test_real_failure_is_not_masked(tmp_path, capsys):
    mod = _load_runner()
    d, marker = _mini_suite(
        tmp_path,
        "def test_broken():\n    assert False\n",
    )
    mod.TESTS = d
    rc = mod.main(["-p", "no:cacheprovider"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAILED" in out


def test_victim_dying_standalone_is_reported(tmp_path, capsys):
    """A victim that also dies standalone (twice) is a real failure;
    the rest of the suite still runs."""
    mod = _load_runner()
    always_crash = """
import os, signal


def test_always_dies():
    if os.environ.get("BVT_SUITE_STATE") or os.environ.get("BVT_ISOLATED"):
        os.kill(os.getpid(), signal.SIGSEGV)
"""
    d, marker = _mini_suite(tmp_path, always_crash)
    mod.TESTS = d
    rc = mod.main(["-p", "no:cacheprovider"])
    out = capsys.readouterr().out
    assert rc == 1
    assert marker.exists(), "suite did not resume past the bad victim"
    assert "died by signal twice" in out
