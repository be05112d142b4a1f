"""bench.py tunnel-guard plumbing (round-3 VERDICT item 1).

The driver captures BENCH_r{N}.json from one `python bench.py` run; the
axon tunnel wedges transiently (CLAUDE.md), so bench.py wraps every
metric in a probe/backoff/retry supervisor. These tests exercise the
supervisor on CPU with monkeypatched probes/children — no TPU, no
subprocesses that touch the tunnel.
"""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO_ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None, raising=False)
    return mod


class _Proc:
    def __init__(self, rc, out):
        self.returncode = rc
        self.stdout = out


def test_pick_metric(bench):
    assert bench._pick_metric([]) == "headline"
    assert bench._pick_metric(["--metric", "hessian"]) == "hessian"
    assert bench._pick_metric(["--metric", "stage1", "--inner"]) == "stage1"
    # the common equals-form must resolve, not silently fall back to
    # the headline metric
    assert bench._pick_metric(["--metric=epig"]) == "epig"
    # an explicit --metric with an unknown name is an error, never a
    # mislabeled headline run
    with pytest.raises(SystemExit, match="unknown metric"):
        bench._pick_metric(["--metric", "hesian"])
    with pytest.raises(SystemExit, match="unknown metric"):
        bench._pick_metric(["--metric=serving"])
    # every dispatchable metric has a JSON-name for the error line
    assert set(bench._METRIC_FNS) == set(bench._METRIC_JSON_NAME)


def test_wait_for_backend_recovers(bench, monkeypatch):
    """Two failed probes (one hang, one loud FAILED_PRECONDITION) then
    recovery — the documented wedge pattern."""
    results = iter([
        (False, "probe hung >120s (wedged tunnel)"),
        (False, "FAILED_PRECONDITION: TPU backend error"),
        (True, "ok"),
    ])
    monkeypatch.setattr(bench, "_probe_once", lambda **kw: next(results))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench._wait_for_backend(budget_s=720) is True
    assert slept == [20, 40]  # exponential backoff consumed


def test_wait_for_backend_exhausts_budget(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "_probe_once", lambda **kw: (False, "still wedged"))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench._wait_for_backend(budget_s=90) is False
    assert sum(slept) <= 90


def test_run_guarded_success(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_wait_for_backend", lambda **kw: True)
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 2.0})
    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **kw: _Proc(0, line + "\n"))
    bench._run_guarded("headline")
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["value"] == 1.0


def test_run_guarded_retries_then_errors(bench, monkeypatch, capsys):
    """A hung child is killed, retried once after a recovery cycle, and
    the final failure is ONE structured JSON error line with rc != 0 —
    never a fabricated value (BENCH_r02 regression)."""
    monkeypatch.setattr(bench, "_wait_for_backend", lambda **kw: True)
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as ei:
        bench._run_guarded("epig")
    assert ei.value.code == 1
    assert len(calls) == 2  # one retry after the recovery cycle
    out = capsys.readouterr().out.strip().splitlines()
    err = json.loads(out[-1])
    assert err["metric"] == "epig_al_step_scoring"
    assert err["value"] is None and "error" in err


def test_run_guarded_rejects_non_json_child(bench, monkeypatch, capsys):
    """rc=0 with garbage stdout must not be passed through as a result."""
    monkeypatch.setattr(bench, "_wait_for_backend", lambda **kw: True)
    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **kw: _Proc(0, "not json\n"))
    with pytest.raises(SystemExit):
        bench._run_guarded("knn")
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert err["value"] is None and "error" in err


def test_inner_child_invocation_headline_compiles():
    """The child lane resolves and the guard constants cover it: a dry
    syntax/dispatch check via --help-style import, not a TPU run."""
    p = subprocess.run(
        [sys.executable, "-c",
         "import importlib.util as u; "
         f"s=u.spec_from_file_location('b', r'{REPO_ROOT / 'bench.py'}'); "
         "m=u.module_from_spec(s); s.loader.exec_module(m); "
         "print(sorted(m._METRIC_FNS))"],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stderr
    assert "headline" in p.stdout


def test_env_budget_overrides(bench, monkeypatch):
    monkeypatch.setenv("BVT_BENCH_PROBE_BUDGET_S", "50")
    monkeypatch.setattr(
        bench, "_probe_once", lambda **kw: (False, "wedged"))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench._wait_for_backend() is False
    assert sum(slept) <= 50
    # malformed env falls back to the default
    monkeypatch.setenv("BVT_BENCH_PROBE_BUDGET_S", "not-a-number")
    assert bench._env_float("BVT_BENCH_PROBE_BUDGET_S", 720.0) == 720.0
