"""Execute the example scripts end-to-end (offline tiny configs) so the
documented entry points can't rot — same rationale as the notebook
execution test. Each runs in a subprocess with the CPU platform forced
before any backend init (the axon plugin overrides JAX_PLATFORMS)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

_RUNNER = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "jax.config.update('jax_compilation_cache_dir',"
    " '/root/.cache/jax_comp_cache'); "
    "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5); "
    "import runpy; runpy.run_path(r'{script}', run_name='__main__')"
)


@pytest.mark.parametrize("script,expects", [
    ("examples/serving.py", ("AOT fast path max |d| vs general path",
                             "co-resident lanes:")),
    ("examples/zeroshot_demo.py", ("BayesVLM",)),
])
def test_example_script_runs(script, expects):
    p = subprocess.run(
        [sys.executable, "-c",
         _RUNNER.format(script=REPO_ROOT / script)],
        capture_output=True, text=True, timeout=600, cwd=REPO_ROOT,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    for expect in expects:
        assert expect in p.stdout
