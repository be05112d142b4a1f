"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run anywhere (the SURVEY §4 substitute for fake backends)."""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon/TPU is present
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Persistent compilation cache — compiles on this host are slow; cache them.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden by axon

# Atomic cache puts: a process killed mid-write (bench --inner timeouts)
# leaves a torn entry whose deserialization SEGFAULTS later readers.
from bayesvlm_tpu.utils import harden_compilation_cache  # noqa: E402

harden_compilation_cache()
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_HESSIANS = Path("/root/reference/hessians")
CLIP_B32_DIR = REFERENCE_HESSIANS / "hessian_CLIP-ViT-B-32-laion2B-s34B-b79K"
SIGLIP_DIR = REFERENCE_HESSIANS / "hessian_siglip-base-patch16-256"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def clip_b32_hessian_dir():
    if not CLIP_B32_DIR.exists():
        pytest.skip("reference hessian fixtures not available")
    return CLIP_B32_DIR


@pytest.fixture(scope="session")
def siglip_hessian_dir():
    if not SIGLIP_DIR.exists():
        pytest.skip("reference hessian fixtures not available")
    return SIGLIP_DIR


@pytest.fixture(scope="session")
def clip_l14_hessian_dir():
    d = REFERENCE_HESSIANS / "hessian_CLIP-ViT-L-14-laion2B-s32B-b82K"
    if not d.exists():
        pytest.skip("reference hessian fixtures not available")
    return d


# ---------------------------------------------------------------------------
# Subprocess isolation for the XLA persistent-cache (de)serialize flake
# ---------------------------------------------------------------------------
# Six full-suite runs across rounds have died by SIGSEGV inside XLA's
# compile / executable-(de)serialize paths on cold cache entries —
# always in the heavyweight compile files near the suite's alphabetical
# tail (test_tp.py twice, test_serve.py once, test_types_fullcov.py
# twice — the latter reproducibly at the same cholesky compile two runs
# in a row), and NEVER standalone: the same file + same cache entry
# passes in a lean process. Diagnosis (round 4): the victims don't
# import torch themselves; the crashes require the full suite process
# (~242 resident extension modules incl. torch's own libgomp/allocator)
# — an in-process library interaction inside XLA we cannot fix from
# here, only quarantine. glibc MALLOC_CHECK_=3 catches nothing (the
# bundled allocators bypass glibc malloc). A conftest hook cannot
# survive its own process death, so the observed victim files are
# excluded from in-process collection and executed by
# tests/test_zz_isolated.py in a child pytest (lean process = immune so
# far) with one retry on signal-death. Run one directly with:
# BVT_ISOLATED=1 pytest tests/test_tp.py (explicitly naming the file on
# the command line also works).

ISOLATED_FILES = ("test_tp.py", "test_serve.py", "test_types_fullcov.py",
                  # deserialize_executable is one of the two code-emitting
                  # XLA ops behind the resident-state flake; its tests run
                  # in a lean child by construction (also the production
                  # restart scenario they model)
                  "test_aot_cache.py")


# Keep the suite process SMALL: round-4 diagnosis of the tail crashes
# (5 consecutive full-suite runs died at ~89% — SIGSEGV at 8 MB stacks,
# SIGABRT at 64 MB — always inside XLA's compile or
# deserialize_executable, i.e. the two ops that EMIT JIT code; victims
# rotate to whichever heavyweight compile file runs there; every victim
# passes standalone in a lean process on the very same cache entry;
# glibc MALLOC_CHECK_=3 sees nothing). Everything points at cumulative
# resident state (hundreds of live executables + 240 extension modules)
# pushing XLA's code emission into a failing regime, not at any one
# test. Mitigation: drop JAX's jit/executable caches at test-FILE
# boundaries so the resident-executable population stays bounded — the
# persistent disk cache makes re-derivations cheap. (The observed
# victim files additionally stay subprocess-isolated, belt and braces.)

_last_test_file = [None]

# scripts/run_suite.py (the crash-resuming full-suite runner, round-5
# VERDICT #6) sets BVT_SUITE_STATE to a file path; we record the test
# file currently executing there so that if THIS process dies by signal
# (a new XLA flake victim outside ISOLATED_FILES), the runner knows
# which file to quarantine-and-retry and where to resume.
_SUITE_STATE = os.environ.get("BVT_SUITE_STATE")


def pytest_runtest_setup(item):
    fspath = str(item.fspath)
    if fspath != _last_test_file[0]:
        if _last_test_file[0] is not None:
            import gc

            jax.clear_caches()
            gc.collect()
        if _SUITE_STATE:
            try:
                with open(_SUITE_STATE, "w") as f:
                    f.write(fspath)
            except OSError:
                pass
    _last_test_file[0] = fspath


def pytest_ignore_collect(collection_path, config):
    if collection_path.name not in ISOLATED_FILES:
        return None
    if os.environ.get("BVT_ISOLATED") == "1":
        return None
    # explicitly targeted on the command line -> run in-process as asked
    for arg in config.invocation_params.args:
        spec = str(arg).split("::")[0]
        try:
            if Path(spec).resolve() == collection_path.resolve():
                return None
        except OSError:
            continue
    return True
