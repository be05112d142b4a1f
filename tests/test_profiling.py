"""Aux-subsystem coverage (SURVEY §5 tracing/profiling): the profiler
context writes a trace, debug_nans catches NaNs, StepTimer math."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.profiling import StepTimer, debug_nans, trace


def test_trace_writes_profile(tmp_path):
    f = jax.jit(lambda x: x @ x.T)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)), jnp.float32)
    jax.block_until_ready(f(x))
    with trace(str(tmp_path)):
        jax.block_until_ready(f(x))
    assert glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)


def test_debug_nans_catches():
    with pytest.raises((FloatingPointError, ZeroDivisionError, Exception)):
        with debug_nans():
            jax.block_until_ready(jnp.log(jnp.asarray(-1.0)))


def test_step_timer_summary():
    t = StepTimer()  # discards 2 warmup steps
    for _ in range(5):
        with t.step():
            jnp.asarray(1.0).block_until_ready()
    s = t.summary(items_per_step=32)
    assert s["steps"] == 3
    assert s["mean_ms"] > 0
    assert s["items_per_sec"] == pytest.approx(
        32 / (s["mean_ms"] / 1e3), rel=1e-6
    )
