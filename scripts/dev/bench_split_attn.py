"""Micro-bench: one-block vs split-key fused attention at ViT-L shapes.

In-graph serialized fori_loop timing (host async timing unreliable over
the tunnel — CLAUDE.md). Run on the real chip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesvlm_tpu.models import attention_pallas as ap

B, T, H, Dh = 80, 257, 16, 64
D = H * Dh
N_ITER = 50

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)


def one_block(q, k, v):
    kernel = functools.partial(
        ap._mha_kernel, num_heads=H, head_dim=Dh, scale=1.0 / (Dh ** 0.5))
    spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((H, T, T), jnp.float32)],
    )(q, k, v)


def timeit(fn, name):
    @jax.jit
    def loop(q, k, v):
        def body(i, carry):
            qq = q + (carry * 1e-20).astype(q.dtype)
            o = fn(qq, k, v)
            return jnp.sum(o[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    float(loop(q, k, v))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(q, k, v))
        best = min(best, (time.perf_counter() - t0) / N_ITER)
    flops = 4 * B * H * T * T * Dh
    print(f"{name}: {best*1e3:.3f} ms  ({flops/best/1e12:.1f} TFLOP/s)")
    return best


timeit(one_block, "one-block (T->384 lane pad)")
timeit(lambda q, k, v: ap.fused_attention(q, k, v, H, split_key=True),
       "split-key")
