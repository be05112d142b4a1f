"""Micro-bench: one-block fused attention schedule variants at ViT-L
shapes (B=80, T=257, H=16, Dh=64).

Variants:
  base      — production staged kernel (qk -> batched softmax -> pv)
  v2        — scale folded into q (one [T,D] bf16 multiply instead of a
              full-width [H,T,384] fp32 multiply) + normalize-after-pv
              (divide the [T,Dh] pv output by the row sums instead of
              the [H,T,384] score block)
  v3        — v2 + exp only (no max subtraction)  [UNSAFE numerics probe:
              measures the cost of the max pass, not a candidate]

In-graph fori_loop timing (host timing lies over the tunnel).
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


def _kernel_v2(q_ref, k_ref, v_ref, o_ref, s_ref, *, num_heads, head_dim,
               scale, subtract_max=True):
    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    qs = (qv.astype(jnp.float32) * scale).astype(qv.dtype)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s_ref[h] = jax.lax.dot_general(
            qs[:, sl], kv[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s = s_ref[:]
    if subtract_max:
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
    else:
        e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)      # [H, T, 1] fp32
    p = e.astype(qv.dtype)                          # unnormalized bf16
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o = jax.lax.dot_general(
            p[h], vv[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / denom[h]).astype(o_ref.dtype)


def make_call(kernel):
    spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return lambda q, k, v: pl.pallas_call(
        kernel, grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((H, T, T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(q, k, v)


base = make_call(functools.partial(
    ap._mha_kernel, num_heads=H, head_dim=Dh, scale=1.0 / (Dh ** 0.5)))
v2 = make_call(functools.partial(
    _kernel_v2, num_heads=H, head_dim=Dh, scale=1.0 / (Dh ** 0.5)))
v3 = make_call(functools.partial(
    _kernel_v2, num_heads=H, head_dim=Dh, scale=1.0 / (Dh ** 0.5),
    subtract_max=False))


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


# correctness first (on-chip, vs base)
ob = base(q, k, v)
o2 = v2(q, k, v)
d = jnp.max(jnp.abs(ob.astype(jnp.float32) - o2.astype(jnp.float32)))
print("max |base - v2| =", float(d))

timeit(base, "base (staged softmax)")
timeit(v2, "v2 (scale-in-q + normalize-after-pv)")
timeit(v3, "v3 (v2 + no max subtract, probe only)")
