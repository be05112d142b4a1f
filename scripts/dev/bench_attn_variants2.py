"""Micro-bench round 2: bf16 score scratch and head-split grid.

  base  — production staged kernel (fp32 [H,T,T] scratch)
  v4    — bf16 score scratch: qk results stored bf16 (halves score-block
          VMEM traffic; scores bf16-rounded before softmax — same
          numerics class as the measured-neutral XLA bf16-softmax knob)
  v5    — grid (B, 2): 8 heads per program, fp32 [8,T,T] scratch,
          output row block revisited (disjoint lane ranges per group)

In-graph fori_loop timing. Run on the real chip.
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
GROUPS = 2
HG = H // GROUPS

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)

CP = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _kernel_v4(q_ref, k_ref, v_ref, o_ref, s_ref, *, num_heads, head_dim,
               scale):
    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s_ref[h] = (jax.lax.dot_general(
            qv[:, sl], kv[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(jnp.bfloat16)
    p = jax.nn.softmax(s_ref[:].astype(jnp.float32), axis=-1).astype(qv.dtype)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p[h], vv[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _kernel_v5(q_ref, k_ref, v_ref, o_ref, s_ref, *, head_dim, scale):
    # group block offset g*(HG*Dh) = g*512 is a provable 128-multiple;
    # per-head 64-lane slices are then static slices of the loaded value
    g = pl.program_id(1)
    gw = HG * head_dim
    gsl = pl.dslice(g * gw, gw)
    qg = q_ref[0, :, gsl]
    kg = k_ref[0, :, gsl]
    vg = v_ref[0, :, gsl]
    for j in range(HG):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        s_ref[j] = jax.lax.dot_general(
            qg[:, sl], kg[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    p = jax.nn.softmax(s_ref[:], axis=-1).astype(o_ref.dtype)
    outs = []
    for j in range(HG):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        outs.append(jax.lax.dot_general(
            p[j], vg[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype))
    o_ref[0, :, gsl] = jnp.concatenate(outs, axis=-1)


spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
spec2 = pl.BlockSpec((1, T, D), lambda b, g: (b, 0, 0),
                     memory_space=pltpu.VMEM)

base = lambda q, k, v: pl.pallas_call(
    functools.partial(ap._mha_kernel, num_heads=H, head_dim=Dh,
                      scale=1.0 / (Dh ** 0.5)),
    grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
    scratch_shapes=[pltpu.VMEM((H, T, T), jnp.float32)],
    compiler_params=CP,
)(q, k, v)

v4 = lambda q, k, v: pl.pallas_call(
    functools.partial(_kernel_v4, num_heads=H, head_dim=Dh,
                      scale=1.0 / (Dh ** 0.5)),
    grid=(B,), in_specs=[spec, spec, spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
    scratch_shapes=[pltpu.VMEM((H, T, T), jnp.bfloat16)],
    compiler_params=CP,
)(q, k, v)

v5 = lambda q, k, v: pl.pallas_call(
    functools.partial(_kernel_v5, head_dim=Dh, scale=1.0 / (Dh ** 0.5)),
    grid=(B, GROUPS), in_specs=[spec2, spec2, spec2], out_specs=spec2,
    out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
    scratch_shapes=[pltpu.VMEM((HG, T, T), jnp.float32)],
    compiler_params=CP,
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


ob = base(q, k, v)
for name, fn in (("v4", v4), ("v5", v5)):
    o = fn(q, k, v)
    d = jnp.max(jnp.abs(ob.astype(jnp.float32) - o.astype(jnp.float32)))
    print(f"max |base - {name}| =", float(d))

timeit(base, "base (fp32 scratch, 16 heads/program)")
timeit(v4, "v4 (bf16 score scratch)")
timeit(v5, "v5 (grid (B,2), 8 heads/program)")
