#!/usr/bin/env python
"""Microbench: linear_int8 vs XLA bf16 dense at the ViT-L attention
projection shapes (QKV [M,1024]x[1024,3072], out [M,1024]x[1024,1024]),
M = 80*257. Slope-timed. Diagnoses the measured attn_int8 end-to-end
regression (bench_int8_modes.py: x0.82-0.94).

Usage: python scripts/dev/bench_linear_int8.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bayesvlm_tpu.models.linear_int8 import linear_int8

N_SHORT, N_LONG = 4, 20


def slope_ms(loop_builder, args):
    times = {}
    for n in (N_SHORT, N_LONG):
        loop = loop_builder(n)
        float(loop(*args))
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(*args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    return (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e3


def bench_shape(M, D, N):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, size=(D, N)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, size=(N,)), jnp.float32)
    wb = w.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    flops = 2 * M * D * N
    print(f"[{M},{D}]x[{D},{N}] ({flops/1e9:.1f} GFLOP)")

    def xla_builder(n):
        @jax.jit
        def loop(x, wb, bb):
            def body(i, carry):
                xx = x + (carry * 1e-20).astype(x.dtype)
                out = xx @ wb + bb
                return jnp.sum(out.astype(jnp.float32)) * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    ms = slope_ms(xla_builder, (x, wb, bb))
    print(f"  XLA bf16 dense:      {ms:.3f} ms = {flops/ms/1e9:6.1f} Top/s")

    for bm in (256, 512, 1024):
        def int8_builder(n, bm=bm):
            @jax.jit
            def loop(x, w, b):
                def body(i, carry):
                    xx = x + (carry * 1e-20).astype(x.dtype)
                    out = linear_int8(xx, w, b, block_m=bm)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-20
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return loop

        try:
            ms = slope_ms(int8_builder, (x, w, b))
        except Exception as e:
            print(f"  linear_int8 bm={bm}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}")
            continue
        print(f"  linear_int8 bm={bm:4d}: {ms:.3f} ms = "
              f"{flops/ms/1e9:6.1f} Top/s", flush=True)


if __name__ == "__main__":
    M = 80 * 257
    bench_shape(M, 1024, 3072)   # fused QKV
    bench_shape(M, 1024, 1024)   # out-proj
