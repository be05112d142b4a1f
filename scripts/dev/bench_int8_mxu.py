#!/usr/bin/env python
"""Settle int8 BELOW XLA: does the MXU expose a double-rate int8 path
reachable from Mosaic that XLA does not use? (VERDICT round-1 item 5.)

ANSWER (v5 lite, 2026-08-17, slope-timed): **yes — x1.97**.
  XLA bf16 (sum-consumed)  162.5 Top/s      XLA int8   196.3 (x1.21)
  Pallas bf16 best         166.7 Top/s      Pallas int8 329.2 (x1.97)
329 Top/s is 84% of the 394 Top/s double-rate int8 peak implied by
2x the 197 TFLOP/s bf16 spec. XLA's int8 path gets only x1.21, so the
remaining x1.6 is reachable ONLY from a hand-written Mosaic kernel.
See scripts/dev/bench_int8_sweep.py for the tile sweep; the production
consequence (weight-only int8 MLP) lives in models/.

Methodology (two hard-won rules, shared with bench_int8_sweep.py):
- the loop carry must be data-dependent and non-foldable
  (`out[0,0] % 2` for ints, `* 1e-20` for floats). A `* 0` carry lets
  XLA fold it and DCE the GEMM — the round-4 version of this file did
  exactly that and measured pure tunnel RTT (~21 "Top/s" for every
  schedule: the numbers were RTT/n, not compute).
- per-iteration time must be a SLOPE between two loop lengths, which
  cancels the 0.3-0.5 s tunnel dispatch+fetch RTT.
- an XLA control consuming only out[0,0] gets sliced to a single dot
  row/column; consume the full product (epilogue-fused sum).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M, K, N = 16384, 1024, 4096
N_SHORT, N_LONG = 4, 24


def make_matmul(in_dtype, acc_dtype, TM=512, TN=512, TK=1024):
    nk = K // TK

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                              preferred_element_type=acc_dtype)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN, nk),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
                pl.BlockSpec((TK, TN), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            scratch_shapes=[pltpu.VMEM((TM, TN), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(a, b)

    return mm


def _carry(out, dtype):
    if jnp.issubdtype(dtype, jnp.integer):
        return (out[0, 0] % 2).astype(dtype)
    return (out[0, 0] * 1e-20).astype(dtype)


def bench(name, mm, a, b):
    def make_loop(n):
        @jax.jit
        def loop(a, b):
            def body(i, carry):
                aa = a.at[0, 0].add(carry)
                out = mm(aa, b)
                return _carry(out, a.dtype)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), a.dtype))
        return loop

    times = {}
    for n in (N_SHORT, N_LONG):
        loop = make_loop(n)
        float(loop(a, b))
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(a, b))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    per_iter = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
    r = 2 * M * K * N / per_iter / 1e12
    print(f"{name}: {per_iter*1e3:.2f} ms = {r:.1f} Top/s")
    return r


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    a16 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    # correctness gate before timing anything
    ref8 = jnp.dot(a8, b8, preferred_element_type=jnp.int32)
    assert (ref8 == make_matmul(jnp.int8, jnp.int32)(a8, b8)).all()

    r_bf16 = bench("pallas bf16xbf16->fp32",
                   make_matmul(jnp.bfloat16, jnp.float32), a16, b16)
    r_int8 = bench("pallas int8xint8->int32",
                   make_matmul(jnp.int8, jnp.int32), a8, b8)
    print(f"int8/bf16 kernel-vs-kernel speedup: x{r_int8 / r_bf16:.2f}")


if __name__ == "__main__":
    main()
