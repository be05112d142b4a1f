#!/usr/bin/env python
"""Settle int8 BELOW XLA: does the MXU expose a double-rate int8 path
reachable from Mosaic that XLA does not use?

Round-2 finding (BASELINE.md): an int8 GEMM *through XLA* runs at
102.9 Tops/s vs 102.6 TFLOP/s bf16 => x1.00, lever closed "through
XLA". This microbench issues the same MLP-shaped GEMM
([16448,1024] x [1024,4096]) as hand-written Pallas kernels — one
int8xint8->int32, one bf16xbf16->fp32 with the IDENTICAL schedule — so
any sub-XLA int8 rate advantage shows up as kernel-vs-kernel speedup.
Timing: in-graph serialized fori_loop (tunnel-safe).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M, K, N = 16448, 1024, 4096
TM, TN = 512, 512


def _matmul_kernel(a_ref, b_ref, o_ref, acc_dtype):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=acc_dtype)


def make_matmul(in_dtype, acc_dtype):
    def kernel(a_ref, b_ref, o_ref):
        _matmul_kernel(a_ref, b_ref, o_ref, acc_dtype)

    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, TN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(a, b)

    return mm


def bench(name, mm, a, b, reduce_dtype):
    @jax.jit
    def loop(a, b):
        def body(i, carry):
            aa = a + carry.astype(a.dtype)
            out = mm(aa, b)
            return (out[0, 0] * 0).astype(reduce_dtype)
        return jax.lax.fori_loop(
            0, 5, body, jnp.zeros((), reduce_dtype))

    float(loop(a, b))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(a, b))
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    ops = 2 * M * K * N
    print(f"{name}: {best*1e3:.2f} ms = {ops/best/1e12:.1f} Top/s")
    return ops / best / 1e12


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    a16 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    r_bf16 = bench("pallas bf16xbf16->fp32", make_matmul(jnp.bfloat16, jnp.float32),
                   a16, b16, jnp.float32)
    r_int8 = bench("pallas int8xint8->int32", make_matmul(jnp.int8, jnp.int32),
                   a8, b8, jnp.int32)
    print(f"int8/bf16 kernel-vs-kernel speedup: x{r_int8 / r_bf16:.2f}")


if __name__ == "__main__":
    main()
