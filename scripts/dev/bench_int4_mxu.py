#!/usr/bin/env python
"""Settle int4 below XLA: does the MXU expose a quad-rate int4 path
from Mosaic? (Follow-up to bench_int8_mxu.py's x1.97 int8 answer —
same slope-timed methodology, same [16384,1024]x[1024,4096] shape.)

Probes int4xint4->int32 via jnp.int4 operands in a Pallas kernel, plus
the mixed int4xint8 case (weight-only int4). Correctness-gated against
a widened int32 jnp.dot on the same values.
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


def make_matmul(acc_dtype, TM=512, TN=512, TK=1024):
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


def bench(name, mm, a, b, carry_dtype=jnp.int32):
    def make_loop(n):
        @jax.jit
        def loop(a, b, seed):
            def body(i, carry):
                aa = a.at[0, 0].add(carry.astype(a.dtype))
                out = mm(aa, b)
                return (out[0, 0] % 2).astype(carry_dtype)
            return jax.lax.fori_loop(0, n, body, seed)
        return loop

    times = {}
    seed = jnp.zeros((), carry_dtype)
    for n in (N_SHORT, N_LONG):
        loop = make_loop(n)
        float(loop(a, b, seed))
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(a, b, seed))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    per_iter = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT)
    r = 2 * M * K * N / per_iter / 1e12
    print(f"{name}: {per_iter*1e3:.2f} ms = {r:.1f} Top/s", flush=True)
    return r


def main():
    rng = np.random.default_rng(0)
    a4_np = rng.integers(-7, 8, size=(M, K))
    b4_np = rng.integers(-7, 8, size=(K, N))
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)

    # correctness gate (small slice, widened int32 ground truth)
    try:
        a4 = jnp.asarray(a4_np, jnp.int4)
        b4 = jnp.asarray(b4_np, jnp.int4)
    except Exception as e:
        print(f"int4 dtype unavailable: {type(e).__name__}: {e}")
        return
    mm44 = make_matmul(jnp.int32)
    try:
        out = mm44(a4, b4)
        ref = jnp.dot(jnp.asarray(a4_np[:64], jnp.int32),
                      jnp.asarray(b4_np[:, :64], jnp.int32))
        exact = bool(jnp.array_equal(out[:64, :64], ref))
        print(f"int4xint4 correctness vs int32 dot: "
              f"{'EXACT' if exact else 'MISMATCH'}")
        if exact:
            bench("Pallas int4xint4->int32", mm44, a4, b4)
    except Exception as e:
        print(f"int4xint4 kernel FAILED: {type(e).__name__}: {str(e)[:160]}")

    # mixed: int8 activations x int4 weights (weight-only int4 shape)
    try:
        out = make_matmul(jnp.int32)(a8, b4)
        ref = jnp.dot(a8[:64].astype(jnp.int32),
                      jnp.asarray(b4_np[:, :64], jnp.int32))
        exact = bool(jnp.array_equal(out[:64, :64], ref))
        print(f"int8xint4 correctness: {'EXACT' if exact else 'MISMATCH'}")
        if exact:
            bench("Pallas int8xint4->int32", make_matmul(jnp.int32), a8, b4)
    except Exception as e:
        print(f"int8xint4 kernel FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
