#!/usr/bin/env python
"""Tile-schedule sweep for the int8-below-XLA question (VERDICT #5).

Methodology notes (learned the hard way this round):
- A `carry = out[0,0] * 0` loop dependency lets XLA fold the carry to a
  constant and DCE the matmul entirely — the first version of this
  bench measured pure tunnel RTT (~26 ms no matter the loop length).
  The carry must be data-dependent and non-foldable: `% 2` for int
  accumulators, `* 1e-20` for float.
- Per-iteration time is taken as a SLOPE between two loop lengths
  ((t_long - t_short) / (n_long - n_short)), which cancels the
  dispatch+fetch RTT that a single-loop measurement divides by n.
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


def make_matmul(in_dtype, acc_dtype, TM, TN, TK):
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
    # non-foldable, data-dependent, cheap
    if jnp.issubdtype(dtype, jnp.integer):
        return (out[0, 0] % 2).astype(dtype)
    return (out[0, 0] * 1e-20).astype(dtype)


def bench(mm, a, b):
    def make_loop(n):
        @jax.jit
        def loop(a, b):
            def body(i, carry):
                aa = a.at[0, 0].add(carry)
                out = mm(aa, b)
                return _carry(out, a.dtype)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((), a.dtype))
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
    return 2 * M * K * N / per_iter / 1e12, per_iter * 1e3


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
    a16 = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    # Correctness: Pallas kernels must reproduce the XLA dot exactly
    # (int32 accumulate is exact; bf16 compared loosely).
    ref8 = jnp.dot(a8, b8, preferred_element_type=jnp.int32)
    got8 = make_matmul(jnp.int8, jnp.int32, 512, 512, 1024)(a8, b8)
    assert (ref8 == got8).all(), "int8 kernel wrong"
    ref16 = jnp.dot(a16, b16, preferred_element_type=jnp.float32)
    got16 = make_matmul(jnp.bfloat16, jnp.float32, 512, 512, 1024)(a16, b16)
    err = float(jnp.max(jnp.abs(ref16 - got16)) / jnp.max(jnp.abs(ref16)))
    assert err < 1e-2, f"bf16 kernel wrong ({err})"
    print(f"correctness: int8 exact, bf16 max rel {err:.1e}")

    # XLA controls. NOTE: consuming only out[0,0] lets XLA slice the dot
    # to a single output element — consume the full product via an
    # epilogue-fused sum so the whole GEMM must execute.
    for name, a, b in [("bf16", a16, b16), ("int8", a8, b8)]:
        acc = jnp.float32 if name == "bf16" else jnp.int32

        def xmm(a, b, acc=acc):
            out = jnp.dot(a, b, preferred_element_type=acc)
            if acc == jnp.int32:
                return jnp.sum(out, dtype=jnp.int32)[None, None]
            return jnp.sum(out)[None, None]

        r, ms = bench(jax.jit(xmm), a, b)
        print(f"XLA {name} (sum-consumed): {ms:.2f} ms/iter = {r:.1f} Top/s")

    tiles = [(512, 512, 1024), (256, 1024, 1024), (1024, 1024, 512),
             (512, 1024, 512), (1024, 512, 1024), (512, 1024, 1024),
             (2048, 512, 1024), (256, 2048, 1024)]
    results = {}
    for name, a, b, in_dt, acc_dt in [
            ("bf16", a16, b16, jnp.bfloat16, jnp.float32),
            ("int8", a8, b8, jnp.int8, jnp.int32)]:
        best = (0.0, None)
        for TM, TN, TK in tiles:
            try:
                r, ms = bench(make_matmul(in_dt, acc_dt, TM, TN, TK), a, b)
            except Exception as e:
                print(f"pallas {name} {TM}x{TN}x{TK}: FAIL "
                      f"{type(e).__name__}")
                continue
            print(f"pallas {name} {TM}x{TN}x{TK}: {ms:.2f} ms/iter "
                  f"= {r:.1f} Top/s")
            if r > best[0]:
                best = (r, (TM, TN, TK))
        results[name] = best
        print(f"pallas {name} best: {best[0]:.1f} Top/s @ {best[1]}")
    print(f"int8/bf16 best-vs-best: "
          f"x{results['int8'][0] / results['bf16'][0]:.2f}")


if __name__ == "__main__":
    main()
