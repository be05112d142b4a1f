#!/usr/bin/env python
"""Round-4 probe: packed-head attention layout (round-3 VERDICT #3).

Question: the fused attention kernel's per-head qk/pv dots use Dh=64
operands — half of the 128 MXU lanes. Does packing two heads per
128-lane register (zero-padded block-diagonal keys; exact numerics,
zero products add nothing) recover the diagnosed half-lane
serialization residual, or is the kernel so VPU/VMEM-bound (round-3
diagnosis: ~20 TFLOP/s through the one-block kernel) that the MXU
packing buys nothing?

Stages, all timed with in-graph serialized fori_loops on the real chip
(host-side timing over the tunnel lies — CLAUDE.md):

  A. qk microbench, per batch row grid (B=80, T=257, H=16, Dh=64):
     A1 one-block per-head dots (today's production schedule, qk only)
     A2 packed pairs: Kp [2T, 128] block-diagonal built value-level,
        8 dots of [T,128]x[2T,128] -> [T, 2T] scores
  B. pv microbench:
     B1 per-head p[h][T,T] x v[:,sl][T,64] (today's)
     B2 packed-output pairs via block-diagonal V' [2T, 128]
  C. full fused_attention (production) as the end-to-end yardstick.

Run: python scripts/dev/probe_packed_heads.py   (claims the TPU tunnel)
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, Dh = 80, 257, 16, 64
D = H * Dh
SCALE = 1.0 / (Dh ** 0.5)
N_ITER = 30


def _qk_perhead_kernel(q_ref, k_ref, s_ref):
    q = q_ref[0]
    k = k_ref[0]
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s_ref[0, h] = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * SCALE


def _qk_packed_kernel(q_ref, k_ref, s_ref):
    """Packed pairs: contraction uses all 128 lanes. Kp rows 0:T hold
    head A keys in lanes 0:64 (zeros in 64:128), rows T:2T hold head B
    keys in lanes 64:128 — zero products keep the sums exact.

    Built value-level (concatenate), NOT via ragged scratch stores:
    compiled Mosaic silently zero-drops sub-tile masked stores like
    kp_ref[:257, :64] = ... (rows not a sublane multiple, lanes a
    half-register) while interpret mode executes them correctly —
    same alignment family as the known int8 ragged-row-block crash
    (CLAUDE.md), observed here as 46.7%-zeros output on chip."""
    q = q_ref[0]
    k = k_ref[0]
    z = jnp.zeros((T, Dh), k_ref.dtype)
    for p in range(H // 2):
        a = slice((2 * p) * Dh, (2 * p + 1) * Dh)
        b = slice((2 * p + 1) * Dh, (2 * p + 2) * Dh)
        ab = slice((2 * p) * Dh, (2 * p + 2) * Dh)
        kp = jnp.concatenate(
            [jnp.concatenate([k[:, a], z], axis=1),
             jnp.concatenate([z, k[:, b]], axis=1)], axis=0)  # [2T, 128]
        s_ref[0, p] = jax.lax.dot_general(
            q[:, ab], kp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * SCALE                      # [T, 2T]: lanes 0:T head A, T:2T head B


def _pv_perhead_kernel(p_ref, v_ref, o_ref):
    v = v_ref[0]
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p_ref[0, h], v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pv_packed_kernel(p_ref, v_ref, o_ref):
    """Packed-output pairs: P' [T, 2T] is the pair's probability blocks
    side by side (p_ref laid out [H//2, T, 2T] upstream); V' [2T, 128]
    is block-diagonal (value-level concatenate — see _qk_packed_kernel
    on why not ragged scratch stores). Output is a full 128-lane
    aligned store."""
    v = v_ref[0]
    z = jnp.zeros((T, Dh), v_ref.dtype)
    for p in range(H // 2):
        a = slice((2 * p) * Dh, (2 * p + 1) * Dh)
        b = slice((2 * p + 1) * Dh, (2 * p + 2) * Dh)
        ab = slice((2 * p) * Dh, (2 * p + 2) * Dh)
        vp = jnp.concatenate(
            [jnp.concatenate([v[:, a], z], axis=1),
             jnp.concatenate([z, v[:, b]], axis=1)], axis=0)  # [2T, 128]
        o_ref[0, :, ab] = jax.lax.dot_general(
            p_ref[0, p], vp,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _row_spec(t, d):
    return pl.BlockSpec((1, t, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def make_qk(packed: bool):
    kern = _qk_packed_kernel if packed else _qk_perhead_kernel
    out_shape = (B, H // 2, T, 2 * T) if packed else (B, H, T, T)

    def call(q, k):
        Bq = q.shape[0]
        oshape = (Bq,) + out_shape[1:]
        spec_out = pl.BlockSpec(
            (1,) + out_shape[1:], lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(Bq,),
            in_specs=[_row_spec(T, D), _row_spec(T, D)],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=jax.default_backend() != "tpu",
        )(q, k)

    return call


def make_pv(packed: bool):
    kern = _pv_packed_kernel if packed else _pv_perhead_kernel
    p_block = (H // 2, T, 2 * T) if packed else (H, T, T)

    def call(p, v):
        Bp = p.shape[0]
        p_spec = pl.BlockSpec(
            (1,) + p_block, lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(Bp,),
            in_specs=[p_spec, _row_spec(T, D)],
            out_specs=_row_spec(T, D),
            out_shape=jax.ShapeDtypeStruct((Bp, T, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=jax.default_backend() != "tpu",
        )(p, v)

    return call


def timed(fn, args, n_iter=N_ITER, reps=3):
    """In-graph serialized loop timing (per-iteration ms)."""

    @jax.jit
    def loop(*a):
        def body(i, carry):
            perturbed = tuple(
                x + (carry * 1e-20).astype(x.dtype) if j == 0 else x
                for j, x in enumerate(a))
            out = fn(*perturbed)
            first = out[0] if isinstance(out, tuple) else out
            # the carry IS the result sum (bench.py pattern): a real data
            # dependence so iterations serialize and nothing is DCE'd
            return jnp.sum(first[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    loop(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        loop(*args).block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1e3 / n_iter)
    return best


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, D)), jnp.bfloat16)

    qk1 = make_qk(packed=False)
    qk2 = make_qk(packed=True)

    # correctness first (tiny B to keep interpret mode viable on CPU).
    # NOT exact: the packed dot accumulates 64 extra exact-zero products,
    # and the fp32 reduction tree reassociates -> ~1e-6 rel differences
    # (bisected; the zero products themselves are exact)
    s1 = np.asarray(qk1(q[:2], k[:2]))
    s2 = np.asarray(qk2(q[:2], k[:2]))
    for h in range(H):
        pair, half = divmod(h, 2)
        seg = s2[:, pair, :, half * T:(half + 1) * T]
        np.testing.assert_allclose(seg, s1[:, h], rtol=1e-4, atol=1e-4)
    print("qk packed == per-head: OK (fp32-reassociation tolerance)",
          flush=True)

    pv1 = make_pv(packed=False)
    pv2 = make_pv(packed=True)
    p1 = jnp.asarray(rng.normal(size=(B, H, T, T)), jnp.float32)
    # packed layout: pair blocks side by side
    p2 = jnp.asarray(
        np.concatenate(
            [np.asarray(p1)[:, 0::2], np.asarray(p1)[:, 1::2]], axis=-1),
        jnp.float32)

    o1 = np.asarray(pv1(p1[:2].astype(jnp.bfloat16).astype(jnp.float32), v[:2]))
    o2 = np.asarray(pv2(p2[:2].astype(jnp.bfloat16).astype(jnp.float32), v[:2]))
    np.testing.assert_allclose(o1, o2, rtol=2e-2, atol=2e-2)  # bf16 out
    print("pv packed == per-head: OK", flush=True)

    if jax.default_backend() != "tpu":
        print("not on TPU - skipping timing")
        return

    ms1 = timed(qk1, (q, k))
    ms2 = timed(qk2, (q, k))
    print(f"qk per-head : {ms1:.3f} ms")
    print(f"qk packed   : {ms2:.3f} ms  (x{ms1 / ms2:.2f})")

    ms3 = timed(pv1, (p1, v))
    ms4 = timed(pv2, (p2, v))
    print(f"pv per-head : {ms3:.3f} ms")
    print(f"pv packed   : {ms4:.3f} ms  (x{ms3 / ms4:.2f})")

    from bayesvlm_tpu.models.attention_pallas import fused_attention

    ms5 = timed(lambda a, b, c: fused_attention(a, b, c, H), (q, k, v))
    print(f"full fused_attention (production): {ms5:.3f} ms")
    ms6 = timed(lambda a, b, c: fused_attention(a, b, c, H,
                                                packed_heads=True), (q, k, v))
    print(f"full fused_attention (packed)    : {ms6:.3f} ms  "
          f"(x{ms5 / ms6:.2f})")
    print("qk+pv fraction of full kernel: "
          f"{(ms1 + ms3) / ms5:.2f} (per-head), "
          f"{(ms2 + ms4) / ms5:.2f} (packed)")


if __name__ == "__main__":
    main()
