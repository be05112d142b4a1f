#!/usr/bin/env python
"""On-chip benchmark for the W4A8 lane (mlp_int8 weight_bits=4).

Runs only if scripts/dev/bench_int4_mxu.py showed int8xint4 (or
int4xint4) beating the 329 Top/s int8 kernel rate — otherwise the MXU
has no quad-rate path and W4A8 can only lose (same quantize overhead,
coarser weights). Same slope-timed methodology as bench_mlp_int8.py:

  1. sublayer at ViT-L shapes: W8A8 vs W4A8 kernels (block_m sweep)
  2. end-to-end ViT-L tower: bf16 vs W8A8 vs W4A8 (B sweep)
  3. numerics: probit-prob deltas + argmax flips vs bf16 (the
     BASELINE.md calibration methodology)

Usage: python scripts/dev/bench_mlp_int4.py [sublayer|tower|both]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bayesvlm_tpu.models.clip import CLIPVisionTower
from bayesvlm_tpu.models.configs import CLIP_L14_CONFIG
from bayesvlm_tpu.models.encoders import cast_gemm_params
from bayesvlm_tpu.models.mlp_int8 import mlp_int8

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


def bench_sublayer():
    B, T, D, F = 80, 257, 1024, 4096
    M = B * T
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.02, size=(D, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.01, size=(F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, size=(F, D)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.01, size=(D,)), jnp.float32)
    flops = 4 * M * D * F

    for bits in (8, 4):
        for bm in (256, 512):
            def builder(n, bm=bm, bits=bits):
                @jax.jit
                def loop(x, w1, b1, w2, b2):
                    def body(i, carry):
                        xx = x + (carry * 1e-20).astype(x.dtype)
                        out = mlp_int8(xx, w1, b1, w2, b2,
                                       act_name="gelu_tanh", block_m=bm,
                                       weight_bits=bits)
                        return jnp.sum(out.astype(jnp.float32)) * 1e-20
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return loop

            try:
                ms = slope_ms(builder, (x, w1, b1, w2, b2))
            except Exception as e:
                print(f"W{bits}A8 block_m={bm}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            print(f"W{bits}A8 block_m={bm}: {ms:.3f} ms = "
                  f"{flops/ms/1e9:.1f} Top/s", flush=True)


def build_tower(mlp_int8_on, weight_bits=8):
    cfg = CLIP_L14_CONFIG
    vcfg = dataclasses.replace(cfg.vision, attn_pallas=True,
                               mlp_int8=mlp_int8_on,
                               mlp_weight_bits=weight_bits)
    module = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    return module, cast_gemm_params(params, jnp.bfloat16)


def bench_tower(batches=(32, 64, 80)):
    module_bf16, params = build_tower(False)
    module_w8, _ = build_tower(True, 8)
    module_w4, _ = build_tower(True, 4)
    rng = np.random.default_rng(1)

    for B in batches:
        pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)),
                             jnp.bfloat16)
        rates = {}
        for name, module in (("bf16", module_bf16), ("W8A8", module_w8),
                             ("W4A8", module_w4)):
            def builder(n, module=module):
                @jax.jit
                def loop(params, pixels):
                    def body(i, carry):
                        xx = pixels + (carry * 1e-20).astype(pixels.dtype)
                        out = module.apply({"params": params}, xx)
                        return jnp.sum(out[0][0]).astype(jnp.float32)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return loop

            try:
                ms = slope_ms(builder, (params, pixels))
            except Exception as e:
                print(f"  B={B} {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            rates[name] = B / ms * 1e3
            print(f"  B={B} {name}: {rates[name]:.1f} img/s "
                  f"({ms:.2f} ms/batch)", flush=True)
        if "W4A8" in rates and "W8A8" in rates:
            print(f"  B={B} W4A8 vs W8A8: x{rates['W4A8']/rates['W8A8']:.3f}"
                  f", vs bf16: x{rates['W4A8']/rates['bf16']:.3f}",
                  flush=True)

    # numerics: probit-prob deltas at B=80 (calibration proxy)
    B = 80
    pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.bfloat16)
    embs = {}
    for name, module in (("bf16", module_bf16), ("W8A8", module_w8),
                         ("W4A8", module_w4)):
        embs[name] = np.asarray(jax.jit(lambda p, x, m=module: m.apply(
            {"params": p}, x)[0])(params, pixels), np.float32)
    C = 100
    te = np.random.default_rng(2).normal(size=(C, embs["bf16"].shape[-1]))
    te = te / np.linalg.norm(te, axis=-1, keepdims=True)

    def probs(e):
        en = e / np.linalg.norm(e, axis=-1, keepdims=True)
        logits = 100.0 * en @ te.T
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z)
        return p / p.sum(-1, keepdims=True)

    p0 = probs(embs["bf16"])
    for name in ("W8A8", "W4A8"):
        p = probs(embs[name])
        flips = int((p0.argmax(-1) != p.argmax(-1)).sum())
        print(f"  {name} vs bf16 @B=80,C=100: max|dP|="
              f"{np.abs(p0-p).max():.2e} mean|dP|={np.abs(p0-p).mean():.2e}"
              f" argmax flips {flips}/{B}; emb rel-L2 "
              f"{np.linalg.norm(embs[name]-embs['bf16'])/np.linalg.norm(embs['bf16']):.2e}",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("sublayer", "both"):
        bench_sublayer()
    if mode in ("tower", "both"):
        bench_tower()
