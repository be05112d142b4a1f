#!/usr/bin/env python
"""On-chip benchmark for the fused W8A8 int8 MLP (models/mlp_int8.py).

Three measurements at ViT-L operating shapes (M = B*T = 80*257,
D=1024, F=4096), slope-timed (two loop lengths, cancels tunnel RTT):
  1. XLA bf16 MLP sublayer (production default)
  2. mlp_int8 kernel sublayer (block_m sweep)
  3. end-to-end ViT-L vision tower, mlp_int8 off vs on (B sweep)
plus the numerics delta of (3): max|dP| on probit-softmax probs,
argmax flips (the BASELINE.md calibration methodology).

Usage: python scripts/dev/bench_mlp_int8.py [sublayer|tower|both]
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
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    flops = 4 * M * D * F

    def xla_builder(n):
        @jax.jit
        def loop(x, w1b, b1, w2b, b2):
            def body(i, carry):
                xx = x + (carry * 1e-20).astype(x.dtype)
                h = jax.nn.gelu(
                    (xx @ w1b).astype(jnp.float32) + b1, approximate=True
                ).astype(x.dtype)
                out = (h @ w2b).astype(jnp.float32) + b2
                return jnp.sum(out) * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    ms = slope_ms(xla_builder, (x, w1b, b1, w2b, b2))
    print(f"XLA bf16 MLP sublayer: {ms:.3f} ms = {flops/ms/1e9:.1f} Top/s")

    for bm in (128, 256, 512):
        def int8_builder(n, bm=bm):
            @jax.jit
            def loop(x, w1, b1, w2, b2):
                def body(i, carry):
                    xx = x + (carry * 1e-20).astype(x.dtype)
                    out = mlp_int8(xx, w1, b1, w2, b2,
                                   act_name="gelu_tanh", block_m=bm)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-20
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return loop

        try:
            ms = slope_ms(int8_builder, (x, w1, b1, w2, b2))
        except Exception as e:
            print(f"mlp_int8 block_m={bm}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(f"mlp_int8 block_m={bm}: {ms:.3f} ms = {flops/ms/1e9:.1f} "
              f"Top/s")


def bench_fused_sublayer():
    """Whole pre-LN MLP sublayer x + fc2(act(fc1(LN(x)))): the fused-LN
    kernel vs (XLA fp32 LN -> unfused kernel -> residual add). Gain =
    the ~5 [M, D] HBM touches the fusion removes."""
    B, T, D, F = 80, 257, 1024, 4096
    M = B * T
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.02, size=(D, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.01, size=(F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, size=(F, D)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.01, size=(D,)), jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, size=(D,)), jnp.float32)
    bt = jnp.asarray(rng.normal(0, 0.1, size=(D,)), jnp.float32)
    flops = 4 * M * D * F

    def unfused_builder(n):
        @jax.jit
        def loop(x, w1, b1, w2, b2):
            def body(i, carry):
                xx = x + (carry * 1e-20).astype(x.dtype)
                xf = xx.astype(jnp.float32)
                mu = xf.mean(-1, keepdims=True)
                var = ((xf - mu) ** 2).mean(-1, keepdims=True)
                h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + bt
                     ).astype(x.dtype)
                out = xx + mlp_int8(h, w1, b1, w2, b2,
                                    act_name="gelu_tanh")
                return jnp.sum(out.astype(jnp.float32)) * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    ms = slope_ms(unfused_builder, (x, w1, b1, w2, b2))
    print(f"LN->mlp_int8->residual (unfused): {ms:.3f} ms = "
          f"{flops/ms/1e9:.1f} Top/s")

    for bm in (256, 512):
        def fused_builder(n, bm=bm):
            @jax.jit
            def loop(x, w1, b1, w2, b2):
                def body(i, carry):
                    xx = x + (carry * 1e-20).astype(x.dtype)
                    out = mlp_int8(xx, w1, b1, w2, b2,
                                   act_name="gelu_tanh", block_m=bm,
                                   ln_scale=g, ln_bias=bt, ln_eps=1e-5)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-20
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return loop

        ms = slope_ms(fused_builder, (x, w1, b1, w2, b2))
        print(f"fused-LN kernel block_m={bm}: {ms:.3f} ms = "
              f"{flops/ms/1e9:.1f} Top/s")


def build_tower(mlp_int8_on):
    cfg = CLIP_L14_CONFIG
    vcfg = dataclasses.replace(cfg.vision, attn_pallas=True,
                               mlp_int8=mlp_int8_on)
    module = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    return module, cast_gemm_params(params, jnp.bfloat16)


def bench_tower(batches=(64, 80, 96)):
    module_off, params = build_tower(False)
    module_on, _ = build_tower(True)
    rng = np.random.default_rng(1)

    for B in batches:
        pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)),
                             jnp.bfloat16)
        rates = {}
        for name, module in (("bf16", module_off), ("int8", module_on)):
            def builder(n, module=module):
                @jax.jit
                def loop(params, pixels):
                    def body(i, carry):
                        xx = pixels + (carry * 1e-20).astype(pixels.dtype)
                        out = module.apply({"params": params}, xx)
                        return jnp.sum(out[0][0]).astype(jnp.float32)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return loop

            ms = slope_ms(builder, (params, pixels))
            rates[name] = B / ms * 1e3
            print(f"  B={B} {name}: {rates[name]:.1f} img/s "
                  f"({ms:.2f} ms/batch)")
        print(f"  B={B} speedup: x{rates['int8']/rates['bf16']:.3f}")

    # numerics: probit-softmax prob deltas at B=80 (calibration proxy)
    B = 80
    pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.bfloat16)
    e_off = np.asarray(jax.jit(lambda p, x: module_off.apply(
        {"params": p}, x)[0])(params, pixels), np.float32)
    e_on = np.asarray(jax.jit(lambda p, x: module_on.apply(
        {"params": p}, x)[0])(params, pixels), np.float32)
    C = 100
    te = np.random.default_rng(2).normal(size=(C, e_off.shape[-1]))
    te = te / np.linalg.norm(te, axis=-1, keepdims=True)

    def probs(e):
        en = e / np.linalg.norm(e, axis=-1, keepdims=True)
        logits = 100.0 * en @ te.T
        z = logits - logits.max(-1, keepdims=True)
        p = np.exp(z)
        return p / p.sum(-1, keepdims=True)

    p_off, p_on = probs(e_off), probs(e_on)
    flips = int((p_off.argmax(-1) != p_on.argmax(-1)).sum())
    print(f"  numerics @B=80,C=100: max|dP|={np.abs(p_off-p_on).max():.2e} "
          f"mean|dP|={np.abs(p_off-p_on).mean():.2e} argmax flips "
          f"{flips}/{B}; emb rel-L2 "
          f"{np.linalg.norm(e_on-e_off)/np.linalg.norm(e_off):.2e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("sublayer", "both"):
        bench_sublayer()
    if mode == "fused":
        bench_fused_sublayer()
    if mode in ("tower", "both"):
        bench_tower(batches=(32, 64, 80))
