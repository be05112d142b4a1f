#!/usr/bin/env python
"""Serving-latency comparison: ViT-L probabilistic zero-shot forward
(tower + Smith head + probit) at B=1/8/32, bf16 vs prequantized int8
MLP (ImageEncoder.prequantize_int8 semantics: the 'int8' collection is
an input, weight quantization NOT in the measured path). Slope-timed.

Per-call (non-prequantized) int8 adds the measured 1.06 ms weight
quantize on top (BASELINE.md "int8 prequantization").

Usage: python scripts/dev/bench_serve_int8.py
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
from bayesvlm_tpu.models.configs import CLIP_L14_CONFIG as cfg
from bayesvlm_tpu.models.encoders import cast_gemm_params
from bayesvlm_tpu.probforward.smith import _smith_forward

N_SHORT, N_LONG = 8, 40


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


def main():
    rng_np = np.random.default_rng(0)
    builds = {}
    for name, int8 in (("bf16", False), ("int8", True)):
        vcfg = dataclasses.replace(cfg.vision, attn_pallas=True,
                                   mlp_int8=int8)
        module = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
        builds[name] = (module, vcfg)

    module0, vcfg = builds["bf16"][0], builds["bf16"][1]
    dummy = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module0.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    params = cast_gemm_params(params, jnp.bfloat16)

    # prequantized cache through the module's mutable pass
    _, variables = builds["int8"][0].apply(
        {"params": params}, dummy.astype(jnp.float32), mutable=["int8"])
    quant = variables["int8"]

    C, D, P, Pt = 100, cfg.vision.projection_dim, cfg.vision.hidden_size, \
        cfg.text.hidden_size
    te = jnp.asarray(rng_np.normal(size=(C, D)), jnp.float32)
    ta = jnp.asarray(rng_np.normal(size=(C, Pt)), jnp.float32)
    sA, sB = jnp.eye(P) * 1e-3, jnp.full((D,), 1e-3)
    tA, tB = jnp.eye(Pt) * 1e-3, jnp.full((D,), 1e-3)
    scale = jnp.asarray(4.6052, jnp.float32)

    for B in (1, 8, 32):
        pixels = jnp.asarray(
            rng_np.normal(size=(B, 224, 224, 3)), jnp.bfloat16)
        base = None
        for name, (module, _) in builds.items():
            def predict(params, quant, pixels, module=module, name=name):
                cols = {"params": params}
                if name == "int8":
                    cols["int8"] = quant
                e, a = module.apply(cols, pixels)
                m, v = _smith_forward(e, a, te, ta, sA, sB, tA, tB, scale,
                                      False, False)
                return jax.nn.softmax(
                    m / jnp.sqrt(1.0 + jnp.pi / 8 * v), axis=-1)

            def builder(n, predict=predict):
                @jax.jit
                def loop(params, quant, pixels):
                    def body(i, carry):
                        x = pixels + (carry * 1e-20).astype(pixels.dtype)
                        return jnp.sum(predict(params, quant, x)[0]).astype(
                            jnp.float32)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return loop

            ms = slope_ms(builder, (params, quant, pixels))
            if name == "bf16":
                base = ms
            print(f"  B={B:2d} {name}: {ms:6.2f} ms/forward "
                  f"(x{base / ms:.3f})", flush=True)


if __name__ == "__main__":
    main()
