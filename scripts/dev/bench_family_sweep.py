#!/usr/bin/env python
"""Per-family batch sweep: give ViT-H/14 and SigLIP the ViT-L perf pass
(VERDICT round-1 weak #4). The ViT-L sweep found ±12% tiling resonances
(B=80: 934 vs B=96: 834 img/s); the recorded ViT-H (396 @B=32) and
SigLIP (2589 @B=64) numbers predate the staged kernel schedule and were
never batch-swept.

Usage: python scripts/dev/bench_family_sweep.py [clip-huge|siglip-base|
siglip-large|clip-large] [B ...]
In-graph fori_loop timing (tunnel-safe); full vision tower forward
(the Smith head adds <1%, BASELINE.md).
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
from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
from bayesvlm_tpu.models.encoders import cast_gemm_params
from bayesvlm_tpu.models.siglip import SiglipVisionTower


def build(model_str):
    cfg = CONFIGS_BY_NAME[model_str]
    vision_cfg = dataclasses.replace(cfg.vision, attn_pallas=True)
    cls = SiglipVisionTower if cfg.family == "siglip" else CLIPVisionTower
    module = cls(vision_cfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3),
                      jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    return module, cast_gemm_params(params, jnp.bfloat16), vision_cfg


def sweep(model_str, batches):
    module, params, vcfg = build(model_str)
    print(f"== {model_str} (T={(vcfg.image_size // vcfg.patch_size) ** 2}"
          f"{'+cls' if vcfg.use_class_token else ''}, "
          f"D={vcfg.hidden_size}, Dh={vcfg.hidden_size // vcfg.num_heads})")
    rng = np.random.default_rng(1)
    results = {}
    for B in batches:
        pixels = jnp.asarray(
            rng.normal(size=(B, vcfg.image_size, vcfg.image_size, 3)),
            jnp.bfloat16)
        N_ITER = 20

        @jax.jit
        def loop(params, pixels):
            def body(i, carry):
                x = pixels + (carry * 1e-20).astype(pixels.dtype)
                out = module.apply({"params": params}, x)
                return jnp.sum(out[0][0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

        float(loop(params, pixels))  # compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params, pixels))
            dt = (time.perf_counter() - t0) / N_ITER
            best = dt if best is None else min(best, dt)
        rate = B / best
        results[B] = rate
        print(f"  B={B:4d}: {rate:8.1f} img/s ({best*1e3:.2f} ms/batch)")
    best_b = max(results, key=results.get)
    print(f"  sweet spot: B={best_b} at {results[best_b]:.1f} img/s")
    return results


if __name__ == "__main__":
    args = sys.argv[1:]
    model = args[0] if args else "clip-huge"
    batches = [int(a) for a in args[1:]] or [16, 32, 48, 64, 80, 96, 128]
    sweep(model, batches)
