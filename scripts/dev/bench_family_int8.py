#!/usr/bin/env python
"""Per-family int8-MLP tower sweep: ViT-H/14 and SigLIP-base/large with
the fused W8A8 MLP kernel (models/mlp_int8.py) on vs off, slope-timed
(two loop lengths, cancels tunnel RTT). Round-6 follow-up to the ViT-L
int8 end-to-end pass (BASELINE.md "int8 MLP end-to-end").

Usage: python scripts/dev/bench_family_int8.py [model [B ...]]
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

N_SHORT, N_LONG = 4, 20

DEFAULT = {
    "clip-huge": (32, 48, 64),
    "siglip-base": (128, 192, 256),
    "siglip-large": (48, 64, 80, 96),
}


def build(model_str, int8):
    cfg = CONFIGS_BY_NAME[model_str]
    vcfg = dataclasses.replace(cfg.vision, attn_pallas=True, mlp_int8=int8)
    cls = SiglipVisionTower if cfg.family == "siglip" else CLIPVisionTower
    module = cls(vcfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    return module, cast_gemm_params(params, jnp.bfloat16), vcfg


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


def sweep(model_str, batches):
    mod_off, params, vcfg = build(model_str, False)
    mod_on, _, _ = build(model_str, True)
    print(f"== {model_str} (D={vcfg.hidden_size}, F={vcfg.mlp_dim})")
    rng = np.random.default_rng(1)
    for B in batches:
        pixels = jnp.asarray(
            rng.normal(size=(B, vcfg.image_size, vcfg.image_size, 3)),
            jnp.bfloat16)
        rates = {}
        for name, module in (("bf16", mod_off), ("int8", mod_on)):
            def builder(n, module=module):
                @jax.jit
                def loop(params, pixels):
                    def body(i, carry):
                        x = pixels + (carry * 1e-20).astype(pixels.dtype)
                        out = module.apply({"params": params}, x)
                        return jnp.sum(out[0][0]).astype(jnp.float32)
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return loop

            ms = slope_ms(builder, (params, pixels))
            rates[name] = B / ms * 1e3
            print(f"  B={B:4d} {name}: {rates[name]:8.1f} img/s "
                  f"({ms:.2f} ms/batch)", flush=True)
        print(f"  B={B:4d} speedup: x{rates['int8'] / rates['bf16']:.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        model = sys.argv[1]
        batches = tuple(int(b) for b in sys.argv[2:]) or DEFAULT[model]
        sweep(model, batches)
    else:
        for model, batches in DEFAULT.items():
            sweep(model, batches)
