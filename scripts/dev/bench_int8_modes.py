#!/usr/bin/env python
"""ViT-L tower throughput across the int8 modes: bf16 baseline, mlp_int8,
attn_int8, and both (the full int8 serving mode). Slope-timed (two loop
lengths, cancels tunnel RTT). Round-6 follow-up to the mlp_int8
end-to-end pass; numbers land in BASELINE.md "int8 attention
projections".

Usage: python scripts/dev/bench_int8_modes.py [B ...]
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

N_SHORT, N_LONG = 4, 20

MODES = {
    "bf16": dict(),
    "mlp": dict(mlp_int8=True),
    "attn": dict(attn_int8=True),
    "both": dict(mlp_int8=True, attn_int8=True),
}


def build(**flags):
    vcfg = dataclasses.replace(
        CLIP_L14_CONFIG.vision, attn_pallas=True, **flags)
    module = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    return module, cast_gemm_params(params, jnp.bfloat16)


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


def main(batches):
    built = {name: build(**flags) for name, flags in MODES.items()}
    _, params = built["bf16"]
    rng = np.random.default_rng(1)
    for B in batches:
        pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.bfloat16)
        base = None
        for name, (module, _) in built.items():
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
            rate = B / ms * 1e3
            if name == "bf16":
                base = rate
            print(f"  B={B:3d} {name:4s}: {rate:7.1f} img/s "
                  f"({ms:.2f} ms/batch) x{rate / base:.3f}", flush=True)


if __name__ == "__main__":
    batches = tuple(int(b) for b in sys.argv[1:]) or (32, 48, 64)
    main(batches)
