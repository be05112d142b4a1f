#!/usr/bin/env python
"""Hardware alignment stress for the int8 Pallas kernels.

Mosaic's masked int8 path crashed the TPU worker on a non-sublane-
aligned ragged last row block (M=36*257, BASELINE.md round 6); both
kernels now pad rows to a 32-multiple. This sweep drives hostile M
values (sub-tile, every residue class mod 32, block boundaries) through
mlp_int8 and linear_int8 ON CHIP and checks results against the pure-jnp
emulations — catching both crashes and silent masking corruption.

Usage: python scripts/dev/stress_int8_alignment.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bayesvlm_tpu.models.linear_int8 import linear_int8, linear_int8_reference
from bayesvlm_tpu.models.mlp_int8 import mlp_int8, mlp_int8_reference

MS = [1, 7, 8, 16, 24, 31, 32, 33, 36, 100, 255, 256, 257,
      511, 512, 513, 1023, 1025, 9252]
D, F = 256, 512


def close(a, b, tag):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = np.abs(b).max() + 1e-12
    d = np.abs(a - b)
    ok = d.max() <= 0.03 * scale
    if not ok:
        print(f"    {tag}: MISMATCH max|d|={d.max():.3e} scale={scale:.3e}")
    return ok


def main():
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.05, size=(D, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.02, size=(F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, size=(F, D)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.02, size=(D,)), jnp.float32)
    bad = 0
    for M in MS:
        x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
        try:
            got = mlp_int8(x, w1, b1, w2, b2)
            ok1 = close(got, mlp_int8_reference(x, w1, b1, w2, b2), "mlp")
        except Exception as e:
            print(f"  M={M} mlp: CRASH {type(e).__name__}: {str(e)[:90]}")
            ok1 = False
        try:
            got = linear_int8(x, w1, b1)
            ok2 = close(got, linear_int8_reference(x, w1, b1), "lin")
        except Exception as e:
            print(f"  M={M} lin: CRASH {type(e).__name__}: {str(e)[:90]}")
            ok2 = False
        # fused pre-LN sublayer variant (LN + residual inside the kernel)
        g = jnp.asarray(rng.normal(1, 0.1, size=(D,)), jnp.float32)
        bt = jnp.asarray(rng.normal(0, 0.1, size=(D,)), jnp.float32)
        try:
            got = mlp_int8(x, w1, b1, w2, b2,
                           ln_scale=g, ln_bias=bt, ln_eps=1e-5)
            ok3 = close(
                got,
                mlp_int8_reference(x, w1, b1, w2, b2,
                                   ln_scale=g, ln_bias=bt, ln_eps=1e-5),
                "mlp_ln")
        except Exception as e:
            print(f"  M={M} mlp_ln: CRASH {type(e).__name__}: {str(e)[:90]}")
            ok3 = False
        print(f"  M={M:5d}: mlp {'OK' if ok1 else 'BAD'}, "
              f"linear {'OK' if ok2 else 'BAD'}, "
              f"mlp_ln {'OK' if ok3 else 'BAD'}", flush=True)
        bad += (not ok1) + (not ok2) + (not ok3)
    print(f"{'ALL OK' if bad == 0 else f'{bad} FAILURES'} "
          f"({len(MS)} M values x 3 kernels)")


if __name__ == "__main__":
    main()
