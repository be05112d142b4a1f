#!/usr/bin/env python
"""Dev bench: EPIG joint-entropy scoring — XLA path vs fused Pallas kernel.

Reference operating point (BASELINE.md round 2): pool 4000, targets 2000,
C=65, K=100 MC samples -> 6.76 TFLOP per scoring step, measured 146.8 ms
on the XLA path. In-graph serialized fori_loop timing (host async timing
is unreliable over the tunnel).

Usage: python scripts/dev/bench_epig.py [--small] [--xla-only|--pallas-only]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    small = "--small" in sys.argv
    if small:
        N_p, N_t, C, K = 400, 200, 65, 100
    else:
        N_p, N_t, C, K = 4000, 2000, 65, 100

    rng = np.random.default_rng(0)

    def mk_probs(n):
        z = rng.normal(size=(n, K, C)).astype(np.float32)
        e = np.exp(z - z.max(-1, keepdims=True))
        return jnp.asarray(e / e.sum(-1, keepdims=True))

    probs_pool = mk_probs(N_p)
    probs_targ = mk_probs(N_t)

    from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul
    from bayesvlm_tpu.select.epig_pallas import epig_from_probs_pallas

    interpret = jax.default_backend() != "tpu"
    flop = 2.0 * (N_p * C) * K * (N_t * C)

    # correctness first (always, at whatever size we run)
    if "--pallas-only" not in sys.argv and "--xla-only" not in sys.argv:
        ref = np.asarray(epig_from_probs_using_matmul(probs_pool, probs_targ))
        got = np.asarray(epig_from_probs_pallas(probs_pool, probs_targ,
                                                interpret=interpret))
        denom = np.maximum(np.abs(ref), 1e-3)
        rel = np.abs(got - ref) / denom
        print(f"correctness: max rel {rel.max():.3e}  mean rel {rel.mean():.3e}")
        order_ref = np.argsort(ref)[::-1][:10]
        order_got = np.argsort(got)[::-1][:10]
        print(f"top-10 ranking match: {list(order_ref) == list(order_got)}"
              f"  (argmax {order_ref[0]} vs {order_got[0]})")

    N_ITER = 5

    def timed(fn, tag):
        @jax.jit
        def loop(pp, pt):
            def body(i, carry):
                p = pp + (carry * 1e-20)
                s = fn(p, pt)
                return jnp.sum(s).astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

        float(loop(probs_pool, probs_targ))  # compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(probs_pool, probs_targ))
            dt = (time.perf_counter() - t0) / N_ITER
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best*1e3:.1f} ms/step  "
              f"({flop/best/1e12:.1f} TFLOP/s effective)")
        return best

    if "--pallas-only" not in sys.argv:
        timed(epig_from_probs_using_matmul, "xla   ")
    if "--xla-only" not in sys.argv:
        timed(lambda p, t: epig_from_probs_pallas(p, t, interpret=interpret),
              "pallas")


if __name__ == "__main__":
    main()
