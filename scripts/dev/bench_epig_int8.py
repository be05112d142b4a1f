#!/usr/bin/env python
"""int8 EPIG joint-entropy kernel: speed + score quality at the
reference operating point (pool 4000 x targets 2000 x C=65, S MC
samples). Slope-timed; quality vs the bf16-contract XLA path (the
parity target) and vs the across-seed MC noise floor (BASELINE.md
round-4 free-128 study methodology).

Usage: python scripts/dev/bench_epig_int8.py [speed|quality|both]
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

from bayesvlm_tpu.select.epig_pallas import epig_from_probs_pallas

N_P, N_T, C = 4000, 2000, 65
N_SHORT, N_LONG = 2, 8


def _probs(seed, n, k, c):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(n, k, c)).astype(np.float32)
    e = np.exp(z - z.max(-1, keepdims=True))
    return jnp.asarray(e / e.sum(-1, keepdims=True))


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


def speed(S=100):
    pool = _probs(0, N_P, S, C)
    targ = _probs(1, N_T, S, C)
    for name, int8 in (("bf16", False), ("int8", True)):
        def builder(n, int8=int8):
            @jax.jit
            def loop(pool, targ):
                def body(i, carry):
                    p = pool + (carry * 1e-20)
                    s = epig_from_probs_pallas(p, targ, use_int8=int8)
                    return s[0] * 1e-20
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return loop

        ms = slope_ms(builder, (pool, targ))
        print(f"  S={S} {name}: {ms:.1f} ms/step", flush=True)


def quality(S=100, seeds=4):
    from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul

    errs, top1, top50, mc_stds = [], 0, [], []
    base_scores = None
    for seed in range(seeds):
        pool = _probs(100 + seed, N_P, S, C)
        targ = _probs(200 + seed, N_T, S, C)
        ref = np.asarray(epig_from_probs_using_matmul(
            pool, targ, use_pallas=False))
        got = np.asarray(epig_from_probs_pallas(pool, targ, use_int8=True))
        d = np.abs(got - ref)
        errs.append((d.max(), d.mean()))
        top1 += int(np.argmax(got) == np.argmax(ref))
        k = 50
        o = len(set(np.argsort(got)[-k:]) & set(np.argsort(ref)[-k:])) / k
        top50.append(o)
        if seed == 0:
            base_scores = ref
        print(f"  seed {seed}: max|d|={d.max():.2e} mean|d|={d.mean():.2e} "
              f"top1 {'OK' if np.argmax(got) == np.argmax(ref) else 'FLIP'} "
              f"top50 overlap {o:.2f}", flush=True)
    print(f"  summary: top1 {top1}/{seeds}, top50 mean "
          f"{np.mean(top50):.3f}, score scale ~{np.abs(base_scores).max():.3f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("speed", "both"):
        speed()
    if mode in ("quality", "both"):
        quality()
