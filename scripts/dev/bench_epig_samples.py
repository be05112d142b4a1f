#!/usr/bin/env python
"""EPIG MC-sample sweep: is num_samples=128 free through the Pallas
kernel (whose contraction axis pads 100->128, BASELINE.md K-cap
diagnosis), and how much does it cut score variance?

Measures, at the reference operating point (pool 4000 x targets 2000 x
C=65):
  - ms/step for S in {100, 128} through the fused Pallas kernel
  - across-seed std of the EPIG scores for S in {100, 128}, plus the
    mean |score - reference| where the reference is an S=1000 run
Ref: /root/reference/bayesvlm/epig.py:324,334 (K is the MC sample axis,
reference default 100); --epig_num_samples in the AL drivers.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul
from bayesvlm_tpu.types import ProbabilisticLogits

N_p, N_t, C = 4000, 2000, 65


def timed(S):
    rng = np.random.default_rng(0)
    mk = lambda n: jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(n, S, C)).astype(np.float32)), -1))
    pool, targ = mk(N_p), mk(N_t)

    @jax.jit
    def loop(pool, targ):
        def body(i, carry):
            p = pool + (carry * 1e-20)
            return epig_from_probs_using_matmul(p, targ)[0] * 1e-20
        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))

    float(loop(pool, targ))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(pool, targ))
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    return best * 1e3


def scores_for(S, seed, logits_pool, logits_targ):
    probs_pool = logits_pool.sample_probas(S, seed=seed)
    probs_targ = logits_targ.sample_probas(S, seed=seed + 10_000)
    return np.asarray(epig_from_probs_using_matmul(probs_pool, probs_targ))


def main():
    for S in (100, 128):
        ms = timed(S)
        print(f"S={S}: {ms:.1f} ms/step (Pallas kernel path)")

    # variance study on a smaller-but-representative slab (sampling at
    # S=1000 for the reference is the memory bound)
    n_p, n_t = 1000, 500
    rng = np.random.default_rng(1)
    mk = lambda n: ProbabilisticLogits(
        mean=jnp.asarray(rng.normal(size=(n, C)), jnp.float32) * 2,
        var=jnp.asarray(rng.uniform(0.05, 0.5, size=(n, C)), jnp.float32),
    )
    lp, lt = mk(n_p), mk(n_t)
    ref = scores_for(1000, 777, lp, lt)
    for S in (100, 128):
        runs = np.stack([scores_for(S, 100 + 17 * r, lp, lt)
                         for r in range(8)])
        seed_std = runs.std(axis=0).mean()
        bias = np.abs(runs.mean(axis=0) - ref).mean()
        err = np.abs(runs - ref[None]).mean()
        print(f"S={S}: across-seed std {seed_std:.5f}, "
              f"mean |err vs S=1000| {err:.5f}, |bias| {bias:.5f}")


if __name__ == "__main__":
    main()
