"""On-chip bench: probabilistic kNN device path at reference AL scale.

The AL drivers' second-hottest op after EPIG (SURVEY §3.4): expected-
cosine similarities [N_test, N_train] + top-(k+buffer). The host dedup
loop is excluded (data-dependent, runs once per strategy on ~KB arrays).

Shapes: N_test=512 selected samples, N_train=100k pool, D=512 (CLIP-B
projection), P=768 activations, k_cap=160 (k=10 + buffer 150, the
reference default).
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

from bayesvlm_tpu.select.knn import expected_cosine_similarity, wdist2
from bayesvlm_tpu.types import EncoderResult

N_TEST, N_TRAIN, D, P = 512, 100_000, 512, 768
K_CAP = 160
N_ITER = 10

rng = np.random.default_rng(0)


def mk(n):
    return EncoderResult(
        embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32),
        residuals=jnp.zeros((n, D), jnp.float32),
    )


test, train = mk(N_TEST), mk(N_TRAIN)
A_inv = jnp.asarray(rng.normal(size=(P, P)), jnp.float32)
A_inv = A_inv @ A_inv.T / P + jnp.eye(P)
B_diag = jnp.abs(jnp.asarray(rng.normal(size=(D,)), jnp.float32)) + 0.1


@jax.jit
def knn_device(test, train, A_inv, B_diag):
    def body(i, carry):
        t = test.embeds + carry * 1e-20
        te = EncoderResult(embeds=t, activations=test.activations,
                           residuals=test.residuals)
        sims = expected_cosine_similarity(te, train, A_inv, B_diag)
        vals, ids = jax.lax.top_k(sims, K_CAP)
        return jnp.sum(vals[0, :1]) * 0 + vals[0, 0] * 1e-20
    return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))


float(knn_device(test, train, A_inv, B_diag))
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    float(knn_device(test, train, A_inv, B_diag))
    best = min(best, (time.perf_counter() - t0) / N_ITER)
# FLOPs: diag covariances (2*N*P*P for a@A_inv then rowdot) + sims matmul
flops = 2 * (N_TEST + N_TRAIN) * P * P * 2 + 2 * N_TEST * N_TRAIN * D
print(f"knn cosine sims+topk [{N_TEST}x{N_TRAIN}, D={D}]: "
      f"{best*1e3:.2f} ms/step  ({flops/best/1e12:.1f} TFLOP/s equiv)")
