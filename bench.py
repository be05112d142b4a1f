#!/usr/bin/env python
"""Headline benchmark: CLIP ViT-L/14 probabilistic zero-shot throughput
(image-tower forward + Smith probabilistic head + probit softmax),
images/sec/chip on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no perf numbers (BASELINE.md), so the
baseline is the documented A100 estimate for the reference torch pipeline
(ViT-L/14 fp16, batched): A100_BASELINE_IMG_S below. The north-star target
is a v5e-8 slice vs one A100; the workload is embarrassingly data-parallel
(verified by the sharded-equivalence tests), so vs_baseline =
value * 8 / A100_BASELINE_IMG_S.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Documented estimate for the torch reference on A100 (see BASELINE.md):
# HF CLIPVisionModel ViT-L/14 fp16 inference at large batch reaches
# ~45-55% of A100 peak (312 TFLOP/s fp16) => ~0.16 TFLOP/img at 162 GFLOP
# per image => ~1000 img/s including the (cheap) covariance head.
A100_BASELINE_IMG_S = 1000.0
N_CHIPS_TARGET = 8  # v5e-8 slice; DP-linear workload


def _best_ms(loop, args, n_iter, reps=3):
    """Best per-iteration wall time of a jitted in-graph serialized loop
    (the tunnel-safe timing recipe: each iteration depends on the
    previous result; float() fetch is the hard sync). Change timing
    methodology HERE only — the fori_loop metrics (headline, epig, knn)
    share it; bench_hessian keeps its two-program host-sync form."""
    import time

    float(loop(*args))  # compile + warmup
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        dt = (time.perf_counter() - t0) / n_iter
        best = dt if best is None else min(best, dt)
    return best * 1e3


def _report(metric, value, unit, vs_baseline, baseline):
    """`baseline` documents the denominator's provenance — the reference
    publishes no perf numbers, so every vs_baseline here divides by
    either an analytic estimate or one of our own earlier measurements;
    the JSON must say which so the ratio can't be quoted as
    measured-vs-measured (BASELINE.md methodology section)."""
    print(json.dumps({
        "metric": metric, "value": value, "unit": unit,
        "vs_baseline": vs_baseline, "baseline": baseline,
    }))


def bench_hessian():
    """Secondary metric: K-FAC GGN accumulation pairs/sec (ViT-B/32 shapes).
    Reference baseline is the analytic estimate in BASELINE.md (~1k
    pairs/sec A100); see `--metric hessian`."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bayesvlm_tpu.bayes.hessians import activation_gram, hessian_infonce

    rng = np.random.default_rng(0)
    C, D, P = 32768, 512, 768
    src = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    act = jnp.asarray(rng.normal(size=(C, P)).astype(np.float32))
    scale = jnp.float32(4.6052)

    def class_batch():
        H = hessian_infonce(src, tgt, scale, block_size=2048)
        A = activation_gram(act)
        return float(H[0, 0]) + float(A[0, 0])

    class_batch()  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        class_batch()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    rate = C / best
    _report(
        "kfac_ggn_infonce_throughput", round(rate, 0), "pairs/sec",
        round(rate * 8 / 1000.0, 1),
        baseline="analytic estimate: reference per-sample torch loop on "
                 "A100 ~1k pairs/s (BASELINE.md), x8 chips; not measured",
    )


def bench_epig():
    """AL-step EPIG scoring at the reference operating point (pool 4000 x
    targets 2000 x C=65, S=100 MC samples) — fused Pallas joint-entropy
    kernel on TPU (select/epig_pallas.py; BASELINE.md round 3)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul

    N_p, N_t, K, C = 4000, 2000, 100, 65
    rng = np.random.default_rng(0)
    mk = lambda n: jnp.asarray(
        jax.nn.softmax(jnp.asarray(rng.normal(size=(n, K, C)).astype(np.float32)), -1)
    )
    pool, targ = mk(N_p), mk(N_t)

    @jax.jit
    def loop(pool, targ):
        def body(i, carry):
            p = pool + (carry * 1e-20)
            return epig_from_probs_using_matmul(p, targ)[0] * 1e-20
        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))

    ms = _best_ms(loop, (pool, targ), n_iter=5)
    # vs_baseline: reference fp16 torch chunked matmul on A100 at the
    # same nominal TFLOP/s assumption as the headline metric is not
    # published; report vs our own measured XLA path (52.9 ms).
    _report("epig_al_step_scoring", round(ms, 1), "ms/step",
            round(52.9 / ms, 2),
            baseline="our own measured XLA path, 52.9 ms (round 3); the "
                     "reference publishes no perf numbers")


def bench_knn():
    """Probabilistic kNN device step at reference AL scale
    ([512 x 100k] expected-cosine sims + exact top-160; BASELINE.md)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bayesvlm_tpu.ops import topk_exact
    from bayesvlm_tpu.select.knn import expected_cosine_similarity
    from bayesvlm_tpu.types import EncoderResult

    N_TEST, N_TRAIN, D, P, K_CAP = 512, 100_000, 512, 768, 160
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
    def loop(test, train, A_inv, B_diag):
        def body(i, carry):
            te = EncoderResult(
                embeds=test.embeds + carry * 1e-20,
                activations=test.activations, residuals=test.residuals,
            )
            sims = expected_cosine_similarity(te, train, A_inv, B_diag)
            vals, _ = topk_exact(sims, K_CAP)
            return vals[0, 0] * 1e-20
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    ms = _best_ms(loop, (test, train, A_inv, B_diag), n_iter=10)
    _report("knn_sims_topk_step", round(ms, 1), "ms/step",
            round(84.5 / ms, 2),
            baseline="our own measured lax.top_k path, 84.5 ms (round 3); "
                     "the reference publishes no perf numbers")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CLIP_L14_CONFIG as cfg
    from bayesvlm_tpu.probforward.smith import _smith_forward

    # production fast path: fused Pallas attention (scores stay in VMEM);
    # measured 903.2 vs 723.3 img/s at B=64 (round 2), 0 argmax flips,
    # ECE delta 3e-4 (BASELINE.md)
    vision_cfg = dataclasses.replace(cfg.vision, attn_pallas=True)
    module = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16)

    # host-side random init via eval_shape (skips the on-device init
    # compile, which dominates startup on this host)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    from bayesvlm_tpu.models.encoders import cast_gemm_params

    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype
        ),
        shapes,
    )["params"]
    # pre-cast GEMM weights to bf16: bit-identical numerics, halves the
    # weight HBM footprint; throughput-neutral here (XLA overlapped the
    # converts), kept for the memory saving
    params = cast_gemm_params(params, jnp.bfloat16)

    class _Head:
        logit_scale = jnp.asarray(4.6052, jnp.float32)

    head = _Head()

    # B=80 is the per-chip sweet spot with the staged Pallas kernel
    # (round-2 sweep, 20-iter loops: B=64: 922, B=80: 934, B=96: 834(!),
    # B=160: 935 — tiling resonances; BASELINE.md)
    B, C = 80, 1000
    D, P, Pt = (
        cfg.vision.projection_dim,
        cfg.vision.hidden_size,
        cfg.text.hidden_size,
    )
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(B, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.bfloat16,
    )
    te = jnp.asarray(rng.normal(size=(C, D)), jnp.float32)
    ta = jnp.asarray(rng.normal(size=(C, Pt)), jnp.float32)
    sA = jnp.eye(P) * 1e-3
    sB = jnp.full((D,), 1e-3)
    tA = jnp.eye(Pt) * 1e-3
    tB = jnp.full((D,), 1e-3)
    scale = head.logit_scale

    N_ITER = 20

    @jax.jit
    def loop(params, pixels):
        # in-graph serialized loop: each iteration's input depends on the
        # previous result, so the device timing cannot be skewed by host
        # async-dispatch artifacts (observed on tunneled backends).
        def body(i, carry):
            x = pixels + (carry * 1e-20).astype(pixels.dtype)
            e, a = module.apply({"params": params}, x)
            m, v = _smith_forward(
                e, a, te, ta, sA, sB, tA, tB, scale, False, False
            )
            probs = jax.nn.softmax(m / jnp.sqrt(1.0 + jnp.pi / 8 * v), axis=-1)
            return jnp.sum(probs[0]).astype(jnp.float32)
        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    ms = _best_ms(loop, (params, pixels), n_iter=N_ITER, reps=5)
    best = B * 1e3 / ms
    _report(
        "clip_vitl14_probabilistic_zeroshot_throughput",
        round(best, 1), "images/sec/chip",
        round(best * N_CHIPS_TARGET / A100_BASELINE_IMG_S, 3),
        baseline="analytic estimate: reference HF fp16 pipeline on A100 "
                 "~1000 img/s (BASELINE.md derivation); v5e-8 DP-linear "
                 "x8; NOT a measured A100 number",
    )


if __name__ == "__main__":
    if "--metric" in sys.argv and "hessian" in sys.argv:
        bench_hessian()
    elif "--metric" in sys.argv and "epig" in sys.argv:
        bench_epig()
    elif "--metric" in sys.argv and "knn" in sys.argv:
        bench_knn()
    else:
        main()
