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
import subprocess
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


def _enable_compile_cache():
    """Shared persistent compile cache with atomic (torn-write-proof) puts —
    this process's --inner children are killed by timeouts mid-run, and a
    kill during jax's non-atomic cache write leaves an entry that segfaults
    later readers (see utils.harden_compilation_cache)."""
    import os

    import jax

    from bayesvlm_tpu.utils import harden_compilation_cache

    if os.environ.get("BVT_BENCH_CPU") == "1":
        # smoke-test lane: run a metric's code path on the CPU backend
        # (tiny shapes via the BVT_* spec env overrides) without touching
        # the tunnel; the env var alone is overridden by the axon plugin
        jax.config.update("jax_platforms", "cpu")
    harden_compilation_cache()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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


# ---------------------------------------------------------------------------
# Tunnel-proofing (round 3). The axon TPU tunnel wedges transiently
# (CLAUDE.md "Environment quirks"): execution hangs, device discovery
# hangs, or it fails loud with FAILED_PRECONDITION/UNAVAILABLE; recovery
# is 2-10 min of idle time. The driver runs `python bench.py` exactly
# once per round, so bench.py itself must survive a wedge:
#   1. probe the backend with a tiny matmul IN A SUBPROCESS under
#      timeout (a hung probe can be killed without hanging bench.py),
#      exponential backoff up to ~10 min;
#   2. run the metric in a child process (`--inner`) with a generous
#      per-metric timeout;
#   3. on a failed/hung child: one recovery cycle, one retry;
#   4. on final failure: ONE structured JSON line with an "error" field
#      and rc != 0 — never a fabricated value.

_PROBE_CODE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((256, 256), jnp.float32)\n"
    "print('PROBE_OK', float((x @ x)[0, 0]))\n"
)

# metric -> child timeout (s). stage1 decodes 34.8k JPEGs on 1 vCPU and
# runs two feature passes over the tunnel; everything else is a few
# compiles + fori_loop reps.
_INNER_TIMEOUT_S = {
    "headline": 1800, "hessian": 1500, "epig": 1500, "knn": 1500,
    "serve": 2400, "family": 2400, "int8": 1800, "stage1": 10800,
    "coserve_dispatch": 3600, "fleet": 5400,
    "h2h": 3600, "epig_full": 2400, "coldstart": 7200,
}


def _log(msg):
    print(f"[bench guard] {msg}", file=sys.stderr, flush=True)


def _probe_once(timeout_s=120):
    """One tiny-matmul probe in a subprocess. Returns (ok, detail)."""
    try:
        p = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s}s (wedged tunnel)"
    if p.returncode == 0 and "PROBE_OK" in p.stdout:
        return True, "ok"
    tail = (p.stderr or p.stdout or "").strip().splitlines()
    return False, tail[-1][:300] if tail else f"probe rc={p.returncode}"


def _env_float(name, default):
    import os
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


def _wait_for_backend(budget_s=None):
    """Probe/backoff loop (the CLAUDE.md recovery recipe). True if the
    backend answered a tiny matmul within the budget. Budget is per
    attempt (two attempts per metric); BVT_BENCH_PROBE_BUDGET_S extends
    it for known long wedges (observed up to 2h+)."""
    if budget_s is None:
        budget_s = _env_float("BVT_BENCH_PROBE_BUDGET_S", 720.0)
    t0 = time.time()
    backoffs = iter([20, 40, 80, 160, 160, 160, 160])
    attempt = 0
    slept = 0.0
    while True:
        attempt += 1
        ok, detail = _probe_once()
        if ok:
            if attempt > 1:
                _log(f"backend recovered after {time.time() - t0:.0f}s "
                     f"({attempt} probes)")
            return True
        _log(f"probe {attempt} failed: {detail}")
        sleep_s = next(backoffs, 160)
        # budget counts both real elapsed time (hung probes eat their
        # timeout) and planned sleeps
        used = max(time.time() - t0, slept)
        if used + sleep_s > budget_s:
            _log(f"backend unavailable after {used:.0f}s")
            return False
        _log(f"waiting {sleep_s}s for tunnel recovery "
             f"({used:.0f}/{budget_s}s used)")
        time.sleep(sleep_s)
        slept += sleep_s


def _emit_error(metric_name, msg):
    print(json.dumps({
        "metric": metric_name, "value": None, "unit": None,
        "vs_baseline": None, "error": str(msg)[:2000],
    }))
    sys.exit(1)


def _run_guarded(metric_name):
    """Driver lane: probe, then run `bench.py --inner <metric>` in a
    child; on failure/hang do one recovery cycle and one retry."""
    timeout_s = _env_float("BVT_BENCH_INNER_TIMEOUT_S",
                           _INNER_TIMEOUT_S.get(metric_name, 1800))
    last_err = "unknown"
    for attempt in (1, 2):
        if not _wait_for_backend():
            last_err = "TPU backend unavailable (probe/backoff exhausted)"
            continue
        cmd = [sys.executable, __file__, "--inner", metric_name]
        _log(f"attempt {attempt}: running inner metric '{metric_name}' "
             f"(timeout {timeout_s}s)")
        try:
            # stderr inherited (live progress); stdout captured (the
            # JSON line must be the last thing WE print, once, on
            # success only).
            p = subprocess.run(cmd, stdout=subprocess.PIPE, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"inner run hung >{timeout_s}s (killed)"
            _log(last_err)
            continue
        out = (p.stdout or "").strip()
        if p.returncode == 0 and out:
            lines = [l for l in out.splitlines() if l.strip()]
            try:
                json.loads(lines[-1])
            except Exception:
                last_err = f"inner rc=0 but non-JSON output: {out[-300:]}"
                _log(last_err)
                continue
            for line in lines:
                print(line)
            return
        last_err = f"inner rc={p.returncode}: {out[-300:] or '(no output)'}"
        _log(last_err)
    _emit_error(_METRIC_JSON_NAME.get(metric_name, metric_name), last_err)


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

    _enable_compile_cache()

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

    _enable_compile_cache()

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

    _enable_compile_cache()

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


def bench_serve():
    """Serving latency for pipeline.ProbabilisticVLM's Stage-2 chain
    (preprocess -> image tower -> Smith head -> probit softmax) at
    B=1/8/32, C=100 class prompts, ViT-L bf16 + fused Pallas attention
    (the interactive notebook shape, ref:notebooks/zeroshot.ipynb cells
    13-18).

    Two numbers per batch size:
      - compute_ms: in-graph serialized-loop device latency (the
        hardware-true number; host async timing lies over the tunnel)
      - wall_ms p50/p95: full predict() wall time incl. host->device,
        execution, fetch — on this dev setup it carries a ~0.3-0.5 s
        tunnel round-trip floor that does NOT exist on a real host.
    Host preprocess (PIL transform) is reported separately per image.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    import dataclasses

    from PIL import Image

    from bayesvlm_tpu.data.transforms import default_transform
    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CLIP_L14_CONFIG as cfg
    from bayesvlm_tpu.models.encoders import cast_gemm_params
    from bayesvlm_tpu.probforward.smith import _smith_forward

    vision_cfg = dataclasses.replace(cfg.vision, attn_pallas=True)
    module = CLIPVisionTower(vision_cfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    params = cast_gemm_params(params, jnp.bfloat16)

    C, D, P, Pt = 100, cfg.vision.projection_dim, cfg.vision.hidden_size, \
        cfg.text.hidden_size
    te = jnp.asarray(rng_np.normal(size=(C, D)), jnp.float32)
    ta = jnp.asarray(rng_np.normal(size=(C, Pt)), jnp.float32)
    sA, sB = jnp.eye(P) * 1e-3, jnp.full((D,), 1e-3)
    tA, tB = jnp.eye(Pt) * 1e-3, jnp.full((D,), 1e-3)
    scale = jnp.asarray(4.6052, jnp.float32)

    # host preprocess cost (PIL bicubic chain)
    tform = default_transform(224)
    pil = Image.fromarray(
        rng_np.integers(0, 255, size=(480, 640, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    for _ in range(20):
        tform(pil)
    preprocess_ms = (time.perf_counter() - t0) / 20 * 1e3

    detail = {"preprocess_ms_per_image": round(preprocess_ms, 2),
              "num_classes": C, "batches": {}}
    compute_b1 = None
    for B in (1, 8, 32):
        pixels = jnp.asarray(
            rng_np.normal(size=(B, 224, 224, 3)), jnp.bfloat16)

        def predict_graph(params, pixels):
            e, a = module.apply({"params": params}, pixels)
            m, v = _smith_forward(e, a, te, ta, sA, sB, tA, tB, scale,
                                  False, False)
            return jax.nn.softmax(
                m / jnp.sqrt(1.0 + jnp.pi / 8 * v), axis=-1)

        N_ITER = 20

        @jax.jit
        def loop(params, pixels):
            def body(i, carry):
                x = pixels + (carry * 1e-20).astype(pixels.dtype)
                return jnp.sum(predict_graph(params, x)[0]).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

        compute_ms = _best_ms(loop, (params, pixels), n_iter=N_ITER, reps=3)

        def _walls(fn):
            host_pixels = np.asarray(
                rng_np.normal(size=(B, 224, 224, 3)), np.float32)
            np.asarray(fn(params, jnp.asarray(host_pixels, jnp.bfloat16)))
            ws = []
            for _ in range(15):
                t0 = time.perf_counter()
                np.asarray(fn(params, jnp.asarray(host_pixels,
                                                  jnp.bfloat16)))
                ws.append((time.perf_counter() - t0) * 1e3)
            ws.sort()
            return ws

        walls = _walls(jax.jit(predict_graph))
        # AOT single-program path with pixel-buffer donation — the
        # pipeline.compile_serving fast path (one dispatch, input buffer
        # reusable for intermediates)
        aot = (
            jax.jit(predict_graph, donate_argnums=(1,))
            .lower(params, jax.ShapeDtypeStruct(pixels.shape, pixels.dtype))
            .compile()
        )
        walls_aot = _walls(aot)
        detail["batches"][f"B{B}"] = {
            "compute_ms": round(compute_ms, 2),
            "wall_ms_p50": round(walls[len(walls) // 2], 1),
            # nearest-rank p95: ceil(0.95 n) - 1 (int(0.95 n) - 1 lands on
            # ~p90 whenever 0.95 n is not an integer, understating the tail)
            "wall_ms_p95": round(
                walls[-(-len(walls) * 95 // 100) - 1], 1),
            "wall_ms_p50_aot": round(walls_aot[len(walls_aot) // 2], 1),
        }
        if B == 1:
            compute_b1 = compute_ms

    print(json.dumps({
        "metric": "serve_probabilistic_zeroshot_latency_b1",
        "value": round(compute_b1, 2), "unit": "ms",
        "vs_baseline": None,
        "baseline": "no reference serving latency exists (scripts only); "
                    "compute_ms is in-graph device latency, wall_ms "
                    "includes this dev setup's ~0.3-0.5 s tunnel RTT "
                    "floor absent on real hosts",
        "detail": detail,
    }))


STAGE1_FIXTURE = "/root/.cache/bvt_stage1_fixture"


def _ensure_stage1_fixture(n_tars=17, per_tar=2048):
    # 17 tars = 34816 pairs: >= C=32768 survives the loaders' drop_last
    # (B=80 trims to 34800)
    """LAION-style synthetic shards: jpg (256-512 px, q85) + txt pairs.
    Generated once, reused across runs (~1.2 GB for the full 32768)."""
    import io as _io
    import os
    import tarfile

    import numpy as np
    from PIL import Image

    os.makedirs(STAGE1_FIXTURE, exist_ok=True)
    for s in range(n_tars):
        path = f"{STAGE1_FIXTURE}/{s:05d}.tar"
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(s)
        # write to a temp name and rename into place: a run killed
        # mid-write (inner timeout / watchdog exit) must not leave a
        # truncated tar that every later run trusts as complete
        tmp = f"{path}.tmp.{os.getpid()}"
        with tarfile.open(tmp, "w") as tf:
            for i in range(per_tar):
                gid = s * per_tar + i
                w, h = int(rng.integers(256, 512)), int(rng.integers(256, 512))
                small = rng.integers(0, 255, size=(h // 8, w // 8, 3),
                                     dtype=np.uint8)
                img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
                buf = _io.BytesIO()
                img.save(buf, "JPEG", quality=85)
                ti = tarfile.TarInfo(f"{gid:09d}.jpg")
                data = buf.getvalue()
                ti.size = len(data)
                tf.addfile(ti, _io.BytesIO(data))
                txt = f"synthetic caption number {gid} with some words".encode()
                tt = tarfile.TarInfo(f"{gid:09d}.txt")
                tt.size = len(txt)
                tf.addfile(tt, _io.BytesIO(txt))
        os.replace(tmp, path)
    return STAGE1_FIXTURE


def bench_stage1():
    """Stage-1 END-TO-END (SURVEY §3.1, ref:scripts/hessian_estimation.py:
    112-267): tar read -> JPEG decode -> both ViT-L towers -> GGN class
    batch (C=32768) -> lambda optimization, wall-clock on 32768 real
    LAION-style pairs. Production ingest lane: native C++ decode, uint8
    device-normalize, prefetch thread, chunked result fetches.

    Also reports per-core host feed rates for each lane and the worker
    count needed to saturate the 934 img/s chip rate on real multi-core
    hosts (this dev host has 1 vCPU and a tunneled TPU whose per-batch
    round trips serialize, so the e2e number UNDERSTATES real-host
    throughput; the feed-rate decomposition is the transferable part).
    """
    import time
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.bayes.prior import optimize_prior_precision
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HashTokenizer
    from bayesvlm_tpu.data.transforms import get_transform, get_transform_uint8
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    fixture = _ensure_stage1_fixture()
    C = 32768
    CHIP_IMG_S = 934.0  # measured headline encoder rate (BASELINE.md)

    def progress(msg):
        print(f"[stage1 +{time.time() - T_START:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    T_START = time.time()

    def make_dm(u8: bool, native: bool, threads: int = 1):
        tf_fn = (get_transform_uint8 if u8 else get_transform)("clip", 224)
        dm = DataModuleFactory(batch_size=80, num_workers=threads,
                               shuffle_train=False, train_transform=tf_fn,
                               test_transform=tf_fn).create("laion400m")
        dm.data_dir = fixture
        dm.data_path = [str(p) for p in sorted(Path(fixture).glob("*.tar"))]
        dm.setup()
        if native:
            dm.enable_native_decode(224, family="clip", num_threads=threads,
                                    out_uint8=u8)
        return dm

    # --- per-core host feed rates (2 shards = 4096 imgs, no device) ---
    feed = {}
    for name, (u8, native) in {
        "pil_float": (False, False),
        "native_float": (False, True),
        "native_u8": (True, True),
    }.items():
        dm = make_dm(u8, native)
        dm.data_path = dm.data_path[:2]
        dm.setup()
        if native:
            dm.enable_native_decode(224, family="clip", num_threads=1,
                                    out_uint8=u8)
        t0 = time.time()
        n = sum(b["image"].shape[0] for b in dm.test_dataloader())
        feed[name] = round(n / (time.time() - t0), 1)
        progress(f"feed-only {name}: {feed[name]} img/s")

    # --- end-to-end Stage-1, production lane (native decode, u8) ---
    config = CONFIGS_BY_NAME["clip-large"]
    img_enc, txt_enc, head = load_model("clip-large", dtype=jnp.bfloat16)
    txt_enc.tokenizer = HashTokenizer(
        config.text.vocab_size, config.text.max_length,
        eos_id=config.text.eos_token_id,
    )
    dm = make_dm(u8=True, native=True)
    # warm the encoder compile outside the timed region (the reference's
    # torch warmup equivalent; compile is a one-time cost amortized over
    # the 327k-pair production run)
    warm = next(iter(dm.test_dataloader()))
    img_enc(jnp.asarray(warm["image"]))
    txt_enc.encode_texts(warm["text"])
    progress("towers warm, starting timed e2e")

    t0 = time.time()
    acts_img, emb_img = compute_features(
        img_enc, dm.test_dataloader(), cache_dir=None, modality="image")
    t_img = time.time() - t0
    acts_txt, emb_txt = compute_features(
        txt_enc, dm.test_dataloader(), cache_dir=None, modality="text")
    t_txt = time.time() - t0 - t_img
    progress(f"features done: img {t_img:.0f}s txt {t_txt:.0f}s")

    t1 = time.time()
    A_img, B_img = kfac_ggn(
        head.logit_scale, head.logit_bias, C, emb_img, acts_img, emb_txt,
        "info_nce", block_size=2048)
    A_txt, B_txt = kfac_ggn(
        head.logit_scale, head.logit_bias, C, emb_txt, acts_txt, emb_img,
        "info_nce", block_size=2048)
    jax.block_until_ready((A_img, B_img, A_txt, B_txt))
    t_ggn = time.time() - t1
    progress(f"ggn done: {t_ggn:.0f}s")

    t2 = time.time()
    lam_i = float(optimize_prior_precision(
        img_enc.projection_l2(), img_enc.projection_num_params(),
        A=A_img, B=B_img, lmbda_init=800, n=1.0, lr=1e-2, num_steps=300))
    lam_t = float(optimize_prior_precision(
        txt_enc.projection_l2(), txt_enc.projection_num_params(),
        A=A_txt, B=B_txt, lmbda_init=400, n=1.0, lr=1e-2, num_steps=300))
    t_lam = time.time() - t2

    n_pairs = int(emb_img.shape[0])
    total = t_img + t_txt + t_ggn + t_lam
    rate = n_pairs / total

    # Analytic reference estimate (BASELINE.md): A100 image tower ~1000
    # img/s fp16, text ~5x that, GGN per-sample loop ~850 pairs/s
    # => serial e2e ~ 1/(1/1000 + 1/5000 + 1/850) pairs/s.
    ref_e2e = 1.0 / (1 / 1000.0 + 1 / 5000.0 + 1 / 850.0)

    detail = {
        "n_pairs": n_pairs,
        "t_image_features_s": round(t_img, 1),
        "t_text_features_s": round(t_txt, 1),
        "t_ggn_s": round(t_ggn, 1),
        "t_lambda_s": round(t_lam, 1),
        "lambda_img": round(lam_i, 3), "lambda_txt": round(lam_t, 3),
        "host_feed_img_s_per_core": feed,
        "host_feed_fraction": round(
            min(1.0, (n_pairs / feed["native_u8"]) / t_img), 3),
        "workers_to_saturate_chip": {
            k: int(np.ceil(CHIP_IMG_S / v)) for k, v in feed.items()},
        # Steady-state real-host bound from the measured components: with
        # >=2 native-u8 decode cores the image pass runs at the chip rate
        # and the GGN is sub-second warm, so e2e ~= chip-rate-limited.
        # MODELED (this host cannot overlap transfers), not measured.
        "modeled_real_host_pairs_s": round(1.0 / (
            1.0 / min(CHIP_IMG_S, 2 * feed["native_u8"])
            + 1.0 / max(1.0, n_pairs / t_txt)
            + 1.0 / 176_000.0), 1),
    }
    print(json.dumps({
        "metric": "stage1_hessian_pipeline_e2e",
        "value": round(rate, 1), "unit": "pairs/sec",
        "vs_baseline": round(rate / ref_e2e, 2),
        "baseline": "analytic estimate: reference serial A100 Stage-1 "
                    f"~{ref_e2e:.0f} pairs/s (BASELINE.md); NOT measured. "
                    "Dev-host caveat: 1 vCPU + tunneled TPU serializes "
                    "round trips — real-host e2e is feed-limited at "
                    "min(workers*feed_rate, 934) img/s",
        "detail": detail,
    }))


def bench_family():
    """Secondary metric: per-family vision-tower throughput at the swept
    sweet spots (BASELINE.md "Per-family batch sweep", round 5):
    ViT-H/14 B=48, SigLIP-base B=192, SigLIP-large B=80. Full batch
    sweep: scripts/dev/bench_family_sweep.py. Model set per
    ref:bayesvlm/vlm.py:21-25."""
    import dataclasses
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.models.encoders import cast_gemm_params
    from bayesvlm_tpu.models.siglip import SiglipVisionTower

    SWEET = {"clip-huge": 48, "siglip-base": 192, "siglip-large": 80}
    N_ITER = 20
    detail = {}
    for model_str, B in SWEET.items():
        cfg = CONFIGS_BY_NAME[model_str]
        vcfg = dataclasses.replace(cfg.vision, attn_pallas=True)
        cls = SiglipVisionTower if cfg.family == "siglip" else CLIPVisionTower
        module = cls(vcfg, dtype=jnp.bfloat16)
        rng_np = np.random.default_rng(0)
        dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3),
                          jnp.bfloat16)
        shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
        params = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                rng_np.normal(0.0, 0.02, s.shape).astype(np.float32),
                s.dtype),
            shapes)["params"]
        params = cast_gemm_params(params, jnp.bfloat16)
        pixels = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(B, vcfg.image_size, vcfg.image_size, 3)),
            jnp.bfloat16)

        @jax.jit
        def loop(params, pixels, module=module):
            def body(i, carry):
                x = pixels + (carry * 1e-20).astype(pixels.dtype)
                out = module.apply({"params": params}, x)
                return jnp.sum(out[0][0]).astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

        ms = _best_ms(loop, (params, pixels), n_iter=N_ITER)
        detail[model_str] = {"B": B, "img_s": round(B / ms * 1e3, 1)}

    print(_json.dumps({
        "metric": "family_vision_tower_throughput",
        "value": detail["clip-huge"]["img_s"], "unit": "images/sec/chip",
        "vs_baseline": round(detail["clip-huge"]["img_s"] / 396.0, 3),
        "baseline": "our own round-2 ViT-H measurement (396 img/s @B=32, "
                    "pre-staged-schedule); NOT a reference torch number",
        "detail": detail,
    }))


def bench_mem():
    """Memory-envelope metric (round-3 VERDICT #7): compiled peak-HBM per
    family at its swept sweet-spot batch, from XLA's own memory analysis
    of the AOT-compiled forward (no execution needed — safe even on a
    flaky tunnel). Documents the max-safe-batch headroom per chip that was
    previously only discoverable by OOM; table recorded in BASELINE.md."""
    import dataclasses
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.models.encoders import cast_gemm_params
    from bayesvlm_tpu.models.siglip import SiglipVisionTower

    SWEET = {
        "clip-large": 80,
        "clip-huge": 48,
        "siglip-base": 192,
        "siglip-large": 80,
    }
    on_tpu = jax.default_backend() == "tpu"
    detail = {}
    for model_str, B in SWEET.items():
        cfg = CONFIGS_BY_NAME[model_str]
        vcfg = dataclasses.replace(cfg.vision, attn_pallas=on_tpu)
        cls = SiglipVisionTower if cfg.family == "siglip" else CLIPVisionTower
        module = cls(vcfg, dtype=jnp.bfloat16)
        dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3),
                          jnp.bfloat16)
        shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
        params_abs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)["params"]
        params_abs = jax.eval_shape(
            lambda p: cast_gemm_params(p, jnp.bfloat16), params_abs)
        pixels_abs = jax.ShapeDtypeStruct(
            (B, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)

        fwd = jax.jit(lambda p, x, module=module: module.apply({"params": p}, x))
        compiled = fwd.lower(params_abs, pixels_abs).compile()
        ma = compiled.memory_analysis()

        def _b(name):
            v = getattr(ma, name, None)
            return int(v) if v is not None else 0

        args_b = _b("argument_size_in_bytes")
        out_b = _b("output_size_in_bytes")
        temp_b = _b("temp_size_in_bytes")
        alias_b = _b("alias_size_in_bytes")
        peak = args_b + out_b + temp_b - alias_b
        weights_b = sum(
            int(np.prod(s.shape)) * s.dtype.itemsize
            for s in jax.tree_util.tree_leaves(params_abs))
        detail[model_str] = {
            "B": B,
            "peak_hbm_gib": round(peak / 2**30, 3),
            "weights_gib": round(weights_b / 2**30, 3),
            "temp_gib": round(temp_b / 2**30, 3),
            "per_image_mib": round((temp_b + out_b) / B / 2**20, 2),
        }
        _log(f"mem {model_str} B={B}: peak {detail[model_str]['peak_hbm_gib']} GiB "
             f"(weights {detail[model_str]['weights_gib']}, "
             f"temp {detail[model_str]['temp_gib']})")

    v5e_hbm_gib = 16.0  # v5e per-chip HBM
    headline = detail["clip-large"]["peak_hbm_gib"]
    print(_json.dumps({
        "metric": "compiled_peak_hbm_vitl14_b80",
        "value": headline, "unit": "GiB/chip",
        "vs_baseline": round(headline / v5e_hbm_gib, 3),
        "baseline": "fraction of v5e 16 GiB per-chip HBM (XLA "
                    "memory_analysis of the AOT-compiled forward; "
                    "NOT a reference torch number)",
        "detail": detail,
    }))


def bench_coserve():
    """Co-residency metric (round 11, backs multiserve.MultiModelServer):
    ViT-L/14 (B=80) and SigLIP-base (B=192) RESIDENT on one chip at
    their swept sweet spots — solo in-graph latency each, then a
    combined program that runs both forwards per iteration (the
    co-resident duty cycle under a mixed load). interference =
    combined / (solo_a + solo_b): ~1.0 means consolidation is free on
    this hardware (weights stay resident — 0.75 GiB + 0.61 GiB compiled
    peak vs 16 GiB HBM, bench --metric mem), i.e. one chip serves both
    model families at full per-model throughput. Headline value: mixed
    aggregate images/sec through the combined cycle."""
    import dataclasses
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.models.encoders import cast_gemm_params
    from bayesvlm_tpu.models.siglip import SiglipVisionTower

    PAIR = (("clip-large", 80), ("siglip-base", 192))
    N_ITER = 20
    built = {}
    for model_str, B in PAIR:
        cfg = CONFIGS_BY_NAME[model_str]
        vcfg = dataclasses.replace(cfg.vision, attn_pallas=True)
        cls = SiglipVisionTower if cfg.family == "siglip" else CLIPVisionTower
        module = cls(vcfg, dtype=jnp.bfloat16)
        rng_np = np.random.default_rng(0)
        dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3),
                          jnp.bfloat16)
        shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
        params = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                rng_np.normal(0.0, 0.02, s.shape).astype(np.float32),
                s.dtype),
            shapes)["params"]
        params = cast_gemm_params(params, jnp.bfloat16)
        pixels = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(B, vcfg.image_size, vcfg.image_size, 3)),
            jnp.bfloat16)
        built[model_str] = (module, params, pixels, B)

    def solo_loop(module):
        @jax.jit
        def loop(params, pixels):
            def body(i, carry):
                x = pixels + (carry * 1e-20).astype(pixels.dtype)
                return jnp.sum(module.apply({"params": params}, x)[0][0]
                               ).astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))
        return loop

    detail = {}
    solo_ms = {}
    for model_str, (module, params, pixels, B) in built.items():
        ms = _best_ms(solo_loop(module), (params, pixels), n_iter=N_ITER)
        solo_ms[model_str] = ms
        detail[model_str] = {"B": B, "solo_ms": round(ms, 2),
                             "solo_img_s": round(B / ms * 1e3, 1)}

    (m_a, p_a, x_a, B_a) = built[PAIR[0][0]]
    (m_b, p_b, x_b, B_b) = built[PAIR[1][0]]

    @jax.jit
    def combined(p_a, x_a, p_b, x_b):
        def body(i, carry):
            xa = x_a + (carry * 1e-20).astype(x_a.dtype)
            s = jnp.sum(m_a.apply({"params": p_a}, xa)[0][0]
                        ).astype(jnp.float32)
            xb = x_b + (s * 1e-20).astype(x_b.dtype)
            return s + jnp.sum(m_b.apply({"params": p_b}, xb)[0][0]
                               ).astype(jnp.float32)
        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    comb_ms = _best_ms(combined, (p_a, x_a, p_b, x_b), n_iter=N_ITER)
    interference = comb_ms / (solo_ms[PAIR[0][0]] + solo_ms[PAIR[1][0]])
    mixed_img_s = (B_a + B_b) / comb_ms * 1e3
    detail["combined"] = {
        "ms": round(comb_ms, 2),
        "interference_vs_solo_sum": round(interference, 4),
    }

    print(_json.dumps({
        "metric": "coserve_vitl_siglip_mixed_throughput",
        "value": round(mixed_img_s, 1), "unit": "images/sec/chip",
        "vs_baseline": round(interference, 4),
        "baseline": "vs_baseline here = interference ratio "
                    "combined/(solo_a+solo_b) on THIS chip (1.0 = "
                    "co-residency is free); NOT a reference torch number",
        "detail": detail,
    }))


BENCH_HESSIAN_CACHE = "/root/.cache/bvt_bench_hessians"


def _synthetic_hessian_dir(model_str: str) -> str:
    """Random-SPD K-FAC factor dir with the family's true dims (the
    test-suite recipe at production scale), cached across runs. Lets the
    serving metrics construct ProbabilisticVLMs through the REAL
    from_pretrained path (load_hessians -> lambda opt -> covariances)
    instead of hand-built heads."""
    import os

    import numpy as np

    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    cfg = CONFIGS_BY_NAME[model_str]
    d = os.path.join(BENCH_HESSIAN_CACHE, model_str)
    done = os.path.join(d, ".complete")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(abs(hash(model_str)) % 2**31)

    def spd(dim, scale):
        M = rng.normal(size=(dim, dim)).astype(np.float32)
        return (M @ M.T / dim + np.eye(dim, dtype=np.float32)) * scale

    if cfg.family == "siglip":
        a_img, a_txt = cfg.vision.mlp_dim + 1, cfg.text.hidden_size + 1
    else:
        a_img, a_txt = cfg.vision.hidden_size, cfg.text.hidden_size
    D = cfg.vision.projection_dim
    save_hessians(d, spd(a_img, 40.0), spd(D, 25.0), "img")
    save_hessians(d, spd(a_txt, 35.0), spd(D, 15.0), "txt")
    save_prior_precision(d, 300.0, 1.0, 300.0, 1.0)
    open(done, "w").close()
    return d


def _serving_vlm(model_str: str, n_classes: int = 100, seed: int = 0):
    """ProbabilisticVLM via the real from_pretrained chain (random-init
    towers, synthetic full-dim K-FAC posterior), class prompts set."""
    from bayesvlm_tpu.pipeline import ProbabilisticVLM

    vlm = ProbabilisticVLM.from_pretrained(
        model_str, _synthetic_hessian_dir(model_str),
        prior_num_steps=30, mesh=None, seed=seed,
    )
    return vlm.set_class_prompts(
        [f"An image of a class {i}" for i in range(n_classes)])


def _parse_spec(env_name, default):
    """'model:batch,model:batch' env override for the serving metrics
    (lets CPU smoke tests run tiny configs through the same code)."""
    import os

    raw = os.environ.get(env_name)
    if not raw:
        return default
    out = []
    for part in raw.split(","):
        name, b = part.rsplit(":", 1)
        out.append((name, int(b)))
    return out


def bench_coserve_dispatch():
    """Co-residency through the REAL dispatcher (round-4 VERDICT #1):
    ViT-L/14 and SigLIP-base resident in one MultiModelServer, a mixed
    load pushed through submit() — separate per-model AOT programs
    multiplexed by the single dispatcher thread with the async-fetch
    resolver (pipeline_depth), NOT the fused combined-XLA-program proxy
    of --metric coserve. Headline value: aggregate wall-clock images/sec
    through the dispatcher under the mixed load; vs_baseline: dispatcher
    interference = (sum of solo-dispatcher times for the same work) /
    mixed wall time (1.0 = consolidation is free through the product
    path too).

    Dev-host caveat (reported, not hidden): every dispatch crosses the
    axon tunnel, so absolute wall rates carry host->device transfer +
    RTT that real hosts don't have; the interference ratio compares
    like with like. uint8 ingest (the production camera lane) keeps
    H2D 4x smaller."""
    import time

    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.multiserve import MultiModelServer
    from bayesvlm_tpu.serve import BatchingServer

    PAIR = _parse_spec("BVT_COSERVE_PAIR",
                       [("clip-large", 80), ("siglip-base", 192)])
    N_BATCHES = int(_env_float("BVT_COSERVE_BATCHES", 12))
    DEPTH = 4

    vlms, images = {}, {}
    for i, (name, B) in enumerate(PAIR):
        vlms[name] = _serving_vlm(name, seed=i)
        size = vlms[name].image_encoder.config.vision.image_size
        images[name] = np.random.default_rng(i).integers(
            0, 255, size=(size, size, 3), dtype=np.uint8)
        _log(f"coserve_dispatch: {name} ready (B={B})")

    batch_size = {name: B for name, B in PAIR}

    def run_load(server, work):
        """Submit `work` = [(lane, n_requests)] round-robin; returns wall
        seconds from first submit to last future resolved."""
        futs = []
        t0 = time.perf_counter()
        remaining = {name: n for name, n in work}
        while any(remaining.values()):
            for name, _ in work:
                if remaining[name]:
                    take = min(remaining[name], batch_size[name])
                    futs.extend(server.submit(name, images[name])
                                for _ in range(take))
                    remaining[name] -= take
        for f in futs:
            f.result(timeout=600)
        return time.perf_counter() - t0

    detail = {}
    solo_s = {}
    total_rows = {name: N_BATCHES * B for name, B in PAIR}
    for name, B in PAIR:
        srv = MultiModelServer(
            {name: vlms[name]}, batch_size={name: B}, max_wait_ms=0.0,
            input_dtype=jnp.uint8, max_queue=8192, pipeline_depth=DEPTH,
        ).start()
        try:
            run_load(srv, [(name, 2 * B)])  # warm dispatch path
            solo_s[name] = run_load(srv, [(name, total_rows[name])])
            st = srv.stats()[name]
            detail[name] = {
                "B": B,
                "solo_dispatch_img_s": round(total_rows[name] / solo_s[name], 1),
                "fill": round(st.fill, 4),
                "latency_ms_p50": round(st.latency_ms_p50, 1),
                "latency_ms_p95": round(st.latency_ms_p95, 1),
            }
        finally:
            srv.stop(drain=True, timeout=600)
        _log(f"coserve_dispatch solo {name}: "
             f"{detail[name]['solo_dispatch_img_s']} img/s")

    mixed = MultiModelServer(
        vlms, batch_size=batch_size, max_wait_ms=0.0,
        input_dtype=jnp.uint8, max_queue=8192, pipeline_depth=DEPTH,
    ).start()
    try:
        run_load(mixed, [(name, 2 * B) for name, B in PAIR])  # warm
        mixed_s = run_load(mixed, [(n, total_rows[n]) for n, _ in PAIR])
        for name, _ in PAIR:
            st = mixed.stats()[name]
            detail[name]["mixed_fill"] = round(st.fill, 4)
            detail[name]["mixed_latency_ms_p50"] = round(st.latency_ms_p50, 1)
        fp = mixed.hbm_footprint()
    finally:
        mixed.stop(drain=True, timeout=600)

    total = sum(total_rows.values())
    mixed_rate = total / mixed_s
    interference = sum(solo_s.values()) / mixed_s
    detail["mixed"] = {
        "wall_s": round(mixed_s, 2),
        "aggregate_img_s": round(mixed_rate, 1),
        "dispatcher_interference": round(interference, 4),
        "hbm_gib": fp,
        "pipeline_depth": DEPTH,
        "n_batches_per_lane": N_BATCHES,
    }
    print(json.dumps({
        "metric": "coserve_dispatch_mixed_throughput",
        "value": round(mixed_rate, 1), "unit": "images/sec/chip",
        "vs_baseline": round(interference, 4),
        "baseline": "vs_baseline = dispatcher interference: (sum of solo "
                    "MultiModelServer walls for the same work) / mixed "
                    "wall on THIS chip (1.0 = co-residency free through "
                    "the real submit() path). Supersedes the fused-"
                    "combined-program proxy (--metric coserve). Absolute "
                    "img/s includes this dev host's tunnel H2D/RTT per "
                    "dispatch, absent on real hosts",
        "detail": detail,
    }))


def bench_fleet():
    """Co-residency CAPACITY demo (round-4 VERDICT #1b): actually load
    the memory-envelope-predicted fleet resident on one chip — a mixed
    dozen (4x ViT-L/14 + 4x ViT-H/14 + 4x SigLIP-base, DISTINCT weight
    sets) — bring up a serving lane for each, push a burst through every
    lane via MultiModelServer.submit(), and report per-lane bring-up
    latency, compiled-HBM footprint, and the device's own bytes_in_use
    against the 16 GiB budget. Value = resident lanes all serving;
    vs_baseline = measured device HBM fraction."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.multiserve import MultiModelServer

    SPEC = _parse_spec("BVT_FLEET_SPEC",
                       [("clip-large", 32)] * 4
                       + [("clip-huge", 32)] * 4
                       + [("siglip-base", 64)] * 4)
    BURST_BATCHES = 2

    dev = jax.devices()[0]

    def hbm_gib():
        try:
            return round(dev.memory_stats()["bytes_in_use"] / 2**30, 3)
        except Exception:  # noqa: BLE001 — backend-optional API
            return None

    vlms, batch_size, images, bringup = {}, {}, {}, {}
    base_hbm = hbm_gib()
    for i, (family, B) in enumerate(SPEC):
        name = f"{family}-{i}"
        t0 = time.perf_counter()
        vlm = _serving_vlm(family, seed=i)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        vlm.compile_serving(B, input_dtype=jnp.uint8)
        t_compile = time.perf_counter() - t0
        vlms[name] = vlm
        batch_size[name] = B
        size = vlm.image_encoder.config.vision.image_size
        images[name] = np.random.default_rng(i).integers(
            0, 255, size=(size, size, 3), dtype=np.uint8)
        bringup[name] = {"build_s": round(t_build, 1),
                         "compile_s": round(t_compile, 1),
                         "hbm_gib_after": hbm_gib()}
        _log(f"fleet lane {name}: build {t_build:.1f}s + ladder "
             f"{t_compile:.1f}s, device HBM {bringup[name]['hbm_gib_after']}")

    server = MultiModelServer(
        vlms, batch_size=batch_size, max_wait_ms=0.0,
        input_dtype=jnp.uint8, max_queue=8192, pipeline_depth=4,
    ).start()
    try:
        fp = server.hbm_footprint()
        futs = {name: [] for name in vlms}
        t0 = time.perf_counter()
        for _ in range(BURST_BATCHES):
            for name in vlms:
                futs[name].extend(
                    server.submit(name, images[name])
                    for _ in range(batch_size[name]))
        lanes_ok = 0
        for name, fs in futs.items():
            probs = [f.result(timeout=600) for f in fs]
            assert all(np.isfinite(p).all() and p.shape == (100,)
                       for p in probs), f"lane {name} served bad probs"
            lanes_ok += 1
        burst_s = time.perf_counter() - t0
        burst_rows = sum(len(fs) for fs in futs.values())
    finally:
        server.stop(drain=True, timeout=600)

    hbm_final = hbm_gib()
    detail = {
        "lanes": bringup,
        "compiled_hbm_gib": fp,
        "device_bytes_in_use_gib": hbm_final,
        "device_bytes_in_use_gib_before": base_hbm,
        "burst": {"rows": burst_rows, "wall_s": round(burst_s, 2),
                  "img_s": round(burst_rows / burst_s, 1)},
        "lanes_serving": lanes_ok,
    }
    frac = (hbm_final / 16.0) if hbm_final is not None else None
    print(json.dumps({
        "metric": "fleet_resident_lanes_serving",
        "value": lanes_ok, "unit": "resident serving lanes/chip",
        "vs_baseline": round(frac, 4) if frac is not None else None,
        "baseline": "vs_baseline = measured device bytes_in_use / v5e "
                    "16 GiB HBM with the whole fleet resident (weights + "
                    "programs + covariances). Demonstrates the BASELINE.md "
                    "memory-envelope capacity claim by construction, not "
                    "extrapolation",
        "detail": detail,
    }))


def bench_int8():
    """Secondary metric: ViT-L/14 vision tower with the opt-in fused
    W8A8 int8 MLP kernel (models/mlp_int8.py, --mlp_int8 in the CLIs) at
    its swept sweet spot B=32. Approximate path — end-to-end calibration
    deltas (dECE -0.0027 on the H2H fixtures, 0/80 argmax flips) in
    BASELINE.md "int8 MLP" section; the parity headline stays bf16."""
    import dataclasses
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.models.encoders import cast_gemm_params

    B = 32
    # longer loop than the B=80 headline: at B=32 the loop body is short
    # enough that the single dispatch+fetch RTT costs ~6% at 20 iters
    # (slope-timed truth is 1124 img/s, scripts/dev/bench_mlp_int8.py)
    N_ITER = 60
    vcfg = dataclasses.replace(
        CONFIGS_BY_NAME["clip-large"].vision, attn_pallas=True, mlp_int8=True
    )
    module = CLIPVisionTower(vcfg, dtype=jnp.bfloat16)
    rng_np = np.random.default_rng(0)
    dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), dummy))
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng_np.normal(0.0, 0.02, s.shape).astype(np.float32), s.dtype),
        shapes)["params"]
    params = cast_gemm_params(params, jnp.bfloat16)
    pixels = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(B, vcfg.image_size, vcfg.image_size, 3)),
        jnp.bfloat16)

    @jax.jit
    def loop(params, pixels):
        def body(i, carry):
            x = pixels + (carry * 1e-20).astype(pixels.dtype)
            out = module.apply({"params": params}, x)
            return jnp.sum(out[0][0]).astype(jnp.float32)
        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    ms = _best_ms(loop, (params, pixels), n_iter=N_ITER)
    img_s = round(B / ms * 1e3, 1)
    print(_json.dumps({
        "metric": "vitl_vision_tower_int8_mlp_throughput",
        "value": img_s, "unit": "images/sec/chip",
        "vs_baseline": round(img_s / 935.0, 3),
        "baseline": "our own bf16 parity headline (935 img/s @B=80); "
                    "NOT a reference torch number. int8 MLP is opt-in "
                    "and approximate (calibration deltas in BASELINE.md)",
        "detail": {"B": B, "block_m": 512},
    }))


def bench_h2h():
    """Full-pipeline H2H ON THE CHIP (round-4 VERDICT #2): run the
    tests/test_e2e_reference_h2h.py fixture chain — the reference's own
    torch Stage-2 on CPU vs our scripts/zeroshot.py main() on the TPU
    backend — and report ACC/NLPD/ECE/lambda deltas for the production
    rows: fp32 (chip numerics alone), bf16 + Pallas attention (the
    parity headline's configuration), bf16+int8-MLP, and full int8.
    This pins the real end-to-end chip-numerics calibration cost that
    the CPU-bf16 suite rows cannot (conftest forces the CPU platform).

    Value = bf16+Pallas dECE vs the torch fp32 reference (the number
    quoted next to the CPU-bf16 row in BASELINE.md)."""
    import sys as _sys
    from pathlib import Path as _Path

    import jax

    _enable_compile_cache()

    tests_dir = str(_Path(__file__).resolve().parent / "tests")
    if tests_dir not in _sys.path:
        _sys.path.insert(0, tests_dir)
    import test_e2e_reference_h2h as h2h_mod  # inserts reference+scripts paths

    backend = jax.default_backend()
    _log(f"h2h: torch reference on CPU, ours on '{backend}' backend")

    class _TmpFactory:
        def mktemp(self, name):
            import tempfile

            return _Path(tempfile.mkdtemp(prefix=f"bvt_h2h_{name}_"))

    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = (
        h2h_mod.h2h.__wrapped__(_TmpFactory()))
    ref_info, (ref_acc, ref_nlpd, ref_ece), _ = h2h_mod._run_reference(
        hessian_dir, hf_vis, hf_txt)
    _log(f"h2h torch fp32 reference: ACC {ref_acc:.4f} NLPD {ref_nlpd:.4f} "
         f"ECE {ref_ece:.4f} lambda ({ref_info['lambda_img']:.3f}, "
         f"{ref_info['lambda_txt']:.3f})")

    import zeroshot as zs

    rows = {}
    for row, kw in (
        ("fp32", dict(dtype="fp32")),
        ("bf16_pallas", dict(dtype="bf16")),
        ("bf16_int8mlp", dict(dtype="bf16", mlp_int8=True)),
        ("bf16_full_int8", dict(dtype="bf16", mlp_int8=True, attn_int8=True)),
    ):
        acc, nlpd, ece = zs.main(
            dataset="synthetic", hessian_dir=str(hessian_dir),
            model_str="tiny-clip", pseudo_data_count=10, batch_size=32,
            num_workers=2, weights_dir=str(weights_dir), **kw)
        info = zs.main.last_info
        rows[row] = {
            "acc": round(acc, 4), "nlpd": round(nlpd, 5), "ece": round(ece, 5),
            "d_acc": round(acc - ref_acc, 4),
            "d_nlpd": round(nlpd - ref_nlpd, 5),
            "d_ece": round(ece - ref_ece, 5),
            "lambda_img_rel": round(
                info["lambda_img"] / ref_info["lambda_img"] - 1.0, 6),
            "lambda_txt_rel": round(
                info["lambda_txt"] / ref_info["lambda_txt"] - 1.0, 6),
        }
        _log(f"h2h {row}: dACC {rows[row]['d_acc']:+.4f} "
             f"dNLPD {rows[row]['d_nlpd']:+.5f} dECE {rows[row]['d_ece']:+.5f}")

    print(json.dumps({
        "metric": "h2h_onchip_bf16_dece",
        "value": rows["bf16_pallas"]["d_ece"], "unit": "ECE delta",
        "vs_baseline": rows["bf16_pallas"]["d_acc"],
        "baseline": "torch fp32 reference Stage-2 run live on CPU "
                    "(ref:scripts/zeroshot.py:25-128 semantics) vs our "
                    f"pipeline on the '{backend}' backend; vs_baseline "
                    "carries the ACC delta. Rows: fp32 / bf16+Pallas / "
                    "int8 variants in detail",
        "detail": {"reference": {
            "acc": round(ref_acc, 4), "nlpd": round(ref_nlpd, 5),
            "ece": round(ref_ece, 5),
            "lambda_img": round(ref_info["lambda_img"], 3),
            "lambda_txt": round(ref_info["lambda_txt"], 3),
        }, "rows": rows, "backend": backend},
    }))


def bench_epig_full():
    """FULL EPIG online budget step on chip (round-4 VERDICT #3): one
    complete select_epig_online iteration at the reference operating
    point — probabilistic forward on pool+target, MC sampling + EPIG
    scoring, argmax/dedup, SGD step on the projection, re-embedding of
    all pool/target features, rank-1 A update + InfoNCE B update, and
    the 20-step lambda re-opt (ref:bayesvlm/epig.py:44-273; ours
    select/epig.py:243). Reports wall ms/step through the REAL function
    (host syncs included — the product loop is host-driven, as is the
    reference's) plus an in-graph device-compute breakdown per phase
    using the serialized-loop recipe."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from bayesvlm_tpu.bayes.hessians import hessian_infonce
    from bayesvlm_tpu.bayes.kfac import (
        KroneckerFactorizedCovariance,
        compute_covariances,
    )
    from bayesvlm_tpu.bayes.prior import optimize_prior_precision
    from bayesvlm_tpu.probforward.smith import ProbabilisticHead
    from bayesvlm_tpu.select.epig import (
        epig_from_probs_using_matmul,
        select_epig_online,
        update_embeddings,
    )
    from bayesvlm_tpu.types import EncoderResult

    # Reference AL operating point (homeoffice-scale): CLIP-B dims,
    # pool 4000 / target 2000 / C=65 / K=100 MC samples. Env overrides
    # exist so the CPU smoke lane (BVT_BENCH_CPU=1) can run tiny shapes
    # through the same code (the XLA fallback materializes the joint).
    N_p = int(_env_float("BVT_EPIG_POOL", 4000))
    N_t = int(_env_float("BVT_EPIG_TARGET", 2000))
    C = int(_env_float("BVT_EPIG_CLASSES", 65))
    K = int(_env_float("BVT_EPIG_SAMPLES", 100))
    D, P, Pt = 512, 768, 512
    BUDGET = 5
    rng = np.random.default_rng(0)

    def er(n, p):
        return EncoderResult(
            embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
            activations=jnp.asarray(rng.normal(size=(n, p)), jnp.float32),
            residuals=jnp.zeros((n, D), jnp.float32),
        )

    def spd(dim, scale):
        M = rng.normal(size=(dim, dim)).astype(np.float32)
        return jnp.asarray((M @ M.T / dim + np.eye(dim, dtype=np.float32))
                           * scale)

    label_features = er(C, Pt)
    pool_features = er(N_p, P)
    target_features = er(N_t, P)
    pool_class_ids = jnp.asarray(rng.integers(0, C, size=(N_p,)), jnp.int32)
    kernel = jnp.asarray(rng.normal(size=(P, D)) * 0.02, jnp.float32)
    A_img, B_img = spd(P, 50.0), spd(D, 30.0)
    A_txt, B_txt = spd(Pt, 40.0), spd(D, 20.0)
    head = ProbabilisticHead.create(logit_scale=4.6052)
    cov_info = {"lambda_img": 300.0, "lambda_txt": 300.0,
                "n_img": 10.0, "n_txt": 10.0}
    common = dict(
        label_features=label_features, pool_features=pool_features,
        target_features=target_features, pool_class_ids=pool_class_ids,
        projection_kernel=kernel, projection_bias=None, head=head,
        A_img=A_img, A_txt=A_txt, B_img=B_img, B_txt=B_txt,
        cov_info=cov_info, lr=1e-3, hessian_update_scale=1.0,
        num_samples=K, seed=0, projection_l2=12.3,
        projection_num_params=P * D, mesh=None,
    )

    select_epig_online(budget=1, **common)  # compile every phase
    t0 = time.perf_counter()
    sel, scores = select_epig_online(budget=BUDGET, **common)
    wall_ms = (time.perf_counter() - t0) / BUDGET * 1e3
    assert len(sel) == BUDGET and np.isfinite(scores).all()
    _log(f"epig_full: {wall_ms:.1f} ms/step wall over {BUDGET} steps")

    # --- in-graph device-compute breakdown (serialized fori loops) ---
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt,
                                           cov_info)
    head_c = head.set_covariances(cov_img, cov_txt)

    N_IT = 5

    @jax.jit
    def loop_score(pool, targ, labels):
        def body(i, carry):
            p = EncoderResult(embeds=pool.embeds + carry * 1e-20,
                              activations=pool.activations,
                              residuals=pool.residuals)
            lp = head_c(p, labels)
            lt = head_c(targ, labels)
            pp = lp.sample_probas(K, seed=0)
            pt = lt.sample_probas(K, seed=0)
            return epig_from_probs_using_matmul(pp, pt)[0] * 1e-20
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    ms_score = _best_ms(loop_score,
                        (pool_features, target_features, label_features),
                        n_iter=N_IT)

    @jax.jit
    def loop_reembed(kernel, pool, targ):
        def body(i, carry):
            k2 = kernel + carry * 1e-20
            a = update_embeddings(k2, None, pool)
            b = update_embeddings(k2, None, targ)
            return (a.embeds[0, 0] + b.embeds[0, 0]) * 1e-20
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    ms_reembed = _best_ms(loop_reembed,
                          (kernel, pool_features, target_features),
                          n_iter=N_IT)

    emb1 = pool_features.embeds[:1]

    @jax.jit
    def loop_hess(A, B, act, emb, labels):
        def body(i, carry):
            a = act + carry * 1e-20
            A_new = jnp.outer(a[0], a[0])
            B_new = hessian_infonce(emb, labels.embeds, head_c.logit_scale)
            s0, s1 = jnp.sqrt(jnp.float32(327_680 + i)), \
                jnp.sqrt(jnp.float32(327_681 + i))
            A2 = (s0 * A + A_new) / s1
            B2 = (s0 * B + B_new) / s1
            return (A2[0, 0] + B2[0, 0]) * 1e-20
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0.0))

    ms_hess = _best_ms(
        loop_hess,
        (A_img, B_img, pool_features.activations[:1], emb1, label_features),
        n_iter=N_IT)

    def lam_once():
        return float(optimize_prior_precision(
            projection_l2_norm=12.3, projection_num_params=P * D,
            A=A_img, B=B_img, lmbda_init=300.0, n=10.0, lr=1e-3,
            num_steps=20))

    lam_once()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        lam_once()
    ms_lambda = (time.perf_counter() - t0) / 3 * 1e3  # incl. one RTT

    detail = {
        "operating_point": {"N_pool": N_p, "N_target": N_t, "C": C, "K": K,
                            "D": D, "P": P},
        "wall_ms_per_step": round(wall_ms, 1),
        "device_breakdown_ms": {
            "score (forward+sample+EPIG)": round(ms_score, 1),
            "reembed pool+target": round(ms_reembed, 2),
            "rank1_hessian_update": round(ms_hess, 2),
            "lambda_reopt_20steps_incl_rtt": round(ms_lambda, 1),
        },
        "budget_steps_timed": BUDGET,
    }
    print(json.dumps({
        "metric": "epig_full_online_step",
        "value": round(wall_ms, 1), "unit": "ms/step",
        "vs_baseline": round(ms_score / wall_ms, 3),
        "baseline": "wall ms/step through the real select_epig_online "
                    "loop (host-driven like the reference's, "
                    "ref:bayesvlm/epig.py:44-273; includes this dev "
                    "host's tunnel RTT per host sync). vs_baseline = "
                    "device-compute fraction (in-graph scoring time / "
                    "wall). No reference perf number exists",
        "detail": detail,
    }))


def bench_coldstart():
    """Serving bring-up economics (round-4 VERDICT #4): ladder
    compile_serving time for the flagship family, cold persistent cache
    vs warm, each in its OWN child process (fresh XLA, fresh cache dir
    for cold) — plus a guarded probe of jax.experimental.
    serialize_executable for instant server restarts (the known XLA
    deserialize SIGSEGV flake means this must be measured go/no-go in a
    sacrificial child, the int4 playbook)."""
    import os
    import subprocess
    import tempfile
    import time

    model = os.environ.get("BVT_COLDSTART_MODEL", "clip-large")
    sizes = os.environ.get("BVT_COLDSTART_SIZES", "8,80")
    hdir = _synthetic_hessian_dir(model)

    child_code = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
if os.environ.get("BVT_BENCH_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from bayesvlm_tpu.utils import harden_compilation_cache
harden_compilation_cache()
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from bayesvlm_tpu.pipeline import ProbabilisticVLM
t0 = time.perf_counter()
vlm = ProbabilisticVLM.from_pretrained(
    {model!r}, {hdir!r}, prior_num_steps=30, mesh=None)
vlm.set_class_prompts([f"An image of a class {{i}}" for i in range(100)])
t_build = time.perf_counter() - t0
sizes = [int(s) for s in {sizes!r}.split(",")]
per = {{}}
for b in sizes:
    t0 = time.perf_counter()
    vlm.compile_serving([s for s in sizes if s <= b], input_dtype=jnp.uint8)
    per[str(b)] = round(time.perf_counter() - t0, 2)
import numpy as np
img = np.zeros((sizes[0], *vlm._serving["image_shape"]), np.uint8)
t0 = time.perf_counter()
np.asarray(vlm.predict(img))
t_first = time.perf_counter() - t0
print("CHILD_JSON " + json.dumps(
    {{"build_s": round(t_build, 2), "ladder_s": per,
      "first_predict_s": round(t_first, 2)}}))
"""

    ser_code = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
if os.environ.get("BVT_BENCH_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np
from bayesvlm_tpu.utils import harden_compilation_cache
harden_compilation_cache()
jax.config.update("jax_compilation_cache_dir", {cache!r})
from bayesvlm_tpu.pipeline import ProbabilisticVLM
vlm = ProbabilisticVLM.from_pretrained(
    {model!r}, {hdir!r}, prior_num_steps=30, mesh=None)
vlm.set_class_prompts([f"An image of a class {{i}}" for i in range(100)])
b = int({sizes!r}.split(",")[0])
t0 = time.perf_counter()
vlm.compile_serving(b, input_dtype=jnp.uint8)
t_compile = time.perf_counter() - t0
exe = vlm._serving["programs"][b]
from jax.experimental import serialize_executable as se
t0 = time.perf_counter()
blob, in_tree, out_tree = se.serialize(exe)
t_ser = time.perf_counter() - t0
t0 = time.perf_counter()
exe2 = se.deserialize_and_load(blob, in_tree, out_tree)
t_des = time.perf_counter() - t0
enc = vlm.image_encoder
img = jnp.zeros((b, *vlm._serving["image_shape"]), jnp.uint8)
t0 = time.perf_counter()
out = np.asarray(exe2(enc.params, enc.quant_vars, vlm._label_features,
                      vlm.head, img))
t_call = time.perf_counter() - t0
ref = np.asarray(vlm.predict(np.zeros((b, *vlm._serving["image_shape"]),
                                      np.uint8)))
ok = bool(np.allclose(out, ref, rtol=1e-5, atol=1e-6))
print("CHILD_JSON " + json.dumps(
    {{"compile_s": round(t_compile, 2), "serialize_s": round(t_ser, 2),
      "blob_mib": round(len(blob) / 2**20, 1),
      "deserialize_s": round(t_des, 2), "first_call_s": round(t_call, 2),
      "matches_predict": ok}}))
"""

    def run_child(code, cache_dir, timeout=2400):
        import sys as _sys

        body = code.format(repo=str(Path(__file__).resolve().parent),
                           cache=cache_dir, model=model, hdir=hdir,
                           sizes=sizes)
        t0 = time.perf_counter()
        try:
            p = subprocess.run([_sys.executable, "-c", body],
                               capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            return None, time.perf_counter() - t0, "timeout"
        wall = time.perf_counter() - t0
        for line in (p.stdout or "").splitlines():
            if line.startswith("CHILD_JSON "):
                return json.loads(line[len("CHILD_JSON "):]), wall, "ok"
        note = (f"rc={p.returncode}"
                + (f" signal={-p.returncode}" if p.returncode < 0 else ""))
        tail = (p.stderr or "").strip().splitlines()
        return None, wall, note + (f": {tail[-1][:200]}" if tail else "")

    fresh = tempfile.mkdtemp(prefix="bvt_coldcache_")
    cold, cold_wall, cold_note = run_child(child_code, fresh)
    _log(f"coldstart cold: {cold_note} wall {cold_wall:.1f}s {cold}")
    warm, warm_wall, warm_note = run_child(child_code, fresh)
    _log(f"coldstart warm: {warm_note} wall {warm_wall:.1f}s {warm}")
    ser, ser_wall, ser_note = run_child(ser_code, fresh)
    _log(f"coldstart serialize probe: {ser_note} {ser}")

    if cold is None or warm is None:
        _emit_error("serving_coldstart_ladder",
                    f"cold: {cold_note}; warm: {warm_note}")
    cold_ladder = sum(cold["ladder_s"].values())
    warm_ladder = sum(warm["ladder_s"].values())
    detail = {
        "model": model, "ladder_sizes": sizes,
        "cold": {**cold, "process_wall_s": round(cold_wall, 1)},
        "warm": {**warm, "process_wall_s": round(warm_wall, 1)},
        "aot_serialize_probe": (
            {**ser, "verdict": "GO" if ser.get("matches_predict") else
             "NO-GO (output mismatch)"} if ser is not None
            else {"verdict": f"NO-GO ({ser_note})"}),
    }
    print(json.dumps({
        "metric": "serving_coldstart_ladder",
        "value": round(cold_ladder, 1), "unit": "s (cold ladder compile)",
        "vs_baseline": round(warm_ladder / cold_ladder, 3),
        "baseline": "vs_baseline = warm/cold ladder-compile ratio on the "
                    "persistent cache (fresh cache dir per run, own child "
                    "process each). Serialize-executable restart probe in "
                    "detail with a GO/NO-GO verdict (known XLA deserialize "
                    "flake, CLAUDE.md). No reference serving exists",
        "detail": detail,
    }))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

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


_METRIC_FNS = {
    "headline": main,
    "hessian": bench_hessian,
    "epig": bench_epig,
    "knn": bench_knn,
    "stage1": bench_stage1,
    "serve": bench_serve,
    "family": bench_family,
    "int8": bench_int8,
    "mem": bench_mem,
    "coserve": bench_coserve,
    "coserve_dispatch": bench_coserve_dispatch,
    "fleet": bench_fleet,
    "h2h": bench_h2h,
    "epig_full": bench_epig_full,
    "coldstart": bench_coldstart,
}

# metric key -> the "metric" field its JSON line carries (used for the
# structured error line so the driver can still attribute a failure)
_METRIC_JSON_NAME = {
    "headline": "clip_vitl14_probabilistic_zeroshot_throughput",
    "hessian": "kfac_ggn_infonce_throughput",
    "epig": "epig_al_step_scoring",
    "knn": "knn_sims_topk_step",
    "stage1": "stage1_hessian_pipeline_e2e",
    "serve": "serve_probabilistic_zeroshot_latency_b1",
    "family": "family_vision_tower_throughput",
    "int8": "vitl_vision_tower_int8_mlp_throughput",
    "mem": "compiled_peak_hbm_vitl14_b80",
    "coserve": "coserve_vitl_siglip_mixed_throughput",
    "coserve_dispatch": "coserve_dispatch_mixed_throughput",
    "fleet": "fleet_resident_lanes_serving",
    "h2h": "h2h_onchip_bf16_dece",
    "epig_full": "epig_full_online_step",
    "coldstart": "serving_coldstart_ladder",
}


def _pick_metric(argv):
    """Resolve the requested metric from argv. Accepts `--metric NAME`,
    `--metric=NAME`, and (legacy) a bare NAME token; an explicit
    --metric with an unknown name is an error rather than a silent
    fall-through to the headline metric."""
    for i, tok in enumerate(argv):
        name = None
        if tok == "--metric" and i + 1 < len(argv):
            name = argv[i + 1]
        elif tok.startswith("--metric="):
            name = tok.split("=", 1)[1]
        if name is not None:
            if name not in _METRIC_FNS:
                raise SystemExit(
                    f"bench.py: unknown metric {name!r} "
                    f"(choose from {sorted(_METRIC_FNS)})")
            return name
    for key in _METRIC_FNS:
        if key in argv:
            return key
    return "headline"


def _start_parent_watchdog():
    """Inner-lane safety: if the supervisor dies (e.g. the driver
    hard-kills it), exit rather than linger as a stray process holding
    the TPU tunnel — stray clients are the documented cause of the next
    wedge (CLAUDE.md)."""
    import os
    import threading

    parent = os.getppid()

    def watch():
        while True:
            time.sleep(5)
            if os.getppid() != parent:
                os._exit(3)

    threading.Thread(target=watch, daemon=True,
                     name="bvt-parent-watchdog").start()


if __name__ == "__main__":
    if "--help" in sys.argv or "-h" in sys.argv:
        print(
            "usage: python bench.py [--metric NAME] [--inner]\n"
            f"metrics: {', '.join(sorted(_METRIC_FNS))} (default: headline)\n"
            "env: BVT_BENCH_PROBE_BUDGET_S (tunnel-probe budget/attempt), "
            "BVT_BENCH_INNER_TIMEOUT_S (per-metric child timeout)\n"
            "Prints one JSON line per run; rc=1 with a structured error "
            "line if the TPU stays unreachable."
        )
        sys.exit(0)
    metric = _pick_metric(sys.argv[1:])
    if "--inner" in sys.argv:
        _start_parent_watchdog()
        _METRIC_FNS[metric]()       # child lane: run directly, let it raise
    else:
        _run_guarded(metric)        # driver lane: probe/retry supervisor
