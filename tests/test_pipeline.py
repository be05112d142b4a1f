"""ProbabilisticVLM serving API: the one-call wrapper must reproduce the
manually-assembled Stage-2 chain (same lambdas, same probit probs), and
its conveniences (PIL inputs, cached class prompts, mesh auto-sharding,
MC sampling) must work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from bayesvlm_tpu.bayes.kfac import compute_covariances
from bayesvlm_tpu.bayes.prior import optimize_prior_precision
from bayesvlm_tpu.data.tokenizer import HashTokenizer
from bayesvlm_tpu.inference.predictions import make_predictions
from bayesvlm_tpu.io.artifacts import (
    load_hessians,
    save_hessians,
    save_prior_precision,
)
from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
from bayesvlm_tpu.pipeline import ProbabilisticVLM

PROMPTS = [f"An image of a thing {i}" for i in range(4)]


@pytest.fixture(scope="module")
def hessian_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline_hessians")
    rng = np.random.default_rng(0)

    def spd(d, s=0.5):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return M @ M.T / d * s + np.eye(d, dtype=np.float32)

    P, D, Pt = (TINY_CLIP_CONFIG.vision.hidden_size,
                TINY_CLIP_CONFIG.vision.projection_dim,
                TINY_CLIP_CONFIG.text.hidden_size)
    save_hessians(tmp, spd(P), spd(D), "img")
    save_hessians(tmp, spd(Pt), spd(D), "txt")
    save_prior_precision(tmp, 5.0, 1.0, 5.0, 1.0)
    return tmp


def _images(n=6, size=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, size, size, 3)).astype(np.float32)


def test_matches_manual_stage2_chain(hessian_dir):
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    )
    imgs = _images()
    probs = np.asarray(vlm.predict(imgs, class_prompts=PROMPTS))
    assert probs.shape == (6, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    # manual chain with identical defaults (zeroshot.py semantics)
    img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32)
    txt_enc.tokenizer = HashTokenizer(
        TINY_CLIP_CONFIG.text.vocab_size, TINY_CLIP_CONFIG.text.max_length,
        eos_id=TINY_CLIP_CONFIG.text.eos_token_id,
    )
    A_img, B_img = load_hessians(hessian_dir, "img")
    A_txt, B_txt = load_hessians(hessian_dir, "txt")
    info = {"n_img": 10, "n_txt": 10}
    info["lambda_img"] = float(optimize_prior_precision(
        img_enc.projection_l2(), img_enc.projection_num_params(),
        A=A_img, B=B_img, lmbda_init=300, n=10, lr=1e-2, num_steps=50))
    info["lambda_txt"] = float(optimize_prior_precision(
        txt_enc.projection_l2(), txt_enc.projection_num_params(),
        A=A_txt, B=B_txt, lmbda_init=300, n=10, lr=1e-2, num_steps=50))
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    head = head.set_covariances(cov_img, cov_txt)
    pl = make_predictions(head, img_enc(jnp.asarray(imgs)),
                          txt_enc.encode_texts(PROMPTS), batch_size=4)
    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 * pl.var)
    ref = np.asarray(jax.nn.softmax(kappa * pl.mean, axis=-1))

    assert vlm.info["lambda_img"] == pytest.approx(info["lambda_img"])
    assert vlm.info["lambda_txt"] == pytest.approx(info["lambda_txt"])
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-6)


def test_cached_prompts_pil_inputs_and_mc(hessian_dir):
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=20, mesh=None,
    ).set_class_prompts(PROMPTS)

    rng = np.random.default_rng(2)
    pils = [Image.fromarray(rng.integers(0, 255, (40, 48, 3), np.uint8))
            for _ in range(3)]
    probs = np.asarray(vlm.predict(pils))
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    mc = np.asarray(vlm.predict(pils, num_samples=16, seed=3))
    assert mc.shape == (3, 4)
    np.testing.assert_allclose(mc.sum(-1), 1.0, rtol=1e-4)
    assert not np.allclose(mc, probs)  # MC differs from probit


def test_auto_mesh_matches_single_device(hessian_dir):
    # conftest forces 8 virtual CPU devices -> "auto" shards inference
    vlm_sharded = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=20, mesh="auto",
    )
    assert vlm_sharded.mesh is not None
    vlm_dense = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=20, mesh=None,
    )
    imgs = _images(n=7)  # uneven vs the 8-device mesh
    ps = np.asarray(vlm_sharded.predict(imgs, class_prompts=PROMPTS))
    pd = np.asarray(vlm_dense.predict(imgs, class_prompts=PROMPTS))
    np.testing.assert_allclose(ps, pd, rtol=1e-5, atol=1e-6)

    # batch_size must chunk BOTH encoding and the sharded head program
    # (3 chunks of 8 over 20 rows) without changing results
    imgs = _images(n=20)
    pc = np.asarray(vlm_sharded.predict(imgs, class_prompts=PROMPTS,
                                        batch_size=4))
    pf = np.asarray(vlm_dense.predict(imgs, class_prompts=PROMPTS,
                                      batch_size=64))
    np.testing.assert_allclose(pc, pf, rtol=1e-5, atol=1e-6)

def test_compile_serving_matches_general_path(hessian_dir):
    """The AOT-fused serving program (compile_serving) must produce the
    same probit probabilities as the general predict() chain, donate
    safely (never invalidating a caller-owned device buffer), fall back
    on signature mismatch, and be invalidated by a class-count change."""
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)

    imgs = _images(n=2)
    slow = np.asarray(vlm.predict(imgs))
    assert vlm._serving is None  # not compiled yet: general path served

    vlm.compile_serving(batch_size=2)
    fast = vlm.predict(imgs)
    np.testing.assert_allclose(np.asarray(fast), slow, rtol=1e-5, atol=1e-6)

    # caller-owned device buffer survives donation (copied internally)
    dev_imgs = jnp.asarray(imgs)
    fast2 = np.asarray(vlm.predict(dev_imgs))
    assert not dev_imgs.is_deleted()
    np.testing.assert_allclose(np.asarray(dev_imgs), imgs)  # still readable
    np.testing.assert_allclose(fast2, slow, rtol=1e-5, atol=1e-6)

    # signature mismatch (different B) falls back to the general path
    imgs5 = _images(n=5, seed=2)
    out5 = np.asarray(vlm.predict(imgs5))
    assert out5.shape == (5, 4)

    # MC sampling request bypasses the probit-only fast path
    mc = np.asarray(vlm.predict(imgs, num_samples=16, seed=0))
    assert mc.shape == (2, 4)
    assert not np.allclose(mc, slow, atol=1e-12)

    # same class count: recompile not needed after set_class_prompts
    vlm.set_class_prompts([p.upper() for p in PROMPTS])
    assert vlm._serving is not None
    out_new = np.asarray(vlm.predict(imgs))
    assert out_new.shape == (2, 4)

    # changed class count invalidates the compiled program
    vlm.set_class_prompts(PROMPTS + ["An image of a thing 4"])
    assert vlm._serving is None
    out6 = np.asarray(vlm.predict(imgs))
    assert out6.shape == (2, 5)


def test_compile_serving_guards(hessian_dir):
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    )
    with pytest.raises(ValueError, match="set_class_prompts"):
        vlm.compile_serving(batch_size=1)


def test_compile_serving_sharded_matches_dense(hessian_dir):
    """The batch-sharded AOT serving lane (compile_serving on a >1-device
    mesh: pixels split over the data axis, params/labels replicated) must
    reproduce the dense single-device probs, fall back on signature
    mismatch, reject non-divisible batch sizes, and survive runtime-
    argument churn (projection update, re-encoded class prompts)."""
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh="auto",
    ).set_class_prompts(PROMPTS)
    assert vlm.mesh is not None and vlm.mesh.devices.size == 8
    vlm_dense = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)

    with pytest.raises(ValueError, match="divisible"):
        vlm.compile_serving(batch_size=6)

    vlm.compile_serving(batch_size=16)
    imgs = _images(n=16, seed=7)
    fast = np.asarray(vlm.predict(imgs))
    dense = np.asarray(vlm_dense.predict(imgs))
    np.testing.assert_allclose(fast, dense, rtol=1e-5, atol=1e-6)

    # committed device input with the wrong (single-device) placement is
    # re-pinned to the compiled sharding, and the caller's buffer survives
    dev_imgs = jnp.asarray(imgs)
    fast2 = np.asarray(vlm.predict(dev_imgs))
    assert not dev_imgs.is_deleted()
    np.testing.assert_allclose(fast2, dense, rtol=1e-5, atol=1e-6)

    # signature mismatch (uneven batch) falls back to the general
    # sharded path, which pads internally
    out7 = np.asarray(vlm.predict(_images(n=7, seed=8)))
    assert out7.shape == (7, 4)

    # a projection update introduces fresh unplaced leaves; the fast
    # path must re-pin them instead of tripping the AOT sharding check
    proj = dict(vlm.image_encoder.projection_tree())
    rng = np.random.default_rng(9)
    proj["kernel"] = proj["kernel"] * 1.3 + jnp.asarray(
        rng.normal(scale=0.2, size=proj["kernel"].shape), jnp.float32)
    vlm.image_encoder = vlm.image_encoder.with_projection(proj)
    vlm_dense.image_encoder = vlm_dense.image_encoder.with_projection(proj)
    upd = np.asarray(vlm.predict(imgs))
    upd_dense = np.asarray(vlm_dense.predict(imgs))
    assert not np.allclose(upd, dense)  # the update actually took
    np.testing.assert_allclose(upd, upd_dense, rtol=1e-5, atol=1e-6)

    # same class count: serving stays valid through re-encoded prompts
    vlm.set_class_prompts([p.upper() for p in PROMPTS])
    assert vlm._serving is not None
    assert np.asarray(vlm.predict(imgs)).shape == (16, 4)

    # bucket ladder on the mesh: every size divides the data axis, and
    # the smaller program serves a mesh-multiple batch sharded too
    vlm.set_class_prompts(PROMPTS)
    vlm_dense.set_class_prompts(PROMPTS)
    with pytest.raises(ValueError, match="divisible"):
        vlm.compile_serving([4, 16])
    vlm.compile_serving([8, 16])
    imgs8 = _images(n=8, seed=10)
    np.testing.assert_allclose(
        np.asarray(vlm.predict(imgs8)),
        np.asarray(vlm_dense.predict(imgs8)), rtol=1e-5, atol=1e-6)

def test_compile_serving_dtype_and_structure_fallbacks(hessian_dir):
    """The AOT fast path must FALL BACK (not silently mis-serve, not
    crash) when (a) a uint8 batch hits a float-compiled program — an
    astype would skip the in-graph /255+normalize lane and produce
    garbage — and (b) the runtime-argument pytree structure changed
    after compilation (int8 cache appearing/disappearing)."""
    import dataclasses

    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)
    vlm.compile_serving(batch_size=2)

    # (a) uint8 input, float32-compiled program: general path must serve
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    via_fast_api = np.asarray(vlm.predict(u8))
    vlm_plain = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)
    general = np.asarray(vlm_plain.predict(u8))
    np.testing.assert_allclose(via_fast_api, general, rtol=1e-5, atol=1e-6)
    # float64 -> float32 coercion is still allowed on the fast path
    f64 = _images(n=2).astype(np.float64)
    ok = np.asarray(vlm.predict(f64))
    np.testing.assert_allclose(
        ok, np.asarray(vlm_plain.predict(f64)), rtol=1e-5, atol=1e-6)

    # uint8-COMPILED program: the AOT graph embeds the /255+normalize
    # lane and serves uint8 batches; float inputs then fall back
    vlm_u8 = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)
    vlm_u8.compile_serving(batch_size=2, input_dtype=jnp.uint8)
    fast_u8 = np.asarray(vlm_u8.predict(u8))
    np.testing.assert_allclose(fast_u8, general, rtol=1e-5, atol=1e-6)
    f32 = _images(n=2, seed=4)
    via_fallback = np.asarray(vlm_u8.predict(f32))  # float on uint8 program
    np.testing.assert_allclose(
        via_fallback, np.asarray(vlm_plain.predict(f32)),
        rtol=1e-5, atol=1e-6)

    # (b) int8 cache structure change after compile: fall back, no crash
    vlm8 = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None, mlp_int8=True,
    ).set_class_prompts(PROMPTS)
    vlm8.compile_serving(batch_size=2)  # lowered WITH the quant cache
    imgs = _images(n=2, seed=11)
    expected = np.asarray(vlm8.predict(imgs))
    vlm8.image_encoder = dataclasses.replace(
        vlm8.image_encoder, quant_vars=None, quant_src=None)
    out = np.asarray(vlm8.predict(imgs))  # must not raise TypeError
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_compile_serving_with_int8_tower(hessian_dir):
    """compile_serving composes with the int8 production mode: the AOT
    program embeds the prequantized W8A8 lane (from_pretrained runs
    prequantize_int8 automatically) and matches the general path."""
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None, mlp_int8=True,
    ).set_class_prompts(PROMPTS)
    assert vlm.image_encoder.quant_vars is not None  # prequantized
    imgs = _images(n=2, seed=5)
    slow = np.asarray(vlm.predict(imgs))
    vlm.compile_serving(batch_size=2)
    fast = np.asarray(vlm.predict(imgs))
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_compile_serving_bucket_ladder(hessian_dir):
    """compile_serving with a LIST of batch sizes builds one AOT program
    per size; predict() dispatches any exact-size match to its program
    and falls back (correctly) for sizes outside the ladder."""
    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)
    vlm_plain = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=50, mesh=None,
    ).set_class_prompts(PROMPTS)

    vlm.compile_serving([1, 2, 4])
    assert sorted(vlm._serving["programs"]) == [1, 2, 4]
    for n in (1, 2, 4):
        imgs = _images(n=n, seed=30 + n)
        np.testing.assert_allclose(
            np.asarray(vlm.predict(imgs)),
            np.asarray(vlm_plain.predict(imgs)), rtol=1e-5, atol=1e-6)
    # B=3 has no compiled program: general path serves it
    imgs3 = _images(n=3, seed=34)
    np.testing.assert_allclose(
        np.asarray(vlm.predict(imgs3)),
        np.asarray(vlm_plain.predict(imgs3)), rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match=">= 1"):
        vlm.compile_serving([0, 2])


def test_from_pretrained_precasts_gemm_weights(hessian_dir):
    """The packaged bf16 API must ship pre-cast GEMM weights (the benches
    always did; without this every forward pays an on-device fp32->bf16
    convert of every attention/MLP weight). Projection/LN params stay
    fp32, and bf16 results are identical to the uncast encoder's."""
    import jax

    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="bf16",
        prior_num_steps=5, mesh=None,
    )
    params = vlm.image_encoder.params
    layer0 = jax.tree_util.tree_map(lambda x: x, params)
    # GEMM weights bf16
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    gemm = [l for p, l in flat if any(
        getattr(k, "key", None) in ("q_proj", "fc1", "fc2") for k in p)]
    assert gemm and all(l.dtype == jnp.bfloat16 for l in gemm)
    # Laplace projection + LN stay fp32
    proj = jax.tree_util.tree_leaves(vlm.image_encoder.projection_tree())
    assert all(l.dtype == jnp.float32 for l in proj)
    ln = [l for p, l in flat if any(
        "layer_norm" in str(getattr(k, "key", "")) or
        "layernorm" in str(getattr(k, "key", "")) for k in p)]
    assert all(l.dtype == jnp.float32 for l in ln)
    # numerics identical to the uncast bf16 encoder (the dtype=bf16
    # towers cast per call; pre-casting must be a pure no-op on values)
    vlm_ref = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="bf16",
        prior_num_steps=5, mesh=None,
    )
    import dataclasses as _dc

    from bayesvlm_tpu.models import load_model as _lm

    raw_img, _, _ = _lm("tiny-clip", dtype=jnp.bfloat16)
    vlm_ref.image_encoder = _dc.replace(vlm_ref.image_encoder,
                                        params=raw_img.params)
    imgs = _images()
    a = np.asarray(vlm.image_encoder(jnp.asarray(imgs)).embeds)
    b = np.asarray(vlm_ref.image_encoder(jnp.asarray(imgs)).embeds)
    np.testing.assert_array_equal(a, b)
