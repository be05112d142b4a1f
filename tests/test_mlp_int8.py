"""Fused W8A8 int8 MLP kernel (models/mlp_int8.py) — interpret-mode
parity on CPU; the same kernel runs compiled on TPU (throughput +
calibration deltas in BASELINE.md).

The kernel is an APPROXIMATION (opt-in via VisionConfig.mlp_int8): the
oracle is `mlp_int8_reference`, a pure-jnp emulation of its exact
quantize/dequant math, which the kernel must match bit-for-bit; the
distance to the exact fp32 MLP is bounded loosely (int8 round-off).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.clip import CLIPVisionTower
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG, TINY_SIGLIP_CONFIG
from bayesvlm_tpu.models.mlp_int8 import (
    mlp_int8,
    mlp_int8_reference,
    quantize_weight,
)
from bayesvlm_tpu.models.siglip import SiglipVisionTower


def _rand_mlp(rng, D, F):
    w1 = jnp.asarray(rng.normal(0, 0.05, size=(D, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.01, size=(F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, size=(F, D)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.01, size=(D,)), jnp.float32)
    return w1, b1, w2, b2


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 48)
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) <= 127
    # per-channel absmax maps the largest |w| of each column to +-127
    np.testing.assert_allclose(
        np.abs(np.asarray(wq)).max(axis=0), np.full(48, 127))
    err = np.abs(np.asarray(wq.astype(jnp.float32) * s - w))
    assert err.max() <= np.asarray(s).max() / 2 + 1e-6  # round-off bound


def _assert_matches_emulation(out, ref):
    """Kernel vs emulation up to single int8-step flips: FMA contraction
    differences between the Pallas interpreter and the pure-jnp oracle
    can move a pre-round value by 1 ulp and flip `round()` by one step,
    perturbing isolated outputs by ~(r2*s2*|w2q|)/127. Flip noise is
    sparse and tiny; a systematic bug (wrong scale axis, missing /127)
    shifts EVERY element, so bound both the max and the mean."""
    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = np.abs(ref).max() + 1e-12
    d = np.abs(out - ref)
    assert d.max() <= 0.02 * scale, (d.max(), scale)
    assert d.mean() <= 0.002 * scale, (d.mean(), scale)


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh", "quick_gelu"])
@pytest.mark.parametrize("block_m", [16, 64])
def test_kernel_matches_emulation(act, block_m):
    """Interpret-mode kernel == pure-jnp emulation (up to int8-step flip
    noise), incl. ragged last row block (M=40 vs block_m=16) and the
    gelu->gelu_tanh substitution."""
    rng = np.random.default_rng(1)
    D, F = 64, 256
    x = jnp.asarray(rng.normal(size=(2, 20, D)), jnp.bfloat16)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    out = mlp_int8(x, w1, b1, w2, b2, act_name=act, block_m=block_m)
    ref = mlp_int8_reference(x, w1, b1, w2, b2, act_name=act)
    assert out.dtype == x.dtype and out.shape == x.shape
    _assert_matches_emulation(out, ref)


def test_error_vs_exact_fp32_is_int8_roundoff():
    rng = np.random.default_rng(2)
    D, F = 64, 256
    x = jnp.asarray(rng.normal(size=(4, 8, D)), jnp.float32)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    out = np.asarray(
        mlp_int8(x, w1, b1, w2, b2, act_name="gelu_tanh"), np.float32)
    h = jax.nn.gelu(x.reshape(-1, D) @ w1 + b1, approximate=True)
    exact = np.asarray((h @ w2 + b2).reshape(x.shape))
    rel = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert rel < 0.05, rel  # typical W8A8 round-off ~1-2% rel L2


def test_zero_rows_are_safe():
    """All-zero activation rows must not divide by zero in the per-row
    absmax scales."""
    rng = np.random.default_rng(3)
    D, F = 32, 64
    x = jnp.zeros((1, 4, D), jnp.float32)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    out = np.asarray(mlp_int8(x, w1, b1, w2, b2))
    assert np.isfinite(out).all()
    # exact result for x=0 is fc2(act(b1)) + b2 quantized; just sanity:
    ref = np.asarray(mlp_int8_reference(x, w1, b1, w2, b2))
    _assert_matches_emulation(out, ref)


@pytest.mark.parametrize("cfg,tower_cls,img_name", [
    (TINY_CLIP_CONFIG, CLIPVisionTower, "tiny-clip"),
    (TINY_SIGLIP_CONFIG, SiglipVisionTower, "tiny-siglip"),
])
def test_tower_with_int8_mlp_close_to_default(cfg, tower_cls, img_name):
    """mlp_int8=True swaps the kernel under an unchanged param tree; the
    tiny fp32 tower output stays within a few percent (relative) of the
    exact path."""
    img, _, _ = load_model(img_name, dtype=jnp.float32, seed=0)
    vcfg = dataclasses.replace(cfg.vision, mlp_int8=True)
    tower_q = tower_cls(vcfg, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    s = cfg.vision.image_size
    x = jnp.asarray(rng.normal(size=(2, s, s, 3)), jnp.float32)
    ref = img.module.apply({"params": img.params}, x)
    got = tower_q.apply({"params": img.params}, x)
    e_ref, e_q = np.asarray(ref[0]), np.asarray(got[0])
    rel = np.linalg.norm(e_q - e_ref) / np.linalg.norm(e_ref)
    assert rel < 0.10, rel
    # embeddings must still point the same way (cosine per row)
    cos = (e_q * e_ref).sum(-1) / (
        np.linalg.norm(e_q, axis=-1) * np.linalg.norm(e_ref, axis=-1))
    assert cos.min() > 0.98, cos


def test_non_sublane_aligned_rows():
    """M not a multiple of 32 goes through the internal row-padding path
    (a non-sublane-aligned ragged last block faults Mosaic's masked int8
    path on hardware — reproducible TPU-worker crash at M=36*257; the
    kernel now pads M up to a 32-multiple and slices the pad back off).
    Interpret mode can't reproduce the fault, but pins the padded path's
    shapes and numerics."""
    rng = np.random.default_rng(7)
    D, F = 64, 256
    for m in (36, 9252 % 128, 1, 33):  # 36*257 % 32 == 4-style raggeds
        x = jnp.asarray(rng.normal(size=(m, D)), jnp.bfloat16)
        w1, b1, w2, b2 = _rand_mlp(rng, D, F)
        out = mlp_int8(x, w1, b1, w2, b2, block_m=64)
        ref = mlp_int8_reference(x, w1, b1, w2, b2)
        assert out.shape == (m, D)
        _assert_matches_emulation(out, ref)


@pytest.mark.parametrize("m", [40, 36, 1])
def test_fused_ln_residual_matches_emulation(m):
    """The fused pre-LN sublayer variant (ln_scale/ln_bias/ln_eps set):
    kernel == emulation, incl. ragged/non-sublane-aligned rows; and the
    whole thing stays within int8 round-off of the unfused chain
    (separate fp32 LN -> kernel -> residual add)."""
    rng = np.random.default_rng(21)
    D, F = 64, 256
    x = jnp.asarray(rng.normal(size=(m, D)), jnp.bfloat16)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    g = jnp.asarray(rng.normal(1, 0.1, size=(D,)), jnp.float32)
    bt = jnp.asarray(rng.normal(0, 0.1, size=(D,)), jnp.float32)
    out = mlp_int8(x, w1, b1, w2, b2, block_m=16,
                   ln_scale=g, ln_bias=bt, ln_eps=1e-5)
    ref = mlp_int8_reference(x, w1, b1, w2, b2,
                             ln_scale=g, ln_bias=bt, ln_eps=1e-5)
    assert out.shape == x.shape
    _assert_matches_emulation(out, ref)
    # vs the unfused chain: only int8 round-off apart (the fused path
    # quantizes the fp32 LN output instead of its bf16 truncation)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + bt).astype(jnp.bfloat16)
    unfused = (xf + mlp_int8(h, w1, b1, w2, b2, block_m=16)
               .astype(jnp.float32)).astype(jnp.bfloat16)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(unfused, np.float32))
    scale = np.abs(np.asarray(unfused, np.float32)).max()
    assert d.max() <= 0.03 * scale, (d.max(), scale)


def test_fused_ln_zero_rows_safe():
    """LN of an all-zero row yields beta (var=0 guarded by eps); the
    row-padding pad rows take the same path — must stay finite."""
    rng = np.random.default_rng(22)
    D, F = 32, 64
    x = jnp.zeros((3, D), jnp.float32)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    g = jnp.ones((D,), jnp.float32)
    bt = jnp.asarray(rng.normal(0, 0.1, size=(D,)), jnp.float32)
    out = np.asarray(mlp_int8(x, w1, b1, w2, b2,
                              ln_scale=g, ln_bias=bt, ln_eps=1e-5))
    assert np.isfinite(out).all()
    ref = mlp_int8_reference(x, w1, b1, w2, b2,
                             ln_scale=g, ln_bias=bt, ln_eps=1e-5)
    _assert_matches_emulation(out, ref)


def test_prequantized_weights_match_per_call():
    """quantize_mlp_weights + mlp_int8(quant=...) must be bit-identical
    to the per-call quantize path (same math, just hoisted)."""
    from bayesvlm_tpu.models.mlp_int8 import quantize_mlp_weights

    rng = np.random.default_rng(11)
    D, F = 64, 256
    x = jnp.asarray(rng.normal(size=(40, D)), jnp.bfloat16)
    w1, b1, w2, b2 = _rand_mlp(rng, D, F)
    base = np.asarray(mlp_int8(x, w1, b1, w2, b2), np.float32)
    quant = quantize_mlp_weights(w1, w2)
    pre = np.asarray(mlp_int8(x, w1, b1, w2, b2, quant=quant), np.float32)
    np.testing.assert_array_equal(base, pre)
    # and through the fused pre-LN variant (the production mlp_int8 path)
    g = jnp.asarray(rng.normal(1, 0.1, size=(D,)), jnp.float32)
    bt = jnp.asarray(rng.normal(0, 0.1, size=(D,)), jnp.float32)
    base = np.asarray(mlp_int8(x, w1, b1, w2, b2,
                               ln_scale=g, ln_bias=bt, ln_eps=1e-5),
                      np.float32)
    pre = np.asarray(mlp_int8(x, w1, b1, w2, b2, quant=quant,
                              ln_scale=g, ln_bias=bt, ln_eps=1e-5),
                     np.float32)
    np.testing.assert_array_equal(base, pre)


def test_encoder_prequantize_int8_matches():
    """ImageEncoder.prequantize_int8 precomputes the stacked per-layer
    'int8' collection through the scan (variable_axes={'int8': 0}) and
    the forward stays bit-identical; without mlp_int8 it is a no-op."""
    from bayesvlm_tpu.models.encoders import load_model

    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    assert img.prequantize_int8() is img  # no int8 path -> no-op

    img8, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0,
                            mlp_int8=True)
    x = jnp.asarray(
        np.random.default_rng(12).normal(
            size=(3, img8.config.vision.image_size,
                  img8.config.vision.image_size, 3)), jnp.float32)
    base = img8(x)
    pre_enc = img8.prequantize_int8()
    assert pre_enc.quant_vars is not None
    L = img8.config.vision.num_layers
    leaf = jax.tree_util.tree_leaves(pre_enc.quant_vars)[0]
    assert leaf.shape[0] == L  # stacked per-layer like params
    pre = pre_enc(x)
    np.testing.assert_array_equal(np.asarray(base.embeds),
                                  np.asarray(pre.embeds))

def test_prequantize_cache_invalidates_on_params_swap():
    """ADVICE round-2: a full params swap after prequantize_int8() must
    not serve int8 weights derived from the old parameters. The cache
    self-validates per call: projection-only updates keep it (no
    recompute, no warning); a swap of MLP weights triggers a warned
    requantize and the output matches a fresh prequantization."""
    import dataclasses
    import warnings

    from bayesvlm_tpu.models.encoders import load_model

    img8, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0,
                            mlp_int8=True)
    x = jnp.asarray(
        np.random.default_rng(13).normal(
            size=(2, img8.config.vision.image_size,
                  img8.config.vision.image_size, 3)), jnp.float32)
    pre = img8.prequantize_int8()

    # projection-only update: cache stays, no warning
    proj = dict(pre.projection_tree())
    proj["kernel"] = proj["kernel"] * 2.0
    pre_proj = pre.with_projection(proj)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out_proj = pre_proj(x)
    assert pre_proj.quant_vars is pre.quant_vars

    # full swap (different seed = different MLP weights): warned requant
    img8b, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=7,
                             mlp_int8=True)
    swapped = dataclasses.replace(pre, params=img8b.params)
    with pytest.warns(RuntimeWarning, match="recomputing the W8A8"):
        out_swapped = swapped(x)
    fresh = img8b.prequantize_int8()(x)
    np.testing.assert_array_equal(np.asarray(out_swapped.embeds),
                                  np.asarray(fresh.embeds))
    # and the healed cache does not warn again
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        swapped(x)

def test_weight_bits4_kernel_matches_emulation():
    """W4A8 lane (weight_bits=4, jnp.int4 weights): kernel == pure-jnp
    oracle exactly, and the quantization error sits in the expected band
    (worse than W8A8, but bounded by the +-7-level round-off)."""
    from bayesvlm_tpu.models.mlp_int8 import (
        mlp_int8, mlp_int8_reference, quantize_weight,
    )

    rng = np.random.default_rng(21)
    M, D, F = 48, 32, 64
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32)

    out4 = mlp_int8(x, w1, b1, w2, b2, block_m=32, weight_bits=4)
    ref4 = mlp_int8_reference(x, w1, b1, w2, b2, weight_bits=4)
    # 1-ulp fp32 dequant reassociation between the interpret-mode kernel
    # and the jnp oracle on this lane (scale chain instruction selection)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                               rtol=1e-5, atol=1e-6)

    # int4 weights really are int4 (range +-7)
    w1q, s1 = quantize_weight(w1, bits=4)
    assert w1q.dtype == jnp.int4
    assert int(jnp.max(jnp.abs(w1q.astype(jnp.int32)))) <= 7

    # error ordering: fp32 exact > W8A8 > W4A8, both within sane bands
    exact = (jnp.tanh(0.0),)  # no-op to keep jax warm
    import jax as _jax
    def fp32_mlp(x):
        h = x @ w1 + b1
        c = jnp.float32(0.7978845608028654)
        a = 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h ** 3)))
        return a @ w2 + b2
    truth = np.asarray(fp32_mlp(x))
    err8 = np.abs(np.asarray(
        mlp_int8(x, w1, b1, w2, b2, block_m=32, weight_bits=8)) - truth)
    err4 = np.abs(np.asarray(out4) - truth)
    scale = np.abs(truth).max()
    assert err8.max() < 0.02 * scale
    assert err4.max() < 0.15 * scale
    assert err4.mean() > err8.mean()  # int4 is coarser, as expected


def test_weight_bits4_prequantized_cache():
    from bayesvlm_tpu.models.mlp_int8 import mlp_int8, quantize_mlp_weights

    rng = np.random.default_rng(22)
    M, D, F = 32, 16, 32
    x = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.1, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.1, jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    quant = quantize_mlp_weights(w1, w2, weight_bits=4)
    assert quant["w1q"].dtype == jnp.int4
    out_pre = mlp_int8(x, w1, b1, w2, b2, block_m=32, quant=quant,
                       weight_bits=4)
    out_dyn = mlp_int8(x, w1, b1, w2, b2, block_m=32, weight_bits=4)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-6)

def test_tower_weight_bits4_close_to_fp32():
    """mlp_weight_bits=4 threads through VisionConfig -> tower -> kernel;
    the W4A8 tower stays close to the fp32 tower (coarser than W8A8 but
    bounded), and prequantize_int8 caches int4 weights."""
    from bayesvlm_tpu.models.encoders import load_model

    base, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    img4, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0,
                            mlp_int8=True, mlp_weight_bits=4)

    x = jnp.asarray(
        np.random.default_rng(31).normal(
            size=(2, base.config.vision.image_size,
                  base.config.vision.image_size, 3)), jnp.float32)
    ref = np.asarray(base(x).embeds)
    out4 = np.asarray(img4(x).embeds)
    rel = np.linalg.norm(out4 - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel  # coarse but sane at random-init tiny scale

    pre = img4.prequantize_int8()
    leaf = jax.tree_util.tree_leaves(pre.quant_vars)[0]
    assert any(
        l.dtype == jnp.int4 for l in jax.tree_util.tree_leaves(pre.quant_vars)
    )
    out_pre = np.asarray(pre(x).embeds)
    np.testing.assert_allclose(out_pre, out4, rtol=1e-5, atol=1e-6)


def test_siglip_tower_weight_bits4_close_to_fp32():
    """Cross-family composition: mlp_weight_bits=4 threads through the
    SigLIP tower (incl. the fc1/fc2 head surgery) the same way it does
    for CLIP — W4A8 output stays bounded-close to the fp32 tower."""
    base, _, _ = load_model("tiny-siglip", dtype=jnp.float32, seed=0)
    img4, _, _ = load_model("tiny-siglip", dtype=jnp.float32, seed=0,
                            mlp_int8=True, mlp_weight_bits=4)
    s = base.config.vision.image_size
    x = jnp.asarray(
        np.random.default_rng(33).normal(size=(2, s, s, 3)), jnp.float32)
    ref = np.asarray(base(x).embeds)
    out4 = np.asarray(img4(x).embeds)
    rel = np.linalg.norm(out4 - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel
    assert np.isfinite(out4).all()


def test_weight_bits4_tower_under_gspmd_batch_sharding():
    """Multi-chip composition for the W4A8 lane: a batch-sharded GSPMD
    jit of the W4A8 tower (jnp.int4 weights through the fused MLP
    kernel) must match the unsharded forward exactly — per-row
    activation quantization is row-local and the int4 weight quantize is
    batch-independent (mirrors the W8A8 GSPMD test in
    test_linear_int8.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayesvlm_tpu.dist.mesh import make_mesh

    vcfg = dataclasses.replace(TINY_CLIP_CONFIG.vision, attn_pallas=True,
                               mlp_int8=True, mlp_weight_bits=4)
    mod = CLIPVisionTower(vcfg, dtype=jnp.float32)
    rng = np.random.default_rng(34)
    x = jnp.asarray(
        rng.normal(size=(16, vcfg.image_size, vcfg.image_size, 3)),
        jnp.float32)
    params = mod.init(jax.random.key(0), x)["params"]
    ref = mod.apply({"params": params}, x)[0]

    mesh = make_mesh(jax.devices()[:8], axis_names=("data",))
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda p, xs: mod.apply({"params": p}, xs)[0],
                out_shardings=NamedSharding(mesh, P()))
    out = f(params, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
