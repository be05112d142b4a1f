"""Fused Pallas attention parity (interpret mode on CPU; the same kernel
runs compiled on TPU — hardware numbers in BASELINE.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.attention_pallas import fused_attention
from bayesvlm_tpu.models.clip import CLIPVisionTower
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG


def _ref_attn(q, k, v, H):
    B, T, D = q.shape
    Dh = D // H
    qh = q.reshape(B, T, H, Dh)
    kh = k.reshape(B, T, H, Dh)
    vh = v.reshape(B, T, H, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(Dh).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(B, T, D)


def test_fused_attention_matches_einsum_fp32():
    rng = np.random.default_rng(0)
    B, T, H, Dh = 3, 29, 4, 8  # odd T exercises unaligned tiles
    q = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
    ref = np.asarray(_ref_attn(q, k, v, H))
    out = np.asarray(fused_attention(q, k, v, H))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_tower_with_pallas_attention_matches_default():
    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    vcfg = dataclasses.replace(TINY_CLIP_CONFIG.vision, attn_pallas=True)
    tower_p = CLIPVisionTower(vcfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    e_ref, a_ref = img.module.apply({"params": img.params}, x)
    e_p, a_p = tower_p.apply({"params": img.params}, x)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-5)


def test_block_kernel_matches_default():
    """Whole-sublayer kernel (QKV+MHA+out-proj in VMEM) parity. Measured
    slightly SLOWER than attn_pallas on chip (896.8 vs 903.2 img/s at
    ViT-L B=64 — XLA's batch-wide projection GEMMs beat per-program ones),
    so it stays opt-in; kept as a tested variant (BASELINE.md)."""
    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    vcfg = dataclasses.replace(TINY_CLIP_CONFIG.vision, attn_pallas_block=True)
    tower_b = CLIPVisionTower(vcfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    e_ref, a_ref = img.module.apply({"params": img.params}, x)
    e_b, a_b = tower_b.apply({"params": img.params}, x)
    np.testing.assert_allclose(np.asarray(e_b), np.asarray(e_ref),
                               rtol=1e-5, atol=1e-5)
    # param tree structure identical (converted weights load unchanged)
    p2 = tower_b.init(jax.random.key(0), x)["params"]
    ref_paths = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(img.params)[0]}
    new_paths = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(p2)[0]}
    assert ref_paths == new_paths


def test_pallas_tower_under_gspmd_batch_sharding():
    """Production multi-chip composition: a batch-sharded GSPMD jit of the
    pallas-attention tower must match the unsharded forward exactly (the
    kernel grid partitions along the sharded batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayesvlm_tpu.dist.mesh import make_mesh

    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    vcfg = dataclasses.replace(TINY_CLIP_CONFIG.vision, attn_pallas=True)
    tower = CLIPVisionTower(vcfg, dtype=jnp.float32)
    mesh = make_mesh(jax.devices()[:8], axis_names=("data",))

    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, 32, 32, 3)),
                    jnp.float32)
    ref, _ = img.module.apply({"params": img.params}, x)
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda p, xs: tower.apply({"params": p}, xs)[0],
                out_shardings=NamedSharding(mesh, P()))
    out = f(img.params, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_split_key_kernel_matches_einsum():
    """The opt-in split-key schedule (main 128-tile block + r-key
    remainder; measured slower than one-block on chip, kept as a tested
    variant) must match the reference einsum exactly in fp32 for
    several remainder widths, including the r=1 lane-reduction path."""
    rng = np.random.default_rng(3)
    for T in (129, 133, 200, 255):
        B, H, Dh = 2, 4, 8
        q = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        ref = np.asarray(_ref_attn(q, k, v, H))
        out = np.asarray(fused_attention(q, k, v, H, split_key=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"T={T}")


def test_packed_heads_kernel_matches_einsum():
    """The opt-in packed-pair schedule (two heads per 128-lane register,
    block-diagonal K'/V', segmented softmax — round-4 probe) must match
    the reference einsum in fp32; odd T exercises the unaligned segment
    boundary at column T."""
    rng = np.random.default_rng(4)
    for T in (29, 64, 131):
        B, H, Dh = 2, 4, 8
        q = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        ref = np.asarray(_ref_attn(q, k, v, H))
        out = np.asarray(fused_attention(q, k, v, H, packed_heads=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"T={T}")
    # odd head counts are rejected (no pair for the last head)
    import pytest
    with pytest.raises(ValueError, match="even head count"):
        fused_attention(q[:, :, :24], k[:, :, :24], v[:, :, :24], 3,
                        packed_heads=True)


def test_pick_head_group_always_divides_num_heads():
    """_mha_block_kernel iterates range(num_heads // group) head-groups;
    a non-divisor group would silently skip the trailing heads. The
    VMEM-budget reduction must therefore step through divisors (the old
    halving produced e.g. 3 for 14 heads at large T)."""
    from bayesvlm_tpu.models.attention_pallas import _pick_head_group

    for H in (12, 14, 16, 18, 28):
        for T in (257, 512, 1024):
            for D in (768, 896, 1024, 1280):
                g = _pick_head_group(H, T, D, itemsize=2)
                assert H % g == 0, (H, T, D, g)
    # production ViT-L shapes keep the same group as the old halving
    # (16 -> 4 under the VMEM budget), so perf behavior is unchanged
    assert _pick_head_group(16, 257, 1024, 2) == 4
    # small shapes keep the full group when the scratch fits
    assert _pick_head_group(16, 64, 512, 2) == 16


def test_cross_attention_with_use_pallas_falls_back():
    """use_pallas must not route cross-attention with Tq != Tk into the
    fused kernel (its BlockSpecs are built from q's sequence length and
    would slice k/v to the first Tq keys). The guard falls back to the
    einsum path, so outputs match the use_pallas=False module exactly."""
    from bayesvlm_tpu.models.layers import MultiHeadAttention

    rng = np.random.default_rng(3)
    B, Tq, Tk, H, Dh = 2, 1, 9, 4, 8
    D = H * Dh
    q = jnp.asarray(rng.normal(size=(B, Tq, D)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(B, Tk, D)), jnp.float32)

    ref_mod = MultiHeadAttention(hidden_size=D, num_heads=H,
                                 dtype=jnp.float32, use_pallas=False)
    params = ref_mod.init(jax.random.key(0), q, kv)["params"]
    ref = ref_mod.apply({"params": params}, q, kv)

    pallas_mod = MultiHeadAttention(hidden_size=D, num_heads=H,
                                    dtype=jnp.float32, use_pallas=True)
    out = pallas_mod.apply({"params": params}, q, kv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # same-length cross-attention (Tq == Tk) is still allowed through the
    # kernel — shapes are what the BlockSpecs depend on, not aliasing
    kv2 = jnp.asarray(rng.normal(size=(B, 9, D)), jnp.float32)
    q2 = jnp.asarray(rng.normal(size=(B, 9, D)), jnp.float32)
    ref2 = ref_mod.apply({"params": params}, q2, kv2)
    out2 = pallas_mod.apply({"params": params}, q2, kv2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
