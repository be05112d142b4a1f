"""W8A8 linear projection kernel (models/linear_int8.py) + the
attn_int8 tower path.

Interpret-mode on CPU (conftest forces the CPU platform); the hardware
throughput/calibration numbers live in BASELINE.md "int8 attention
projections"."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.models.linear_int8 import linear_int8, linear_int8_reference


def _assert_matches_emulation(out, ref, rel_max=0.02, rel_mean=0.002):
    out = np.asarray(out, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = np.abs(ref).max() + 1e-12
    d = np.abs(out - ref)
    assert d.max() <= rel_max * scale, (d.max(), scale)
    assert d.mean() <= rel_mean * scale, (d.mean(), scale)


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("m", [64, 40, 33, 1])
def test_kernel_matches_emulation(bias, m):
    """Interpret-mode kernel == pure-jnp emulation, incl. ragged last
    row blocks and the non-32-multiple row-padding path (the Mosaic
    sublane-alignment invariant — see mlp_int8)."""
    rng = np.random.default_rng(0)
    D, N = 64, 96
    x = jnp.asarray(rng.normal(size=(m, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, size=(D, N)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.02, size=(N,)), jnp.float32) if bias else None
    out = linear_int8(x, w, b, block_m=32)
    ref = linear_int8_reference(x, w, b)
    assert out.dtype == x.dtype and out.shape == (m, N)
    _assert_matches_emulation(out, ref)


def test_leading_shape_flattens():
    rng = np.random.default_rng(1)
    D, N = 32, 64
    x = jnp.asarray(rng.normal(size=(2, 5, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, size=(D, N)), jnp.float32)
    out = linear_int8(x, w)
    assert out.shape == (2, 5, N)
    _assert_matches_emulation(out, linear_int8_reference(x, w))


def test_error_vs_exact_is_int8_roundoff():
    rng = np.random.default_rng(2)
    D, N = 128, 128
    x = jnp.asarray(rng.normal(size=(48, D)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, size=(D, N)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.02, size=(N,)), jnp.float32)
    out = np.asarray(linear_int8(x, w, b), np.float32)
    exact = np.asarray(x @ w + b, np.float32)
    rel = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert rel < 0.03, rel  # typical W8A8 round-off ~1% rel L2


def _tiny_tower(attn_int8, mlp_int8=False):
    from bayesvlm_tpu.models.clip import CLIPVisionTower
    from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG

    vcfg = dataclasses.replace(
        TINY_CLIP_CONFIG.vision, attn_pallas=True,
        attn_int8=attn_int8, mlp_int8=mlp_int8,
    )
    return CLIPVisionTower(vcfg, dtype=jnp.float32), vcfg


def test_attn_int8_tower_close_to_bf16_path():
    """A tiny CLIP vision tower with int8 attention projections stays
    close to the exact-dense path, and the param tree is IDENTICAL
    (the kernel consumes the same q/k/v/out Dense weights)."""
    mod_off, vcfg = _tiny_tower(False)
    mod_on, _ = _tiny_tower(True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.normal(size=(2, vcfg.image_size, vcfg.image_size, 3)),
        jnp.float32)
    params = mod_off.init(jax.random.key(0), x)["params"]
    # identical param trees: int8 is a forward-path substitution only
    shapes_on = jax.eval_shape(lambda: mod_on.init(jax.random.key(0), x))
    assert (jax.tree_util.tree_structure(shapes_on["params"])
            == jax.tree_util.tree_structure(params))
    e_off = np.asarray(mod_off.apply({"params": params}, x)[0], np.float32)
    e_on = np.asarray(mod_on.apply({"params": params}, x)[0], np.float32)
    rel = np.linalg.norm(e_on - e_off) / (np.linalg.norm(e_off) + 1e-12)
    assert rel < 0.05, rel


def test_combined_int8_tower_runs():
    """attn_int8 + mlp_int8 together (the full int8 serving mode)."""
    mod, vcfg = _tiny_tower(True, mlp_int8=True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.normal(size=(2, vcfg.image_size, vcfg.image_size, 3)),
        jnp.float32)
    params = mod.init(jax.random.key(0), x)["params"]
    out = mod.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out[0], np.float32)).all()


def test_causal_text_path_unaffected():
    """attn_int8 only touches the non-causal self-attention fast path;
    the causal text tower ignores it (masked attention falls back)."""
    from bayesvlm_tpu.models.clip import CLIPTextTower
    from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG

    tcfg = TINY_CLIP_CONFIG.text
    mod = CLIPTextTower(tcfg, dtype=jnp.float32)
    ids = jnp.zeros((2, tcfg.max_length), jnp.int32)
    params = mod.init(jax.random.key(0), ids)["params"]
    out = mod.apply({"params": params}, ids)
    assert np.isfinite(np.asarray(out[0], np.float32)).all()


def test_int8_tower_under_gspmd_batch_sharding():
    """Multi-chip composition for the int8 paths: a batch-sharded GSPMD
    jit of the full-int8 tower (mlp_int8 + attn_int8) must match the
    unsharded forward exactly — per-row activation quantization is
    row-local, so sharding cannot change the math (mirrors the
    pallas-attention GSPMD test)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayesvlm_tpu.dist.mesh import make_mesh

    mod, vcfg = _tiny_tower(True, mlp_int8=True)
    rng = np.random.default_rng(5)
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
