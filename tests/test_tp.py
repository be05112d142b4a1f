"""Tensor-parallel partition specs actually exercise the `model` mesh axis
(round-1 VERDICT missing #5): a ('data','model') 2-D mesh with
Megatron-sharded tower weights must reproduce the 1-D/unsharded forward
and a full GSPMD train step bit-for-tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.dist.tp import shard_tower_params, tower_partition_specs
from bayesvlm_tpu.models import load_model


def _mesh_2d():
    return make_mesh(jax.devices()[:8], axis_names=("data", "model"), shape=(4, 2))


def test_partition_specs_shapes():
    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    specs = tower_partition_specs(img.params)
    blk = specs["encoder"]["layers"]["block"]
    assert blk["self_attn"]["q_proj"]["kernel"] == P(None, None, "model")
    assert blk["self_attn"]["q_proj"]["bias"] == P(None, "model")
    assert blk["self_attn"]["out_proj"]["kernel"] == P(None, "model", None)
    assert blk["self_attn"]["out_proj"]["bias"] == P()
    assert blk["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert specs["patch_embedding"]["kernel"] == P()
    assert specs["visual_projection"]["kernel"] == P()


def test_tp_forward_matches_unsharded():
    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    module, params = img.module, img.params
    cfg = img.config

    rng = np.random.default_rng(0)
    B = 8
    pixels = jnp.asarray(
        rng.normal(size=(B, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32,
    )

    ref_embeds, ref_acts = module.apply({"params": params}, pixels)

    mesh = _mesh_2d()
    params_tp = shard_tower_params(params, mesh)
    pixels_dp = jax.device_put(pixels, NamedSharding(mesh, P("data")))

    fwd = jax.jit(
        lambda p, x: module.apply({"params": p}, x),
        out_shardings=NamedSharding(mesh, P()),
    )
    embeds, acts = fwd(params_tp, pixels_dp)

    np.testing.assert_allclose(np.asarray(embeds), np.asarray(ref_embeds),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(ref_acts),
                               rtol=1e-5, atol=1e-5)
    # the tower weights must actually live sharded over 'model'
    qk = params_tp["encoder"]["layers"]["block"]["self_attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, None, "model")
    assert len(qk.sharding.device_set) == 8


def test_tp_dp_train_step_matches_unsharded():
    """Full GSPMD train step (encoder fwd -> contrastive loss -> projection
    grad) on the 2-D mesh equals the single-device step."""
    img, _, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    module, params = img.module, img.params
    cfg = img.config

    rng = np.random.default_rng(1)
    B, C = 8, 6
    pixels = jnp.asarray(
        rng.normal(size=(B, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(0, C, size=(B,)), jnp.int32)
    text = jnp.asarray(rng.normal(size=(C, cfg.vision.projection_dim)), jnp.float32)

    def step(p, px, lb, tx):
        def loss_fn(kernel):
            _, acts = module.apply({"params": p}, px)
            e = acts @ kernel
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
            t = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
            logits = e @ t.T * jnp.exp(head.logit_scale)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(logp, lb[:, None], axis=-1).mean()

        kernel = p["visual_projection"]["kernel"]
        loss, grad = jax.value_and_grad(loss_fn)(kernel)
        return loss, kernel - 1e-2 * grad

    ref_loss, ref_kernel = jax.jit(step)(params, pixels, labels, text)

    mesh = _mesh_2d()
    params_tp = shard_tower_params(params, mesh)
    dp = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    loss, kernel = jax.jit(step, out_shardings=NamedSharding(mesh, P()))(
        params_tp, dp(pixels), dp(labels), rep(text)
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kernel), np.asarray(ref_kernel),
                               rtol=1e-5, atol=1e-6)
