"""Partial-backbone fine-tuning: only the projection + last-k scan layers
change; frozen slices are bit-identical after optimizer steps (AdamW
weight decay must not drift them)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
from bayesvlm_tpu.train.backbone import make_backbone_train_step


def test_last_k_layer_finetune_freezes_rest():
    img_enc, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    module = img_enc.module
    params = img_enc.params
    L = TINY_CLIP_CONFIG.vision.num_layers  # 2
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(4,)))
    targets = jnp.asarray(rng.normal(size=(3, 16)), jnp.float32)

    def loss_fn(p, batch):
        embeds, _ = module.apply({"params": p}, batch["images"])
        e = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
        t = targets / jnp.linalg.norm(targets, axis=-1, keepdims=True)
        logits = e @ t.T * 10.0
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, batch["labels"][:, None], -1).mean()

    init_state, step = make_backbone_train_step(
        module, loss_fn, num_layers=L, k_last_layers=1,
        projection_names=("visual_projection",),
        learning_rate=1e-2, weight_decay=1e-2,
    )
    opt_state = init_state(params)
    batch = {"images": images, "labels": labels}
    new_params, opt_state, loss0 = step(params, opt_state, batch)
    new_params, opt_state, loss1 = step(new_params, opt_state, batch)
    assert np.isfinite(float(loss0))
    assert float(loss1) < float(loss0)  # actually learning

    # projection changed
    assert not np.allclose(
        np.asarray(new_params["visual_projection"]["kernel"]),
        np.asarray(params["visual_projection"]["kernel"]),
    )
    # last block layer changed, first frozen (bit-identical)
    old_blk = params["encoder"]["layers"]["block"]
    new_blk = new_params["encoder"]["layers"]["block"]
    old_k = np.asarray(old_blk["self_attn"]["q_proj"]["kernel"])
    new_k = np.asarray(new_blk["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(new_k[0], old_k[0])      # frozen layer 0
    assert not np.array_equal(new_k[1], old_k[1])          # trained layer 1
    # embeddings / patch conv frozen
    np.testing.assert_array_equal(
        np.asarray(new_params["patch_embedding"]["kernel"]),
        np.asarray(params["patch_embedding"]["kernel"]),
    )


def test_projection_only_mode():
    img_enc, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=1)
    module, params = img_enc.module, img_enc.params
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    def loss_fn(p, batch):
        embeds, _ = module.apply({"params": p}, batch)
        return jnp.sum(embeds**2)

    init_state, step = make_backbone_train_step(
        module, loss_fn, num_layers=2, k_last_layers=0,
        projection_names=("visual_projection",), learning_rate=1e-2,
    )
    new_params, _, _ = step(params, init_state(params), images)
    blk_old = params["encoder"]["layers"]["block"]["mlp"]["fc1"]["kernel"]
    blk_new = new_params["encoder"]["layers"]["block"]["mlp"]["fc1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(blk_new), np.asarray(blk_old))
    assert not np.allclose(
        np.asarray(new_params["visual_projection"]["kernel"]),
        np.asarray(params["visual_projection"]["kernel"]),
    )
