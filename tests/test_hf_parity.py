"""Numerical parity against the actual HF torch towers.

transformers builds models from config objects offline (random init), so
we can instantiate tiny HF CLIP/SigLIP models, convert their state dicts
through bayesvlm_tpu.models.convert, and require our Flax towers to
reproduce embeds/activations/residuals on the same inputs — the
ground-truth contract the reference wraps (ref:bayesvlm/vlm.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from bayesvlm_tpu.models.clip import CLIPTextTower, CLIPVisionTower
from bayesvlm_tpu.models.configs import TextConfig, VisionConfig
from bayesvlm_tpu.models.convert import (
    convert_clip_text,
    convert_clip_vision,
    convert_siglip_text,
    convert_siglip_vision,
)
from bayesvlm_tpu.models.siglip import SiglipTextTower, SiglipVisionTower

ATOL = 2e-4
RTOL = 2e-3


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_clip_vision_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="gelu",
    )
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    cfg = VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=2, mlp_dim=64, projection_dim=16, hidden_act="gelu",
    )
    tower = CLIPVisionTower(cfg, dtype=jnp.float32)
    params = convert_clip_vision(_sd(hf), cfg.num_layers)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(x))
    hf_embeds = out.image_embeds.numpy()
    # HF pooled activations = post_layernorm(CLS)
    hf_act = hf.vision_model(torch.tensor(x))[1].detach().numpy()

    embeds, acts = tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(np.asarray(acts), hf_act, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(embeds), hf_embeds, rtol=RTOL, atol=ATOL)


def test_clip_text_parity():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        projection_dim=16, hidden_act="gelu",
        eos_token_id=63, bos_token_id=0, pad_token_id=1,
    )
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = TextConfig(
        vocab_size=64, max_length=16, hidden_size=24, num_layers=2,
        num_heads=2, mlp_dim=48, projection_dim=16, hidden_act="gelu",
        eos_token_id=63,
    )
    tower = CLIPTextTower(cfg, dtype=jnp.float32)
    params = convert_clip_text(_sd(hf), cfg.num_layers)

    rng = np.random.default_rng(1)
    ids = rng.integers(2, 60, size=(3, 16)).astype(np.int64)
    ids[:, 0] = 0
    ids[0, 7] = 63  # eos at different positions
    ids[1, 12] = 63
    ids[2, 15] = 63

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    hf_embeds = out.text_embeds.numpy()

    embeds, acts = tower.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(embeds), hf_embeds, rtol=RTOL, atol=ATOL)


def test_siglip_vision_parity_with_head_surgery():
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    hf = transformers.SiglipVisionModel(hf_cfg).eval()

    cfg = VisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=2, mlp_dim=64, projection_dim=32,
        hidden_act="gelu_tanh", layer_norm_eps=1e-6, use_class_token=False,
    )
    tower = SiglipVisionTower(cfg, dtype=jnp.float32)
    params = convert_siglip_vision(_sd(hf), cfg.num_layers)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    # reference head surgery in torch (ref:bayesvlm/vlm.py:460-486)
    with torch.no_grad():
        vm = hf.vision_model
        hs = vm.embeddings(torch.tensor(x))
        hs = vm.encoder(inputs_embeds=hs)[0]
        hs = vm.post_layernorm(hs)
        probe = vm.head.probe.repeat(2, 1, 1)
        attn = vm.head.attention(probe, hs, hs)[0]
        residual_t = attn[:, 0].numpy()
        ln = vm.head.layernorm(attn)
        act_t = vm.head.mlp.activation_fn(vm.head.mlp.fc1(ln))[:, 0].numpy()
        embeds_t = (
            vm.head.mlp.fc2(torch.tensor(act_t)) + torch.tensor(residual_t)
        ).numpy()

    embeds, acts, residuals = tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(np.asarray(residuals), residual_t, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(acts), act_t, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(embeds), embeds_t, rtol=RTOL, atol=ATOL)


def test_siglip_text_parity():
    hf_cfg = transformers.SiglipTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=64,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    hf = transformers.SiglipTextModel(hf_cfg).eval()

    cfg = TextConfig(
        vocab_size=64, max_length=16, hidden_size=32, num_layers=2,
        num_heads=2, mlp_dim=64, projection_dim=32,
        hidden_act="gelu_tanh", layer_norm_eps=1e-6, causal=False, eos_token_id=1,
    )
    tower = SiglipTextTower(cfg, dtype=jnp.float32)
    params = convert_siglip_text(_sd(hf), cfg.num_layers)

    rng = np.random.default_rng(3)
    ids = rng.integers(2, 60, size=(2, 16)).astype(np.int64)

    # reference manual forward: embeddings -> encoder -> final LN -> last
    # token -> head (ref:bayesvlm/vlm.py:444-458)
    with torch.no_grad():
        tm = hf.text_model
        hs = tm.embeddings(input_ids=torch.tensor(ids))
        hs = tm.encoder(inputs_embeds=hs)[0]
        hs = tm.final_layer_norm(hs)
        pooled_t = hs[:, -1, :].numpy()
        embeds_t = tm.head(torch.tensor(pooled_t)).numpy()

    embeds, acts = tower.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(acts), pooled_t, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(embeds), embeds_t, rtol=RTOL, atol=ATOL)
