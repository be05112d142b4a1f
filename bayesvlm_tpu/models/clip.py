"""CLIP vision and text towers (Flax), HF-weight compatible.

Behavioral contract (what the Laplace layer needs, ref:bayesvlm/vlm.py):
  - vision: activations = post_layernorm(CLS hidden)   (pooled output)
            embeds      = visual_projection(activations), Linear NO bias
            (ref:bayesvlm/vlm.py:364-374)
  - text:   activations = final_layer_norm hidden at the EOS position
            embeds      = text_projection(activations), Linear NO bias
            (ref:bayesvlm/vlm.py:279-289)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bayesvlm_tpu.models.configs import TextConfig, VisionConfig
from bayesvlm_tpu.models.layers import (
    LayerNormFP32,
    TransformerEncoder,
    causal_mask,
)

Array = jax.Array


class CLIPVisionTower(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: Array):
        """pixel_values [B, H, W, 3] (NHWC, normalized).

        Returns (embeds [B, proj], activations [B, D])."""
        cfg = self.config
        x = pixel_values.astype(self.dtype)

        patches = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,  # HF CLIP patch_embedding has no bias
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(x)
        B = patches.shape[0]
        patches = patches.reshape(B, -1, cfg.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(
            cls.astype(self.dtype), (B, 1, cfg.hidden_size)
        )
        h = jnp.concatenate([cls, patches], axis=1)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.seq_len, cfg.hidden_size),
        )
        h = h + pos.astype(self.dtype)[None]

        h = LayerNormFP32(eps=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layernorm")(h)
        h = TransformerEncoder(
            num_layers=cfg.num_layers,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            mlp_dim=cfg.mlp_dim,
            hidden_act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            remat=self.remat,
            softmax_fp32=cfg.attn_softmax_fp32,
            attn_pallas=cfg.attn_pallas,
            attn_pallas_block=cfg.attn_pallas_block,
            mlp_int8=getattr(cfg, "mlp_int8", False),
            mlp_weight_bits=getattr(cfg, "mlp_weight_bits", 8),
            attn_int8=getattr(cfg, "attn_int8", False),
            name="encoder",
        )(h)

        pooled = h[:, 0, :]
        activations = LayerNormFP32(
            eps=cfg.layer_norm_eps, dtype=jnp.float32, name="post_layernorm"
        )(pooled.astype(jnp.float32))

        embeds = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="visual_projection",
        )(activations)
        return embeds, activations


class CLIPTextTower(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: Array, eos_positions: Optional[Array] = None):
        """input_ids [B, T] int32; eos_positions [B] index of the EOS token
        per row (HF pools at argmax(input_ids == eos_token_id)).

        Returns (embeds [B, proj], activations [B, D])."""
        cfg = self.config
        B, T = input_ids.shape

        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_length, cfg.hidden_size),
        )
        h = tok + pos[:T].astype(self.dtype)[None]

        mask = causal_mask(T) if cfg.causal else None
        h = TransformerEncoder(
            num_layers=cfg.num_layers,
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            mlp_dim=cfg.mlp_dim,
            hidden_act=cfg.hidden_act,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=self.dtype,
            remat=self.remat,
            softmax_fp32=cfg.attn_softmax_fp32,
            attn_pallas=cfg.attn_pallas,
            attn_pallas_block=cfg.attn_pallas_block,
            name="encoder",
        )(h, mask)

        h = LayerNormFP32(
            eps=cfg.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(h.astype(jnp.float32))

        if eos_positions is None:
            eos_positions = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
            )
        activations = jnp.take_along_axis(
            h, eos_positions[:, None, None], axis=1
        )[:, 0, :]

        embeds = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="text_projection",
        )(activations)
        return embeds, activations
