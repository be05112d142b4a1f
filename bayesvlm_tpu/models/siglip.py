"""SigLIP vision and text towers (Flax), HF-weight compatible, with the
attention-pool "head surgery" the Laplace layer requires.

The reference splits the SigLIP vision attention-pool head mid-MLP
(ref:bayesvlm/vlm.py:460-486,552-565):

    attn_out  = MHA(probe, tokens, tokens)            # pre-layernorm
    residual  = attn_out[:, 0]                        # the skip connection
    h         = layernorm(attn_out)
    act       = gelu_tanh(fc1(h))[:, 0]               # -> `activations`
    embeds    = fc2(act) + residual                   # Laplace layer = fc2

so the Bayesian projection layer is `fc2` (Linear WITH bias -> ones column
in the K-FAC A factor) and the skip must be re-added after any projection
update — hence `EncoderResult.residuals`.

Text tower: pooled output is the LAST token of the final-layernormed
sequence (ref:bayesvlm/vlm.py:447-451); projection is `text_model.head`
(Linear with bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from bayesvlm_tpu.models.configs import TextConfig, VisionConfig
from bayesvlm_tpu.models.layers import (
    LayerNormFP32,
    MultiHeadAttention,
    TransformerEncoder,
    get_activation,
)

Array = jax.Array


class SiglipVisionTower(nn.Module):
    config: VisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: Array):
        """pixel_values [B, H, W, 3] -> (embeds, activations, residuals).

        embeds [B, proj] = fc2(activations) + residuals."""
        cfg = self.config
        x = pixel_values.astype(self.dtype)

        patches = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=True,  # SigLIP patch embedding has a bias
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(x)
        B = patches.shape[0]
        h = patches.reshape(B, -1, cfg.hidden_size)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches, cfg.hidden_size),
        )
        h = h + pos.astype(self.dtype)[None]

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
        h = LayerNormFP32(
            eps=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(h)

        # --- attention-pool head, split per the reference surgery ---
        probe = self.param(
            "probe", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size)
        )
        probe = jnp.broadcast_to(probe.astype(self.dtype), (B, 1, cfg.hidden_size))
        attn_out = MultiHeadAttention(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            dtype=self.dtype,
            name="head_attention",
        )(probe, h)                                  # [B, 1, D]

        residual = attn_out[:, 0, :].astype(jnp.float32)       # [B, D]
        hn = LayerNormFP32(
            eps=cfg.layer_norm_eps, dtype=jnp.float32, name="head_layernorm"
        )(attn_out.astype(jnp.float32))

        act_fn = get_activation(cfg.hidden_act)
        fc1 = nn.Dense(
            cfg.mlp_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="head_fc1"
        )(hn)
        activations = act_fn(fc1)[:, 0, :]                     # [B, mlp_dim]

        embeds = nn.Dense(
            cfg.hidden_size,  # fc2: mlp_dim -> hidden (= projection dim)
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head_fc2",
        )(activations) + residual
        return embeds, activations, residual


class SiglipTextTower(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: Array):
        """input_ids [B, T] (padded to max_length, SigLIP convention) ->
        (embeds [B, proj], activations [B, D])."""
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
        )(h, None)  # bidirectional

        h = LayerNormFP32(
            eps=cfg.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(h.astype(jnp.float32))

        activations = h[:, -1, :]  # last-token pooling (ref:bayesvlm/vlm.py:451)
        embeds = nn.Dense(
            cfg.projection_dim,
            use_bias=True,  # SigLIP text head has a bias
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head",
        )(activations)
        return embeds, activations
