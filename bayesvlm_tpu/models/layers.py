"""Shared transformer building blocks (Flax) for the CLIP/SigLIP towers.

TPU-first conventions:
  - `dtype` (compute dtype) defaults to bfloat16 on TPU-class hardware;
    parameters stay float32 (`param_dtype`).
  - attention softmax and layer norms run in float32 regardless of the
    compute dtype (numerics parity with the fp32 reference towers).
  - no data-dependent control flow; masks are static per (config, seq_len).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def get_activation(name: str) -> Callable[[Array], Array]:
    if name == "gelu":
        # exact gelu (HF "gelu" for laion CLIP)
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("gelu_tanh", "gelu_pytorch_tanh", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation: {name}")


class _LNInner(nn.Module):
    """Parameter-only stand-in for nn.LayerNorm (scale/bias tree)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return scale, bias


class _LNParams(nn.Module):
    """Matches LayerNormFP32's param tree (<name>/ln/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNInner(self.features, name="ln")()


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense (same tree: kernel/bias, same
    initializers) — lets fused kernels consume the weights without
    running the XLA GEMM."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (HF layout)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # jax.nn.dot_product_attention (XLA flash path) — measured SLOWER than
    # the plain einsum pair for these short sequences (T<=257) on v5e, so
    # off by default; flip for long-sequence experiments.
    use_fused: bool = False
    # fp32 attention softmax (numerics parity with the fp32 reference
    # towers). False = softmax in the compute dtype (measured ~neutral on
    # ViT-L at B=64; calibration delta in BASELINE.md).
    softmax_fp32: bool = True
    # Fused Pallas/Mosaic attention (scores stay in VMEM): measured
    # 2.39 -> 1.74 ms/layer at ViT-L B=64 (BASELINE.md). fp32 softmax
    # inside; non-causal paths only (mask falls back to einsum).
    use_pallas: bool = False
    # Whole-sublayer kernel: QKV projections + attention + out projection
    # in one VMEM-resident program (weights pinned across the grid);
    # implies use_pallas semantics. Non-causal self-attention only.
    use_pallas_block: bool = False
    # W8A8 int8 QKV + out projections (models/linear_int8.py): the three
    # QKV weights are concatenated to [D, 3D] so input rows quantize
    # once. Opt-in, approximate; non-causal self-attention only (falls
    # back to the bf16 denses elsewhere). Calibration deltas in
    # BASELINE.md.
    use_int8_proj: bool = False

    @nn.compact
    def __call__(
        self,
        queries: Array,                 # [B, Tq, D]
        keys_values: Optional[Array] = None,  # [B, Tk, D]; None -> self-attn
        mask: Optional[Array] = None,   # [Tq, Tk] additive causal mask
        pre_ln: Optional[tuple] = None,  # (scale, bias, eps): queries are
                                         # PRE-LN; kernel fuses LN+residual
    ) -> Array:
        self_attention = keys_values is None
        if keys_values is None:
            keys_values = queries
        H = self.num_heads
        Dh = self.hidden_size // H

        dense = lambda name: nn.Dense(
            self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )

        if (self.use_pallas_block and mask is None and self_attention
                and pre_ln is not None):
            from bayesvlm_tpu.models.attention_pallas import (
                fused_attention_block,
            )

            ln_scale, ln_bias, ln_eps = pre_ln
            D_in = queries.shape[-1]
            ws = [
                _DenseParams(self.hidden_size, D_in, name=n)()
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")
            ]
            flat = []
            for w, b in ws:
                flat += [w.astype(self.dtype), b.astype(self.dtype)]
            return fused_attention_block(
                queries, ln_scale, ln_bias, *flat, num_heads=H,
                ln_eps=ln_eps,
            )

        int8_proj = self.use_int8_proj and mask is None and self_attention
        if int8_proj:
            # W8A8 projections (works with both the Pallas and einsum
            # attention cores): QKV weights concatenated so input rows
            # quantize once; out-proj quantized separately below
            from bayesvlm_tpu.models.linear_int8 import linear_int8

            D_in = queries.shape[-1]
            ws = [
                _DenseParams(self.hidden_size, D_in, name=n)()
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")
            ]
            w_qkv = jnp.concatenate([w for w, _ in ws[:3]], axis=1)
            b_qkv = jnp.concatenate([b for _, b in ws[:3]])
            qkv = linear_int8(queries, w_qkv, b_qkv)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out_proj = lambda o: linear_int8(o, ws[3][0], ws[3][1])
        else:
            q = dense("q_proj")(queries)
            k = dense("k_proj")(keys_values)
            v = dense("v_proj")(keys_values)
            out_proj = dense("out_proj")

        # The fused kernel blocks q/k/v from q's sequence length, so it
        # requires Tq == Tk (cross-attention with a shorter query — e.g. a
        # probe token over patch tokens — would silently attend to only
        # the first Tq keys). No current config hits that combination;
        # guard anyway and fall back to the einsum path.
        if self.use_pallas and mask is None and q.shape[1] == k.shape[1]:
            from bayesvlm_tpu.models.attention_pallas import fused_attention

            out = fused_attention(q, k, v, self.num_heads)
            return out_proj(out)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, Dh)
        k = k.reshape(B, Tk, H, Dh)
        v = v.reshape(B, Tk, H, Dh)

        if self.use_fused and mask is None:
            # XLA fused (flash) attention path — fp32 softmax internally.
            # Masked calls use the einsum path below: an additive mask is
            # not necessarily causal, so it must be applied as given.
            out = jax.nn.dot_product_attention(q, k, v)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(Dh).astype(q.dtype)
            if self.softmax_fp32:
                scores = scores.astype(jnp.float32)
            if mask is not None:
                scores = scores + mask[None, None, :, :].astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, Tq, self.hidden_size)
        return out_proj(out)


class MLP(nn.Module):
    hidden_size: int
    mlp_dim: int
    hidden_act: str
    dtype: jnp.dtype = jnp.float32
    # fused W8A8 int8 kernel (models/mlp_int8.py) — opt-in, approximate;
    # param tree is unchanged (kernel consumes the same fc1/fc2 weights)
    use_int8: bool = False
    # weight quantization width for the int8 kernel: 8 (production W8A8)
    # or 4 (W4A8 probe lane, pending the int4 MXU rate measurement)
    weight_bits: int = 8

    @nn.compact
    def __call__(self, x: Array, pre_ln: Optional[tuple] = None) -> Array:
        if self.use_int8:
            from bayesvlm_tpu.models.mlp_int8 import (
                mlp_int8,
                quantize_mlp_weights,
            )

            w1, b1 = _DenseParams(self.mlp_dim, self.hidden_size,
                                  name="fc1")()
            w2, b2 = _DenseParams(self.hidden_size, self.mlp_dim,
                                  name="fc2")()
            # prequantized weight cache: apply(..., mutable=["int8"])
            # fills the collection once; passing it back as a variables
            # collection skips the per-call weight quantize (~1 ms/call
            # at ViT-L — ImageEncoder.prequantize_int8)
            if self.is_mutable_collection("int8"):
                self.put_variable(
                    "int8", "mlp",
                    quantize_mlp_weights(w1, w2, self.weight_bits))
            quant = (self.get_variable("int8", "mlp")
                     if self.has_variable("int8", "mlp") else None)
            if pre_ln is not None:
                # whole pre-LN sublayer fused: x + fc2(act(fc1(LN(x))))
                lns, lnb, eps = pre_ln
                return mlp_int8(x, w1, b1, w2, b2,
                                act_name=self.hidden_act, quant=quant,
                                ln_scale=lns, ln_bias=lnb, ln_eps=eps,
                                weight_bits=self.weight_bits)
            return mlp_int8(x, w1, b1, w2, b2, act_name=self.hidden_act,
                            quant=quant, weight_bits=self.weight_bits)
        if pre_ln is not None:
            raise ValueError("MLP(pre_ln=...) requires use_int8=True")
        act_name = self.hidden_act
        # erf-GELU is VPU-transcendental-bound on TPU (~14% of a ViT-L
        # forward); the tanh approximation's error (~1e-3 relative) is
        # below bf16 rounding noise, so substitute it under bf16 compute.
        # fp32 runs (tests, parity checks) keep the exact erf form.
        if act_name == "gelu" and self.dtype == jnp.bfloat16:
            act_name = "gelu_tanh"
        act = get_activation(act_name)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        h = act(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32, output cast back to compute dtype."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(
            epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32, name="ln"
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class TransformerBlock(nn.Module):
    """Pre-LN block: x + MHA(LN1(x)); x + MLP(LN2(x)). (CLIP & SigLIP both)."""

    hidden_size: int
    num_heads: int
    mlp_dim: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32
    softmax_fp32: bool = True
    attn_pallas: bool = False
    attn_pallas_block: bool = False
    mlp_int8: bool = False
    mlp_weight_bits: int = 8
    attn_int8: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        if self.attn_pallas_block and mask is None:
            # whole-sublayer kernel: LN + QKV + attention + out-proj +
            # residual fused in VMEM (param trees unchanged)
            lns, lnb = _LNParams(self.hidden_size, name="layer_norm1")()
            x = MultiHeadAttention(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dtype=self.dtype,
                use_pallas_block=True,
                name="self_attn",
            )(x, mask=None, pre_ln=(lns, lnb, self.layer_norm_eps))
        else:
            h = LayerNormFP32(eps=self.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
            x = x + MultiHeadAttention(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dtype=self.dtype,
                softmax_fp32=self.softmax_fp32,
                use_pallas=self.attn_pallas,
                use_pallas_block=self.attn_pallas_block,
                use_int8_proj=self.attn_int8,
                name="self_attn",
            )(h, mask=mask)
        if self.mlp_int8:
            # fused pre-LN MLP sublayer: LN2 + fc1 + GELU + fc2 + residual
            # in one VMEM-resident kernel (param tree unchanged — _LNParams
            # mirrors LayerNormFP32's layer_norm2/ln/{scale,bias})
            lns, lnb = _LNParams(self.hidden_size, name="layer_norm2")()
            return MLP(
                hidden_size=self.hidden_size,
                mlp_dim=self.mlp_dim,
                hidden_act=self.hidden_act,
                dtype=self.dtype,
                use_int8=True,
                weight_bits=self.mlp_weight_bits,
                name="mlp",
            )(x, pre_ln=(lns, lnb, self.layer_norm_eps))
        h = LayerNormFP32(eps=self.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        x = x + MLP(
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            hidden_act=self.hidden_act,
            dtype=self.dtype,
            use_int8=self.mlp_int8,
            weight_bits=self.mlp_weight_bits,
            name="mlp",
        )(h)
        return x


class _ScanBlock(nn.Module):
    """TransformerBlock adapted to the (carry, out) scan signature."""

    hidden_size: int
    num_heads: int
    mlp_dim: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32
    softmax_fp32: bool = True
    attn_pallas: bool = False
    attn_pallas_block: bool = False
    mlp_int8: bool = False
    mlp_weight_bits: int = 8
    attn_int8: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array]):
        x = TransformerBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            softmax_fp32=self.softmax_fp32,
            attn_pallas=self.attn_pallas,
            attn_pallas_block=self.attn_pallas_block,
            mlp_int8=self.mlp_int8,
            mlp_weight_bits=self.mlp_weight_bits,
            attn_int8=self.attn_int8,
            name="block",
        )(x, mask)
        return x, None


class TransformerEncoder(nn.Module):
    """Stack of pre-LN blocks, compiled ONCE via `nn.scan` over stacked
    layer parameters ([L, ...] leading axis).

    scan-over-layers is the TPU-native structure: XLA traces/compiles a
    single block regardless of depth (ViT-H/32-layer compile cost equals a
    1-layer model's), and the stacked parameter layout is what pipeline/
    tensor sharding partition specs want. `remat` wraps the block with
    jax.checkpoint to trade FLOPs for HBM during fine-tuning.
    """

    num_layers: int
    hidden_size: int
    num_heads: int
    mlp_dim: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    softmax_fp32: bool = True
    attn_pallas: bool = False
    attn_pallas_block: bool = False
    mlp_int8: bool = False
    mlp_weight_bits: int = 8
    attn_int8: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        block_cls = _ScanBlock
        if self.remat:
            block_cls = nn.remat(
                _ScanBlock,
                prevent_cse=False,
                static_argnums=(),
            )
        scanned = nn.scan(
            block_cls,
            # "int8": per-layer prequantized W8A8 weight cache (stacked
            # [L, ...] like params; absent unless prequantize_int8 ran)
            variable_axes={"params": 0, "int8": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=nn.broadcast,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
            softmax_fp32=self.softmax_fp32,
            attn_pallas=self.attn_pallas,
            attn_pallas_block=self.attn_pallas_block,
            mlp_int8=self.mlp_int8,
            mlp_weight_bits=self.mlp_weight_bits,
            attn_int8=self.attn_int8,
            name="layers",
        )
        x, _ = scanned(x, mask)
        return x


def causal_mask(seq_len: int, dtype=jnp.float32) -> Array:
    """Additive causal mask [T, T]: 0 on/below diag, large-negative above."""
    i = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    return jnp.where(j <= i, 0.0, jnp.finfo(dtype).min).astype(dtype)
