"""Fused W8A8 int8 MLP kernel (Pallas/Mosaic, TPU).

Why: the MXU on this chip runs int8xint8->int32 at ~2x its bf16 rate
(329 vs 167 Top/s measured kernel-vs-kernel — BASELINE.md "int8 below
XLA", round 5), but XLA's own int8 path reaches only x1.21 and its
dynamic quantize/dequant ops add full HBM round trips. This kernel takes
the transformer MLP (fc1 -> GELU -> fc2, 39% of ViT-L tower time) and
runs the whole sublayer in one VMEM-resident program per row block:

    x[bf16] -> per-row absmax int8 quantize     (VPU, in VMEM)
            -> int8 GEMM1 vs resident W1q       (MXU double rate)
            -> dequant + bias + tanh-GELU       (fp32, VPU)
            -> per-row absmax int8 re-quantize  (VPU)
            -> int8 GEMM2 vs resident W2q       (MXU double rate)
            -> dequant + bias -> bf16 out

The [M, mlp_dim] hidden activations never leave VMEM (the XLA bf16 path
writes ~126 MB/layer of them to HBM at ViT-L B=80), and the quantize
passes are fused where the data already sits, so the double-rate MXU is
the only HBM-visible cost change. Weights are quantized per OUTPUT
channel (symmetric absmax int8), activations per ROW — the standard
W8A8 dynamic-quantization recipe; both GEMMs accumulate in int32
(exact), all dequant math in fp32.

Numerics contract: this is an approximation (int8 has ~0.4% per-element
round-off vs each row/channel absmax). It is OPT-IN via
`VisionConfig.mlp_int8` / `MLP(use_int8=True)`, default off everywhere;
the measured end-to-end calibration deltas (ECE, argmax flips) live in
BASELINE.md next to the throughput numbers, following the established
bf16/tanh-GELU methodology. Weight quantization happens per forward
call (XLA ops, ~0.03 ms/layer — negligible for inference pipelines;
hoist with `quantize_mlp_params` if it ever shows up in a profile).

No reference counterpart (the reference is fp32/fp16 torch;
ref:bayesvlm/vlm.py:21-25 model forward). TPU-first design per the
SURVEY §7 fusion strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesvlm_tpu.models.attention_pallas import _out_struct

_EPS = 1e-12


def quantize_weight(w: jax.Array, bits: int = 8) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric absmax int quantization: w [K, N] ->
    (intN [K, N], fp32 scale [1, N]) with w ~= wq * scale. bits=8 is the
    production W8A8 lane; bits=4 (jnp.int4, range +-7) is the
    weight-only-int4 probe lane (W4A8) — opt-in, pending the int4 MXU
    rate measurement (scripts/dev/bench_int4_mxu.py)."""
    if bits not in (8, 4):
        raise ValueError(f"quantize_weight: bits must be 8 or 4, got {bits}")
    qmax = 127.0 if bits == 8 else 7.0
    qdtype = jnp.int8 if bits == 8 else jnp.int4
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), _EPS) / qmax
    wq = jnp.round(w / s).astype(qdtype)  # |w/s| <= qmax by construction
    return wq, s


def _tanh_gelu(x):
    # fp32 tanh-GELU — same approximation the production bf16 MLP uses
    # (models/layers.py MLP: erf-GELU is VPU-bound; error below bf16
    # rounding noise)
    c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"gelu_tanh": _tanh_gelu, "quick_gelu": _quick_gelu}


def _quant_rows(x_f32):
    """Per-row symmetric absmax int8 within VMEM: [TM, K] fp32 ->
    (int8 [TM, K], fp32 row scale [TM, 1])."""
    r = jnp.maximum(jnp.max(jnp.abs(x_f32), axis=1, keepdims=True), _EPS)
    scale = r * (1.0 / 127.0)
    q = jnp.round(x_f32 * (127.0 / r)).astype(jnp.int8)
    return q, scale


def _ln_rows(x_f32, gamma, beta, eps):
    """fp32 LayerNorm over the lane axis (two-pass variance). Zero rows
    are safe: mean=var=0 -> output beta."""
    mu = jnp.mean(x_f32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mu), axis=1, keepdims=True)
    return (x_f32 - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _mlp_int8_kernel(x_ref, *refs, act_name: str, ln_eps: float | None):
    """refs = ([g_ref, bln_ref,] w1, s1, b1, w2, s2, b2, o_ref).

    With `ln_eps` set, the block computes the whole pre-LN MLP sublayer
    residual-fused: o = x + fc2(act(fc1(LN(x)))) — the standalone XLA LN
    pass and the residual-add pass (an extra ~3 reads + 2 writes of
    [M, D] per layer) collapse into this kernel's single read/write."""
    if ln_eps is not None:
        g_ref, bln_ref = refs[0], refs[1]
        refs = refs[2:]
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref = refs
    act = _ACTS[act_name]
    x = x_ref[:].astype(jnp.float32)                      # [TM, D]
    if ln_eps is not None:
        xq, xs = _quant_rows(_ln_rows(x, g_ref[0], bln_ref[0], ln_eps))
    else:
        xq, xs = _quant_rows(x)
    h = jax.lax.dot_general(
        xq, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                     # [TM, F] int32
    hf = h.astype(jnp.float32) * xs * s1_ref[0] + b1_ref[0]
    a = act(hf)
    aq, as_ = _quant_rows(a)
    o = jax.lax.dot_general(
        aq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                     # [TM, D] int32
    of = o.astype(jnp.float32) * as_ * s2_ref[0] + b2_ref[0]
    if ln_eps is not None:
        of = of + x  # residual in fp32 (x is the pre-LN block input)
    o_ref[:] = of.astype(o_ref.dtype)


def quantize_mlp_weights(w1: jax.Array, w2: jax.Array,
                         weight_bits: int = 8) -> dict:
    """Precompute the quantized weight cache for one MLP sublayer — pass
    as `mlp_int8(..., quant=...)` to skip the per-call weight
    quantization (~1.06 ms/call for all 24 ViT-L MLPs on chip; ~25% of a
    B=1 serving forward, BASELINE.md "int8 prequantization")."""
    w1q, s1 = quantize_weight(w1, weight_bits)
    w2q, s2 = quantize_weight(w2, weight_bits)
    return {"w1q": w1q, "s1": s1, "w2q": w2q, "s2": s2}


@functools.partial(jax.jit,
                   static_argnames=("act_name", "block_m", "ln_eps",
                                    "weight_bits"))
def mlp_int8(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
             b2: jax.Array, act_name: str = "gelu_tanh",
             block_m: int = 512, quant: dict | None = None,
             ln_scale: jax.Array | None = None,
             ln_bias: jax.Array | None = None,
             ln_eps: float | None = None,
             weight_bits: int = 8) -> jax.Array:
    """W8A8 MLP sublayer: x [..., D] -> fc2(act(fc1(x))) [..., D].

    w1 [D, F], b1 [F], w2 [F, D], b2 [D] in fp32/bf16 (quantized here,
    or taken prequantized from `quant` — see quantize_mlp_weights);
    output dtype matches x. Rows are independent, so any leading shape
    flattens to the kernel's [M, D] row grid; ragged last blocks are
    masked by Pallas (padded rows never reach the output).

    With ln_scale/ln_bias/ln_eps set, the kernel runs the WHOLE pre-LN
    MLP sublayer residual-fused: x + fc2(act(fc1(LN(x)))). The fp32 LN
    and the fp32 residual add happen in VMEM on rows the kernel already
    holds, removing the standalone LN pass and the residual-add pass
    (~5 extra [M, D] HBM touches per layer on the unfused path).
    """
    if act_name == "gelu":  # bf16 production substitution, as in MLP
        act_name = "gelu_tanh"
    if act_name not in _ACTS:
        raise ValueError(f"mlp_int8: unsupported activation {act_name!r}")
    orig_shape = x.shape
    D = orig_shape[-1]
    F = w1.shape[1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    # Pad rows to a 32-multiple: a ragged last block whose row count is
    # not sublane-aligned faults Mosaic's masked int8 path on hardware
    # (reproducible TPU-worker crash at M=36*257; 32 covers the int8
    # (32,128) tile, and multiples of 8 like M=32*257 were fine). Zero
    # rows are safe through the per-row quantize (absmax clamped to
    # _EPS) and are sliced off below.
    row_pad = (-M) % 32
    if row_pad:
        xm = jnp.pad(xm, ((0, row_pad), (0, 0)))
    Mp = xm.shape[0]
    tm = min(block_m, Mp)

    if quant is None:
        w1q, s1 = quantize_weight(w1, weight_bits)
        w2q, s2 = quantize_weight(w2, weight_bits)
    else:
        w1q, s1, w2q, s2 = (quant["w1q"], quant["s1"],
                            quant["w2q"], quant["s2"])
    b1f = b1.astype(jnp.float32).reshape(1, F)
    b2f = b2.astype(jnp.float32).reshape(1, D)

    grid = (pl.cdiv(Mp, tm),)
    row = pl.BlockSpec((tm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ln_args, ln_specs = (), []
    if ln_eps is not None:
        ln_args = (ln_scale.astype(jnp.float32).reshape(1, D),
                   ln_bias.astype(jnp.float32).reshape(1, D))
        ln_specs = [const((1, D)), const((1, D))]
    out = pl.pallas_call(
        functools.partial(_mlp_int8_kernel, act_name=act_name,
                          ln_eps=ln_eps),
        grid=grid,
        in_specs=[row, *ln_specs,
                  const((D, F)), const((1, F)), const((1, F)),
                  const((F, D)), const((1, D)), const((1, D))],
        out_specs=row,
        out_shape=_out_struct((Mp, D), x),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * D * F,
            bytes_accessed=2 * Mp * D * x.dtype.itemsize + 2 * D * F,
            transcendentals=Mp * F,
        ),
        # resident W1q/W2q + [TM, F] fp32 intermediates overflow the
        # 16 MB default scoped-vmem cap at ViT shapes; the chip has
        # 128 MB (see attention_pallas split-key note)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xm, *ln_args, w1q, s1, b1f, w2q, s2, b2f)
    if row_pad:
        out = out[:M]
    return out.reshape(orig_shape)


def mlp_int8_reference(x, w1, b1, w2, b2, act_name="gelu_tanh",
                       ln_scale=None, ln_bias=None, ln_eps=None,
                       weight_bits=8):
    """Pure-jnp emulation of the kernel's exact math (same quantization,
    same fp32 dequant chain, same fused-LN/residual variant) — the
    unit-test oracle."""
    if act_name == "gelu":
        act_name = "gelu_tanh"
    act = _ACTS[act_name]
    orig_shape = x.shape
    xm = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    w1q, s1 = quantize_weight(w1, weight_bits)
    w2q, s2 = quantize_weight(w2, weight_bits)
    if ln_eps is not None:
        ln_in = _ln_rows(xm, ln_scale.astype(jnp.float32)[None, :],
                         ln_bias.astype(jnp.float32)[None, :], ln_eps)
        xq, xs = _quant_rows(ln_in)
    else:
        xq, xs = _quant_rows(xm)
    h = jnp.dot(xq.astype(jnp.int32), w1q.astype(jnp.int32))
    hf = h.astype(jnp.float32) * xs * s1 + b1.astype(jnp.float32)[None, :]
    a = act(hf)
    aq, as_ = _quant_rows(a)
    o = jnp.dot(aq.astype(jnp.int32), w2q.astype(jnp.int32))
    of = o.astype(jnp.float32) * as_ * s2 + b2.astype(jnp.float32)[None, :]
    if ln_eps is not None:
        of = of + xm
    return of.astype(x.dtype).reshape(orig_shape)
