"""Fused W8A8 int8 linear kernel (Pallas/Mosaic, TPU) for the attention
projections.

Companion to models/mlp_int8.py (same quantization recipe: per-row
absmax int8 activations, per-output-channel absmax int8 weights, int32
MXU accumulation, fp32 dequant). One VMEM-resident program per row
block:

    x[bf16] -> per-row absmax int8 quantize  (VPU, in VMEM)
            -> int8 GEMM vs resident Wq      (MXU double rate)
            -> fp32 dequant + bias -> out dtype

Intended use was the attention QKV + out projections (~20% of ViT-L
tower time; BASELINE.md per-op trace): the three QKV projections are
fused by concatenating their weights to [D, 3D] so the input rows are
quantized ONCE for all three (models/layers.py MultiHeadAttention,
`use_int8_proj`). Opt-in via `VisionConfig.attn_int8`, default off.

MEASURED NEGATIVE end-to-end on v5e (BASELINE.md "int8 attention
projections"): x0.82-0.94 vs bf16 at ViT-L shapes. The fused-QKV GEMM
only reaches x1.12 in isolation (quantize pass + fp32 dequant epilogue
eat the double-rate MXU win at K=1024) and the [D,D] out-proj is
outright slower (low arithmetic intensity); unlike mlp_int8 there is no
hidden-activation HBM saving to pay for the overhead. Kept as a tested
opt-in with calibration deltas measured (H2H full-int8 row), same
convention as split_key / attn_pallas_block. Use `mlp_int8` for the
production int8 win.

Hardware invariant (learned the hard way, BASELINE.md round 6): Mosaic's
masked int8 path CRASHES the TPU worker on a ragged last row block whose
row count is not sublane-aligned — rows are padded to a 32-multiple
(the int8 (32,128) tile) and the pad sliced off, exactly as mlp_int8
does.

No reference counterpart (the reference is fp32/fp16 torch;
ref:bayesvlm/vlm.py:291-374 vision forward). TPU-first design per the
SURVEY §7 fusion strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesvlm_tpu.models.attention_pallas import _out_struct
from bayesvlm_tpu.models.mlp_int8 import _quant_rows, quantize_weight


def _linear_int8_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)                      # [TM, D]
    xq, xs = _quant_rows(x)
    o = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                     # [TM, N] int32
    of = o.astype(jnp.float32) * xs * s_ref[0] + b_ref[0]
    o_ref[:] = of.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def linear_int8(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                block_m: int = 512) -> jax.Array:
    """W8A8 linear: x [..., D] @ w [D, N] + b [N] -> [..., N].

    Output dtype matches x. Rows are independent; any leading shape
    flattens to the kernel's row grid. `b=None` uses a zero bias (the
    kernel always adds one — a [1, N] zero vector is free next to the
    GEMM)."""
    orig_shape = x.shape
    D = orig_shape[-1]
    N = w.shape[1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    row_pad = (-M) % 32  # Mosaic int8 sublane-alignment invariant
    if row_pad:
        xm = jnp.pad(xm, ((0, row_pad), (0, 0)))
    Mp = xm.shape[0]
    tm = min(block_m, Mp)

    wq, s = quantize_weight(w)
    bf = (jnp.zeros((1, N), jnp.float32) if b is None
          else b.astype(jnp.float32).reshape(1, N))

    grid = (pl.cdiv(Mp, tm),)
    out = pl.pallas_call(
        _linear_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((Mp, N), x),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * D * N,
            bytes_accessed=(Mp * D * x.dtype.itemsize + D * N
                            + Mp * N * x.dtype.itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xm, wq, s, bf)
    if row_pad:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))


def linear_int8_reference(x, w, b=None):
    """Pure-jnp emulation of the kernel's exact math — the unit-test
    oracle (same quantization + fp32 dequant chain)."""
    orig_shape = x.shape
    D = orig_shape[-1]
    xm = x.reshape(-1, D).astype(jnp.float32)
    wq, s = quantize_weight(w)
    xq, xs = _quant_rows(xm)
    o = jnp.dot(xq.astype(jnp.int32), wq.astype(jnp.int32))
    of = o.astype(jnp.float32) * xs * s
    if b is not None:
        of = of + b.astype(jnp.float32)[None, :]
    return of.astype(x.dtype).reshape(orig_shape[:-1] + (w.shape[1],))
