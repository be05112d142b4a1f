"""Pallas-fused probabilistic zero-shot head.

Fuses the tail of the Smith chain (ref:bayesvlm/vlm.py:630-684 +
ref:scripts/zeroshot.py:119-120) into ONE kernel pass per image tile:

    mean  = (e_s/sqrt(Es)) @ (e_t/sqrt(Et))^T
    var   = (n_s/Es) @ (sigma_t/Et)^T + (sigma_s/Es) @ (e_t^2/Et)^T
    probs = softmax(mean*e^s / sqrt(1 + pi/8 * var * e^{2s}))

Unfused XLA runs three [B,C] GEMMs + elementwise + softmax as separate
HBM-visiting stages; the kernel holds one [TB, C] tile of all three
accumulators in VMEM, reads the three [C, D] class operands once per image
tile, and emits final probabilities — the [B, C] mean/var never hit HBM.

Row-scaling preludes (1/sqrt(Es), 1/Es, 1/Et) are cheap elementwise ops
left to XLA, which fuses them into the producers.

Class count C is padded to a lane multiple; padded columns are masked to
-inf before the softmax.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PI8 = math.pi / 8.0


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _smith_kernel(
    n_valid_ref,      # SMEM [1, 1] int32: true class count
    scale_ref,        # SMEM [1, 1] f32: e^s
    es_ref,           # VMEM [TB, D]  e_s / sqrt(Es)
    ns_ref,           # VMEM [TB, D]  (e_s^2 + sigma_s) / Es
    ss_ref,           # VMEM [TB, D]  sigma_s / Es
    yt_ref,           # VMEM [C, D]   e_t / sqrt(Et)
    st_ref,           # VMEM [C, D]   sigma_t / Et
    t2_ref,           # VMEM [C, D]   e_t^2 / Et
    out_ref,          # VMEM [TB, C]  probit-softmax probabilities
):
    import jax.lax as lax

    dims = (((1,), (1,)), ((), ()))
    mean = lax.dot_general(
        es_ref[:], yt_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    var = lax.dot_general(
        ns_ref[:], st_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    var += lax.dot_general(
        ss_ref[:], t2_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )

    scale = scale_ref[0, 0]
    mean = mean * scale
    var = var * (scale * scale)

    kappa_mean = mean * lax.rsqrt(1.0 + _PI8 * var)

    n_valid = n_valid_ref[0, 0]
    col = lax.broadcasted_iota(jnp.int32, kappa_mean.shape, 1)
    kappa_mean = jnp.where(col < n_valid, kappa_mean, -jnp.inf)

    out_ref[:] = jax.nn.softmax(kappa_mean, axis=-1)


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_call(
    es_hat: Array,    # [B, D]
    ns_bar: Array,
    ss_bar: Array,
    yt_hat: Array,    # [Cp, D] padded
    st_bar: Array,
    t2_bar: Array,
    n_valid: Array,   # int32 scalar
    scale: Array,     # f32 scalar
    block_b: int,
    interpret: bool,
):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        smem = pltpu.SMEM
    except Exception:  # pragma: no cover
        vmem = smem = None

    B, D = es_hat.shape
    Cp = yt_hat.shape[0]
    grid = (B // block_b,)

    def row_spec():
        return pl.BlockSpec(
            (block_b, D), lambda i: (i, 0),
            **({"memory_space": vmem} if vmem else {}),
        )

    def full_spec(rows):
        return pl.BlockSpec(
            (rows, D), lambda i: (0, 0),
            **({"memory_space": vmem} if vmem else {}),
        )

    scalar_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0),
        **({"memory_space": smem} if smem else {}),
    )

    return pl.pallas_call(
        _smith_kernel,
        grid=grid,
        in_specs=[
            scalar_spec,
            scalar_spec,
            row_spec(), row_spec(), row_spec(),
            full_spec(Cp), full_spec(Cp), full_spec(Cp),
        ],
        out_specs=pl.BlockSpec(
            (block_b, Cp), lambda i: (i, 0),
            **({"memory_space": vmem} if vmem else {}),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Cp), jnp.float32),
        interpret=interpret,
    )(
        n_valid.reshape(1, 1), scale.reshape(1, 1),
        es_hat, ns_bar, ss_bar, yt_hat, st_bar, t2_bar,
    )


def fused_probit_probs(
    source_embeds: Array,       # [B, D]
    source_diag_cov: Array,     # [B, D]
    target_embeds: Array,       # [C, D]
    target_diag_cov: Array,     # [C, D]
    logit_scale: Array,
    block_b: int = 128,
    interpret: bool = False,
) -> Array:
    """Probit-softmax zero-shot probabilities, Pallas-fused. Returns [B, C].

    Inputs are the embedding means and the per-sample diagonal covariances
    (sigma from `activation_diag_covariance`)."""
    B, D = source_embeds.shape
    C = target_embeds.shape[0]

    n_s = source_embeds**2 + source_diag_cov
    E_s = jnp.sum(n_s, -1, keepdims=True)
    n_t = target_embeds**2 + target_diag_cov
    E_t = jnp.sum(n_t, -1, keepdims=True)

    es_hat = source_embeds / jnp.sqrt(E_s)
    ns_bar = n_s / E_s
    ss_bar = source_diag_cov / E_s
    yt_hat = target_embeds / jnp.sqrt(E_t)
    st_bar = target_diag_cov / E_t
    t2_bar = (target_embeds**2) / E_t

    # pad classes to the lane width and batch to the block size
    Cp = _ceil_to(C, 128)
    if Cp != C:
        pad = ((0, Cp - C), (0, 0))
        yt_hat = jnp.pad(yt_hat, pad)
        st_bar = jnp.pad(st_bar, pad)
        t2_bar = jnp.pad(t2_bar, pad)
    Bp = _ceil_to(B, block_b)
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        es_hat = jnp.pad(es_hat, pad)
        ns_bar = jnp.pad(ns_bar, pad)
        ss_bar = jnp.pad(ss_bar, pad)

    probs = _fused_call(
        es_hat.astype(jnp.float32),
        ns_bar.astype(jnp.float32),
        ss_bar.astype(jnp.float32),
        yt_hat.astype(jnp.float32),
        st_bar.astype(jnp.float32),
        t2_bar.astype(jnp.float32),
        jnp.asarray(C, jnp.int32),
        jnp.exp(jnp.asarray(logit_scale, jnp.float32)),
        block_b=block_b,
        interpret=interpret,
    )
    return probs[:B, :C]


def smith_probit_probs_reference(
    source_embeds, source_diag_cov, target_embeds, target_diag_cov, logit_scale
):
    """Unfused XLA reference of the same chain (for tests/benchmarks)."""
    n_s = source_embeds**2 + source_diag_cov
    E_s = jnp.sum(n_s, -1, keepdims=True)
    n_t = target_embeds**2 + target_diag_cov
    E_t = jnp.sum(n_t, -1, keepdims=True)
    mean = (source_embeds / jnp.sqrt(E_s)) @ (target_embeds / jnp.sqrt(E_t)).T
    var = (n_s @ target_diag_cov.T + source_diag_cov @ (target_embeds**2).T) / (
        E_s * E_t.T
    )
    scale = jnp.exp(jnp.asarray(logit_scale, jnp.float32))
    mean = mean * scale
    var = var * scale**2
    return jax.nn.softmax(mean / jnp.sqrt(1.0 + _PI8 * var), axis=-1)
