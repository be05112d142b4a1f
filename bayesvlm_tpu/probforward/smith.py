"""Probabilistic image-text similarity head (mean + variance of cosine
logits under the K-FAC Laplace posterior).

This is the inference hot path: the 6-step chain of
ref:bayesvlm/vlm.py:630-684 ("Smith forward"):

    1. (biased projections) append a ones column to the activations
    2. sigma[i, :] = (a_i^T A_inv a_i) * diag(B_inv)      per-sample diag cov
    3. E||z||^2 = sum(mu^2 + sigma)                        expected sq. norms
    4. mean     = (mu_s / sqrt(Es)) @ (mu_t / sqrt(Et))^T
    5. var      = ((mu_s^2 + sigma_s) @ sigma_t^T + sigma_s @ (mu_t^2)^T)
                  / (Es Et^T)
    6. mean *= e^s (+ bias for SigLIP in logits space? no — the reference
       adds no bias in the Smith path), var *= e^{2s}

TPU-first notes:
  - The quadratic form a^T A_inv a is evaluated as row-wise square of
    `a @ L` where `A_inv = L L^T` would require a cholesky; we instead use
    `sum((a @ A_inv) * a, -1)` — one [N,P]x[P,P] GEMM + elementwise reduce,
    which XLA fuses. Identical numerics to the reference einsum.
  - Everything is one jitted function of static shape; a Pallas-fused
    variant lives in bayesvlm_tpu.probforward.kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits

Array = jax.Array


@struct.dataclass
class ProbabilisticHead:
    """Similarity head state: temperature, bias and the two posteriors.

    Plays the role of the reference `CLIP` / `SIGLIP` similarity modules
    (ref:bayesvlm/vlm.py:567-728). `source/target_projection_has_bias`
    distinguishes SigLIP (biased projections -> ones column appended to the
    activations, ref:bayesvlm/vlm.py:650-654).
    """

    logit_scale: Array
    logit_bias: Array
    source_covariance: Optional[KroneckerFactorizedCovariance] = None
    target_covariance: Optional[KroneckerFactorizedCovariance] = None
    source_projection_has_bias: bool = struct.field(pytree_node=False, default=False)
    target_projection_has_bias: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        logit_scale: float,
        logit_bias: float = 0.0,
        source_covariance: Optional[KroneckerFactorizedCovariance] = None,
        target_covariance: Optional[KroneckerFactorizedCovariance] = None,
        has_bias: bool = False,
    ) -> "ProbabilisticHead":
        return cls(
            logit_scale=jnp.asarray(logit_scale, jnp.float32),
            logit_bias=jnp.asarray(logit_bias, jnp.float32),
            source_covariance=source_covariance,
            target_covariance=target_covariance,
            source_projection_has_bias=has_bias,
            target_projection_has_bias=has_bias,
        )

    def set_covariances(
        self,
        source_covariance: Optional[KroneckerFactorizedCovariance],
        target_covariance: Optional[KroneckerFactorizedCovariance],
    ) -> "ProbabilisticHead":
        return self.replace(
            source_covariance=source_covariance,
            target_covariance=target_covariance,
        )

    def __call__(
        self,
        source,
        target,
        map_estimate: bool = False,
    ):
        """Dispatch like ref:bayesvlm/vlm.py:686-710."""
        if isinstance(source, EncoderResult) and isinstance(target, EncoderResult):
            if map_estimate:
                mean = deterministic_logits(
                    source.embeds, target.embeds, self.logit_scale, self.logit_bias
                )
                return ProbabilisticLogits(mean=mean, var=jnp.zeros_like(mean))
            return probabilistic_logits(self, source, target)
        return deterministic_logits(source, target, self.logit_scale, self.logit_bias)


@jax.jit
def deterministic_logits(
    source_embeds: Array,
    target_embeds: Array,
    logit_scale: Array,
    logit_bias: Array,
) -> Array:
    """Cosine-similarity logits (ref:bayesvlm/vlm.py:617-628)."""
    s = source_embeds / jnp.linalg.norm(source_embeds, axis=-1, keepdims=True)
    t = target_embeds / jnp.linalg.norm(target_embeds, axis=-1, keepdims=True)
    return s @ t.T * jnp.exp(logit_scale) + logit_bias


def _maybe_append_ones(a: Array, has_bias: bool) -> Array:
    if has_bias:
        return jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=-1)
    return a


def activation_diag_covariance(
    activations: Array,
    cov: KroneckerFactorizedCovariance,
    has_bias: bool = False,
) -> Array:
    """Per-sample diagonal embedding covariance
    sigma[i, :] = (a_i^T A_inv a_i) * diag(B_inv)  (ref:bayesvlm/vlm.py:662).
    Returns [N, D].
    """
    a = _maybe_append_ones(activations, has_bias)
    quad = jnp.sum((a @ cov.A_inv) * a, axis=-1)  # [N]
    return quad[:, None] * jnp.diagonal(cov.B_inv)[None, :]


@partial(jax.jit, static_argnames=("source_has_bias", "target_has_bias"))
@jax.default_matmul_precision("highest")
def _smith_forward(
    source_embeds: Array,
    source_activations: Array,
    target_embeds: Array,
    target_activations: Array,
    src_A_inv: Array,
    src_B_diag: Array,
    tgt_A_inv: Array,
    tgt_B_diag: Array,
    logit_scale: Array,
    source_has_bias: bool,
    target_has_bias: bool,
):
    a_s = _maybe_append_ones(source_activations, source_has_bias)
    a_t = _maybe_append_ones(target_activations, target_has_bias)

    quad_s = jnp.sum((a_s @ src_A_inv) * a_s, axis=-1)       # [B]
    quad_t = jnp.sum((a_t @ tgt_A_inv) * a_t, axis=-1)       # [C]
    sigma_s = quad_s[:, None] * src_B_diag[None, :]          # [B, D]
    sigma_t = quad_t[:, None] * tgt_B_diag[None, :]          # [C, D]

    n_s = source_embeds**2 + sigma_s                         # [B, D]
    n_t = target_embeds**2 + sigma_t                         # [C, D]
    E_s = jnp.sum(n_s, axis=-1, keepdims=True)               # [B, 1]
    E_t = jnp.sum(n_t, axis=-1, keepdims=True)               # [C, 1]

    mean = (source_embeds / jnp.sqrt(E_s)) @ (target_embeds / jnp.sqrt(E_t)).T

    term1 = n_s @ sigma_t.T                                  # [B, C]
    term2 = sigma_s @ (target_embeds**2).T                   # [B, C]
    var = (term1 + term2) / (E_s * E_t.T)

    scale = jnp.exp(logit_scale)
    return mean * scale, var * scale**2


def probabilistic_logits(
    head: ProbabilisticHead,
    source: EncoderResult,
    target: EncoderResult,
) -> ProbabilisticLogits:
    """Mean/variance of scaled cosine logits (ref:bayesvlm/vlm.py:630-684)."""
    if head.source_covariance is None or head.target_covariance is None:
        raise ValueError("covariances must be set before the probabilistic forward")
    mean, var = _smith_forward(
        source.embeds,
        source.activations,
        target.embeds,
        target.activations,
        head.source_covariance.A_inv,
        jnp.diagonal(head.source_covariance.B_inv),
        head.target_covariance.A_inv,
        jnp.diagonal(head.target_covariance.B_inv),
        head.logit_scale,
        head.source_projection_has_bias,
        head.target_projection_has_bias,
    )
    return ProbabilisticLogits(mean=mean, var=var)
