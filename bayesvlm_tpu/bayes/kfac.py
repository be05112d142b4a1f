"""Kronecker-factored Laplace covariance (K-FAC) utilities.

The posterior covariance over the projection-layer weights is approximated
as `(A + sqrt(lambda) I)^-1 (x) (B + sqrt(lambda) I)^-1` where

- `A` is the Gram matrix of the projection-layer *inputs* (activations),
- `B` is the GGN of the contrastive loss wrt the projection *outputs*,

both accumulated over the Hessian-estimation dataset and stored divided by
`sqrt(n)` (ref:scripts/hessian_estimation.py:106-109).  Regularization at
load time multiplies back by `sqrt(n)` and adds `sqrt(lambda) I`
(ref:bayesvlm/hessians.py:149-152,170-184).  We reproduce that scaling
convention exactly — artifact compatibility depends on it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class KroneckerFactorizedCovariance:
    """Inverse Kronecker factors of the posterior covariance.

    Mirrors ref:bayesvlm/hessians.py:120-134 but as an immutable pytree.
    """

    A_inv: Array
    B_inv: Array

    @property
    def input_dim(self) -> int:
        return self.A_inv.shape[0]

    @property
    def output_dim(self) -> int:
        return self.B_inv.shape[0]


def regularize_kfac_factor(F: Array, n, lmbda) -> Array:
    """`F * sqrt(n) + sqrt(lambda) * I` (ref:bayesvlm/hessians.py:176-179)."""
    F = jnp.asarray(F)
    sqrt_n = jnp.sqrt(jnp.asarray(n, dtype=F.dtype))
    sqrt_l = jnp.sqrt(jnp.asarray(lmbda, dtype=F.dtype))
    return F * sqrt_n + sqrt_l * jnp.eye(F.shape[0], dtype=F.dtype)


@jax.jit
def _regularize_and_invert(A: Array, B: Array, n: Array, lmbda: Array):
    A_reg = regularize_kfac_factor(A, n, lmbda)
    B_reg = regularize_kfac_factor(B, n, lmbda)
    return jnp.linalg.inv(A_reg), jnp.linalg.inv(B_reg)


def compute_covariance(A: Array, B: Array, n, lmbda) -> KroneckerFactorizedCovariance:
    """Regularize both factors and invert (ref:bayesvlm/hessians.py:170-184)."""
    A_inv, B_inv = _regularize_and_invert(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(n), jnp.asarray(lmbda)
    )
    return KroneckerFactorizedCovariance(A_inv=A_inv, B_inv=B_inv)


def compute_covariances(
    A_img: Array,
    B_img: Array,
    A_txt: Array,
    B_txt: Array,
    info: dict,
) -> Tuple[KroneckerFactorizedCovariance, KroneckerFactorizedCovariance]:
    """Image + text covariances from raw factors and the prior-precision info
    dict {lambda_img, lambda_txt, n_img, n_txt} (ref:bayesvlm/hessians.py:187-201).
    """
    cov_img = compute_covariance(A_img, B_img, info["n_img"], info["lambda_img"])
    cov_txt = compute_covariance(A_txt, B_txt, info["n_txt"], info["lambda_txt"])
    return cov_img, cov_txt
