"""Core value containers (JAX pytrees).

`EncoderResult` and `ProbabilisticLogits` mirror the containers of the
reference implementation (ref:bayesvlm/vlm.py:27-204) but are immutable JAX
pytrees so they can flow through `jit`/`vmap`/`pjit` unchanged.

Design departures from the reference (all TPU-first, behavior-preserving):

- RNG is explicit: every sampling method takes a `jax.random` key (the
  reference seeds the torch global RNG, ref:bayesvlm/vlm.py:69-70). The
  *statistical* behavior matches; bit-level RNG streams cannot.
- Monte-Carlo loops are `vmap`/batched sampling instead of Python loops over
  `num_samples` — one fused XLA program, no host round-trips.
- The probit path accepts elementwise variances (`var.ndim == mean.ndim`)
  directly. The reference takes a *matrix* diagonal even for 2-D variance
  tensors (ref:bayesvlm/vlm.py:76), which only makes sense for the
  [N, C, C] full-covariance case; for the [N, C] case we use the variances
  as-is (this is what the reference's own zero-shot script does manually,
  ref:scripts/zeroshot.py:119-120).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

_PROBIT_C = math.pi / 8.0


def _as_key(seed_or_key: Union[int, Array, None], default_seed: int = 0) -> Array:
    """Accept either an int seed or a PRNG key."""
    if seed_or_key is None:
        return jax.random.key(default_seed)
    if isinstance(seed_or_key, int):
        return jax.random.key(seed_or_key)
    return seed_or_key


@struct.dataclass
class EncoderResult:
    """Frozen-encoder outputs for a batch.

    Attributes:
      embeds:       [N, D] post-projection embeddings.
      activations:  [N, P] pre-projection pooled activations (the Laplace
                    layer's inputs).
      residuals:    [N, D] SigLIP attention-pool skip connection re-added
                    after the fc2 projection (zeros for CLIP);
                    ref:bayesvlm/vlm.py:560.
    """

    embeds: Array
    activations: Array
    residuals: Array

    @classmethod
    def create(
        cls,
        embeds: Array,
        activations: Array,
        residuals: Optional[Array] = None,
    ) -> "EncoderResult":
        if residuals is None:
            residuals = jnp.zeros_like(embeds)
        return cls(embeds=embeds, activations=activations, residuals=residuals)

    def __len__(self) -> int:
        return self.embeds.shape[0]

    def __getitem__(self, idx) -> "EncoderResult":
        return EncoderResult(
            embeds=self.embeds[idx],
            activations=self.activations[idx],
            residuals=self.residuals[idx],
        )

    def slice(self, start: int, size: int) -> "EncoderResult":
        """Static-shape slice usable inside jit (lax.dynamic_slice semantics)."""
        return EncoderResult(
            embeds=jax.lax.dynamic_slice_in_dim(self.embeds, start, size, 0),
            activations=jax.lax.dynamic_slice_in_dim(self.activations, start, size, 0),
            residuals=jax.lax.dynamic_slice_in_dim(self.residuals, start, size, 0),
        )

    def astype(self, dtype) -> "EncoderResult":
        return EncoderResult(
            embeds=self.embeds.astype(dtype),
            activations=self.activations.astype(dtype),
            residuals=self.residuals.astype(dtype),
        )

    @staticmethod
    def concatenate(results: list["EncoderResult"]) -> "EncoderResult":
        return EncoderResult(
            embeds=jnp.concatenate([r.embeds for r in results], axis=0),
            activations=jnp.concatenate([r.activations for r in results], axis=0),
            residuals=jnp.concatenate([r.residuals for r in results], axis=0),
        )


def _diag_var(mean: Array, var: Array) -> Array:
    """Per-class variances regardless of storage: [N,C] as-is, [N,C,C] diag."""
    if var.ndim == mean.ndim + 1:
        return jnp.diagonal(var, axis1=-2, axis2=-1)
    return var


def probit_scaled_mean(mean: Array, var: Array) -> Array:
    """Multiclass probit scaling mu / sqrt(1 + pi/8 * sigma^2).

    ref:bayesvlm/vlm.py:74-78 and ref:scripts/zeroshot.py:119-120.
    """
    variance = _diag_var(mean, var)
    return mean / jnp.sqrt(1.0 + _PROBIT_C * variance)


@struct.dataclass
class ProbabilisticLogits:
    """Gaussian distribution over logits: elementwise mean and variance.

    `var` is either [N, C] (elementwise / diagonal — the output of the Smith
    probabilistic forward) or [N, C, C] (full covariance per row).
    Mirrors ref:bayesvlm/vlm.py:63-204.
    """

    mean: Array
    var: Array

    def __len__(self) -> int:
        return self.mean.shape[0]

    def __getitem__(self, idx) -> "ProbabilisticLogits":
        return ProbabilisticLogits(mean=self.mean[idx], var=self.var[idx])

    @property
    def diag_var(self) -> Array:
        return _diag_var(self.mean, self.var)

    def map_softmax(self, axis: int = -1) -> Array:
        return jax.nn.softmax(self.mean, axis=axis)

    def probit_softmax(self, axis: int = -1) -> Array:
        """num_samples=0 path of ref:bayesvlm/vlm.py:74-78."""
        return jax.nn.softmax(probit_scaled_mean(self.mean, self.var), axis=axis)

    @property
    def probs(self) -> Array:
        """Probit-approximated probabilities (ELG-variant API,
        ref:bayesvlm/vlm_elg.py:74-85)."""
        return self.probit_softmax()

    @property
    def log_probs(self) -> Array:
        """log-softmax of the probit-scaled mean
        (ref:bayesvlm/vlm_elg.py:205-207)."""
        return jax.nn.log_softmax(probit_scaled_mean(self.mean, self.var), axis=-1)

    def _sample_logits(self, key: Array, num_samples: int) -> Array:
        """[S, N, C] Gaussian samples of the logits (diagonal variance)."""
        if self.var.ndim == self.mean.ndim:  # diagonal
            std = jnp.sqrt(self.var)
            eps = jax.random.normal(
                key, (num_samples,) + self.mean.shape, dtype=self.mean.dtype
            )
            return self.mean[None] + eps * std[None]
        # full covariance: delegate to the chunked path in one chunk
        return jnp.swapaxes(
            self._fullcov_logits_chunk(slice(0, len(self)), key, num_samples),
            0, 1,
        )

    def _fullcov_logits_chunk(self, sl: slice, key: Array, num_samples: int) -> Array:
        """[n, S, C] MVN logit samples for one row chunk.

        Sampling is keyed PER ROW (fold_in of the global row index), so the
        result is invariant to the chunking. Cholesky gets a static jitter
        fallback for near-singular covariances (the reference retries MVN
        construction with growing jitter, ref:bayesvlm/vlm_elg.py:113-119).
        """
        mean = self.mean[sl]
        var = self.var[sl]
        C = var.shape[-1]
        chol = jnp.linalg.cholesky(var)
        jitter = 1e-6 * jnp.maximum(
            jnp.trace(var, axis1=-2, axis2=-1) / C, 1.0
        )[..., None, None]
        chol_j = jnp.linalg.cholesky(var + jitter * jnp.eye(C, dtype=var.dtype))
        bad = jnp.any(jnp.isnan(chol), axis=(-2, -1), keepdims=True)
        chol = jnp.where(bad, chol_j, chol)

        rows = jnp.arange(sl.start, sl.stop)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(rows)
        eps = jax.vmap(
            lambda k: jax.random.normal(k, (num_samples, C), dtype=mean.dtype)
        )(keys)                                          # [n, S, C]
        corr = jnp.einsum("ncd,nsd->nsc", chol, eps)     # [n, S, C]
        return mean[:, None] + corr

    def _fullcov_chunks(self, chunk_size: Optional[int]):
        """Row-chunk slices mirroring ref:bayesvlm/vlm.py:87-103
        (chunk_size=10000): bounds the live [n,C,C] cholesky + [n,S,C]
        sample buffers so BALD/comb_covar scoring runs at reference pool
        sizes without materializing [N,C,C]-scale intermediates at once."""
        N = len(self)
        if chunk_size is None or chunk_size >= N:
            return [slice(0, N)]
        return [slice(i, min(i + chunk_size, N)) for i in range(0, N, chunk_size)]

    def softmax(
        self,
        axis: int = -1,
        num_samples: int = 400,
        seed: Union[int, Array, None] = None,
        chunk_size: Optional[int] = 10_000,
    ) -> Array:
        """Expected softmax probabilities.

        num_samples == 0 -> multiclass probit approximation;
        otherwise Monte-Carlo average of softmax samples, row-chunked in
        the full-covariance case (ref:bayesvlm/vlm.py:68-103).
        """
        if num_samples == 0:
            return self.probit_softmax(axis=axis)
        key = _as_key(seed)
        if self.var.ndim == self.mean.ndim:
            logits = self._sample_logits(key, num_samples)
            return jnp.mean(jax.nn.softmax(logits, axis=axis), axis=0)
        return jnp.concatenate([
            jnp.mean(
                jax.nn.softmax(
                    self._fullcov_logits_chunk(sl, key, num_samples), axis=-1
                ),
                axis=1,
            )
            for sl in self._fullcov_chunks(chunk_size)
        ], axis=0)

    def sample_probas(
        self,
        num_samples: int,
        seed: Union[int, Array, None] = None,
        chunk_size: Optional[int] = 10_000,
    ) -> Array:
        """[N, S, C] softmax probability samples (ref:bayesvlm/vlm.py:105-139,
        row-chunked like the reference in the full-covariance case)."""
        key = _as_key(seed)
        if self.var.ndim == self.mean.ndim:
            logits = self._sample_logits(key, num_samples)  # [S, N, C]
            return jnp.swapaxes(jax.nn.softmax(logits, axis=-1), 0, 1)
        return jnp.concatenate([
            jax.nn.softmax(self._fullcov_logits_chunk(sl, key, num_samples), axis=-1)
            for sl in self._fullcov_chunks(chunk_size)
        ], axis=0)

    def expected_aleatoric_entropy(
        self,
        num_samples: int = 400,
        axis: int = -1,
        seed: Union[int, Array, None] = None,
        chunk_size: Optional[int] = 10_000,
    ) -> Array:
        """E_theta[H[p(y|x,theta)]] via MC (ref:bayesvlm/vlm.py:142-158)."""
        key = _as_key(seed)

        def _ent(logits, sample_axis):
            logp = jax.nn.log_softmax(logits, axis=-1)
            ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
            return jnp.mean(ent, axis=sample_axis)

        if self.var.ndim == self.mean.ndim:
            return _ent(self._sample_logits(key, num_samples), 0)
        return jnp.concatenate([
            _ent(self._fullcov_logits_chunk(sl, key, num_samples), 1)
            for sl in self._fullcov_chunks(chunk_size)
        ], axis=0)

    def cross_entropy(
        self,
        target: Array,
        num_samples: int = 400,
        reduction: str = "sum",
        seed: Union[int, Array, None] = None,
        chunk_size: Optional[int] = 10_000,
    ) -> Array:
        """CE under the logit distribution (ref:bayesvlm/vlm.py:177-198).

        num_samples == 0 -> probit-scaled CE; else MC average. The reference's
        2-D MC path samples with *diagonal* std even when var is [N,C]
        (ref:bayesvlm/vlm.py:185-190); we do the same.
        """
        if num_samples == 0:
            logits = probit_scaled_mean(self.mean, self.var)
            losses = _softmax_ce(logits, target)
        elif self.var.ndim == self.mean.ndim:
            key = _as_key(seed)
            sampled = self._sample_logits(key, num_samples)  # [S, N, C]
            losses = jnp.mean(
                jax.vmap(lambda lg: _softmax_ce(lg, target))(sampled), axis=0
            )
        else:
            key = _as_key(seed)
            losses = jnp.concatenate([
                jnp.mean(
                    _softmax_ce(
                        self._fullcov_logits_chunk(sl, key, num_samples),
                        target[sl, None],
                    ),
                    axis=1,
                )
                for sl in self._fullcov_chunks(chunk_size)
            ], axis=0)
        if reduction == "sum":
            return jnp.sum(losses)
        if reduction == "mean":
            return jnp.mean(losses)
        return losses

    @staticmethod
    def concatenate(parts: list["ProbabilisticLogits"]) -> "ProbabilisticLogits":
        return ProbabilisticLogits(
            mean=jnp.concatenate([p.mean for p in parts], axis=0),
            var=jnp.concatenate([p.var for p in parts], axis=0),
        )


def _softmax_ce(logits: Array, target: Array) -> Array:
    """Per-row softmax cross entropy with integer targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
