"""Evaluation metrics: ACC, NLPD, ECE — pure JAX.

ECE reproduces torchmetrics' `MulticlassCalibrationError(n_bins=20,
norm='l1')` semantics used by the reference (ref:scripts/zeroshot.py:17-23):
top-1 confidence binned into `n_bins` equal-width bins over (0, 1], L1
weighting |acc_bin - conf_bin| * (count_bin / N).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.jit
def accuracy(probs: Array, labels: Array) -> Array:
    """Per-sample 0/1 accuracy vector (ref:scripts/zeroshot.py:19-20)."""
    pred = jnp.argmax(probs, axis=-1)
    return (pred == labels).astype(jnp.float32)


@jax.jit
def nlpd(probs: Array, labels: Array, eps: float = 0.0) -> Array:
    """Per-sample negative log predictive density,
    -log Categorical(probs)[y] with torch-style prob normalization
    (ref:scripts/zeroshot.py:21)."""
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    p_true = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.log(p_true + eps)


@partial(jax.jit, static_argnames=("n_bins",))
def expected_calibration_error(
    probs: Array, labels: Array, n_bins: int = 20
) -> Array:
    """L1 ECE with equal-width confidence bins (torchmetrics parity)."""
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)

    # torchmetrics: boundaries 0..1, bucketize confidences (right-closed)
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    bin_idx = jnp.clip(jnp.searchsorted(edges, conf, side="left") - 1, 0, n_bins - 1)

    counts = jnp.zeros(n_bins).at[bin_idx].add(1.0)
    conf_sum = jnp.zeros(n_bins).at[bin_idx].add(conf)
    acc_sum = jnp.zeros(n_bins).at[bin_idx].add(correct)

    nonzero = counts > 0
    avg_conf = jnp.where(nonzero, conf_sum / jnp.maximum(counts, 1.0), 0.0)
    avg_acc = jnp.where(nonzero, acc_sum / jnp.maximum(counts, 1.0), 0.0)
    weights = counts / conf.shape[0]
    return jnp.sum(jnp.abs(avg_acc - avg_conf) * weights)


def evaluate_prediction(
    probs: Array, labels: Array, num_classes: int, n_bins: int = 20
) -> Tuple[Array, Array, float]:
    """(per-sample acc, per-sample nlpd, scalar ece) like
    ref:scripts/zeroshot.py:17-23."""
    del num_classes  # shape-implied in JAX; kept for CLI parity
    acc = accuracy(probs, labels)
    nl = nlpd(probs, labels)
    ece = expected_calibration_error(probs, labels, n_bins=n_bins)
    return acc, nl, float(ece)
