"""Probabilistic kNN retrieval (ref:bayesvlm/knn.py).

Two similarity notions between probabilistic embeddings:
  - expected cosine: normalize by the *expected* squared norm
    E||z||^2 = ||mu||^2 + sum(sigma) (same chain as the Smith forward)
  - negative squared 2-Wasserstein between diagonal Gaussians

The dense [N_test, N_train] similarity + top-k is one jitted program; the
iterative grow-k'-until-enough-unique-train-indices dedup loop is
host-side (data-dependent, ref:bayesvlm/knn.py:93-111 — SURVEY §7 calls
this out as deliberately non-jittable).
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.probforward.smith import activation_diag_covariance
from bayesvlm_tpu.types import EncoderResult
from bayesvlm_tpu.ops import topk_exact

Array = jax.Array


@jax.jit
def diagonal_wasserstein_distance(mu1, mu2, cov1, cov2):
    """Squared 2-Wasserstein between diagonal Gaussians
    (ref:bayesvlm/knn.py:6-16):
      ||mu1-mu2||^2 + sum(cov1) + sum(cov2) - 2 sum(sqrt(cov1 cov2))
    Shapes: mu1 [A, D], mu2 [B, D], cov1 [A, D], cov2 [B, D] -> [A, B]."""
    sq = jnp.sum(mu1**2, -1)[:, None] + jnp.sum(mu2**2, -1)[None, :] - 2 * mu1 @ mu2.T
    var_prod = 2.0 * jnp.sqrt(cov1) @ jnp.sqrt(cov2).T
    return sq + jnp.sum(cov1, -1)[:, None] + jnp.sum(cov2, -1)[None, :] - var_prod


def wdist2(mu1, mu2, cov1, cov2):
    """ref:bayesvlm/knn.py:18-20."""
    return diagonal_wasserstein_distance(mu1, mu2, cov1, cov2)


@partial(jax.jit, static_argnames=("has_bias",))
def expected_cosine_similarity(
    test: EncoderResult,
    train: EncoderResult,
    A_inv: Array,
    B_diag: Array,
    has_bias: bool = False,
) -> Array:
    """[N_test, N_train] expected cosine similarity under the posterior
    (ref:bayesvlm/knn.py:59-82)."""
    cov = KroneckerFactorizedCovariance(A_inv=A_inv, B_inv=jnp.diag(B_diag))
    train_diag = activation_diag_covariance(train.activations, cov, has_bias)
    test_diag = activation_diag_covariance(test.activations, cov, has_bias)
    E_train = jnp.sum(train.embeds**2 + train_diag, -1, keepdims=True)
    E_test = jnp.sum(test.embeds**2 + test_diag, -1, keepdims=True)
    return (test.embeds / jnp.sqrt(E_test)) @ (train.embeds / jnp.sqrt(E_train)).T


def _dedup_loop(topk_idx: np.ndarray, topk_val: np.ndarray, k_nearest: int, n_test: int):
    """Host-side reference dedup (ref:bayesvlm/knn.py:93-135): grow k' until
    the column-major flattened top-k' indices contain >= k_nearest*n_test
    unique entries, then trim from the end."""
    goal = k_nearest * n_test
    k_ = k_nearest
    max_k = topk_idx.shape[1]
    while True:
        flat = topk_idx[:, :k_].T.flatten()
        uniq = np.unique(flat)
        if uniq.size >= goal or k_ >= max_k:
            break
        k_ += 1
    # trim from the end until exactly `goal` unique remain (reference's
    # _remove_last_elements_to_keep_n_unique, ref:bayesvlm/knn.py:22-25)
    trimmed = flat
    while np.unique(trimmed).size > goal:
        trimmed = trimmed[:-1]
    keep = set(np.unique(trimmed).tolist())
    return k_, keep


def _collect(
    topk_idx, topk_val, k_, keep, indices_test, values_test
) -> OrderedDict:
    out = OrderedDict()
    for i in range(topk_idx.shape[0]):
        ids = topk_idx[i, :k_]
        vals = topk_val[i, :k_]
        keep_ids = [int(x) for x in ids if int(x) in keep]
        keep_vals = [float(v) for x, v in zip(ids, vals) if int(x) in keep]
        out[int(indices_test[i])] = dict(
            score=float(values_test[i]), indices=keep_ids, similarities=keep_vals
        )
    return out


def find_similar_samples_cosine(
    train: EncoderResult,
    test: EncoderResult,
    indices_test,
    values_test,
    k_nearest: int,
    source_covariance: KroneckerFactorizedCovariance,
    buffersize: int = 150,
    has_bias: bool = False,
) -> OrderedDict:
    """ref:bayesvlm/knn.py:39-137."""
    idx = jnp.asarray(indices_test)
    test_sub = test[idx]
    sims = expected_cosine_similarity(
        test_sub, train,
        source_covariance.A_inv, jnp.diagonal(source_covariance.B_inv),
        has_bias=has_bias,
    )
    k_cap = min(k_nearest + buffersize, train.embeds.shape[0])
    vals, ids = topk_exact(sims, k_cap)
    ids_np, vals_np = np.asarray(ids), np.asarray(vals)
    n_test = len(np.asarray(indices_test))
    k_, keep = _dedup_loop(ids_np, vals_np, k_nearest, n_test)
    return _collect(ids_np, vals_np, k_, keep, np.asarray(indices_test), np.asarray(values_test))


def find_similar_samples_wasserstein(
    train: EncoderResult,
    test: EncoderResult,
    indices_test,
    values_test,
    k_nearest: int,
    source_covariance: KroneckerFactorizedCovariance,
    buffersize: int = 150,
    has_bias: bool = False,
) -> OrderedDict:
    """ref:bayesvlm/knn.py:139-220 (similarity = -wdist2)."""
    idx = jnp.asarray(indices_test)
    test_sub = test[idx]
    cov = source_covariance
    train_diag = activation_diag_covariance(
        train.activations, cov, has_bias
    )
    test_diag = activation_diag_covariance(test_sub.activations, cov, has_bias)
    sims = -wdist2(test_sub.embeds, train.embeds, test_diag, train_diag)
    k_cap = min(k_nearest + buffersize, train.embeds.shape[0])
    vals, ids = topk_exact(sims, k_cap)
    ids_np, vals_np = np.asarray(ids), np.asarray(vals)
    n_test = len(np.asarray(indices_test))
    k_, keep = _dedup_loop(ids_np, vals_np, k_nearest, n_test)
    return _collect(ids_np, vals_np, k_, keep, np.asarray(indices_test), np.asarray(values_test))


def extract_test_train_indices(text_idx_to_train_data) -> dict:
    """Flatten the OrderedDict into unique test/train lists
    (ref:bayesvlm/knn.py:27-37)."""
    test_indices, train_indices = [], []
    for test_idx, data in text_idx_to_train_data.items():
        test_indices.append(int(test_idx))
        train_indices.extend(int(x) for x in data["indices"])
    return dict(test=test_indices, train=list(set(train_indices)))
