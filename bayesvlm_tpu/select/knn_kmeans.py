"""kNN over k-means representatives, mapping hits back to full-train
indices (ref:bayesvlm/knn_kmeans.py).

Same math as `select.knn` with four behavioral additions from the
reference variant:
  - expected-norm clamping (>= 1e-12) before the rsqrt
    (ref:bayesvlm/knn_kmeans.py:138-140),
  - per-test-sample cap of `k_nearest` kept neighbors
    (ref:bayesvlm/knn_kmeans.py:205-211),
  - dynamic buffer re-fetch: when the grow-k' loop exhausts the
    initially fetched top-k width, a WIDER top-k is fetched
    (k'+buffersize) and the loop continues; termination is
    unique>=goal or k' >= n_representatives
    (ref:bayesvlm/knn_kmeans.py:174,182-186),
  - local->original index remapping through `original_train_indices`.

H2H-verified against the reference's own torch code (both variants,
re-fetch + per-test cap exercised) in
tests/test_reference_parity_knn_kmeans.py.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.probforward.smith import activation_diag_covariance
from bayesvlm_tpu.select.knn import wdist2
from bayesvlm_tpu.types import EncoderResult
from bayesvlm_tpu.ops import topk_exact

Array = jax.Array


def _dedup_refetch(sims: Array, k_nearest: int, buffersize: int):
    """Grow-k' dedup with the kmeans variant's dynamic buffer re-fetch
    (ref:bayesvlm/knn_kmeans.py:150-186): fetch top-(k_nearest+buffer),
    grow k' by 1 until the column-major flattened top-k' ids contain
    >= k_nearest*n_test unique entries or k' >= n_representatives; when
    k' outgrows the fetched width, re-fetch top-(k'+buffer). Then trim
    the flat id list from the end to exactly the goal unique count
    (ref :54-64) — the kept set. Returns (ids, vals, k', keep) with ids
    /vals at the LAST fetched width (the reference collects from the
    re-fetched topk, ref :194)."""
    n_test, n_reps = sims.shape
    goal = k_nearest * n_test
    k_fetch = min(k_nearest + buffersize, n_reps)
    vals, ids = topk_exact(sims, k_fetch)
    ids_np, vals_np = np.asarray(ids), np.asarray(vals)
    k_ = k_nearest
    while True:
        flat = ids_np[:, :k_].T.flatten()  # clamped slice, as in torch
        if np.unique(flat).size >= goal or k_ >= n_reps:
            trimmed = flat
            while np.unique(trimmed).size > goal:
                trimmed = trimmed[:-1]
            keep = set(np.unique(trimmed).tolist())
            return ids_np, vals_np, min(k_, ids_np.shape[1]), keep
        k_ += 1
        if k_ > k_fetch and k_fetch < n_reps:
            k_fetch = min(k_ + buffersize, n_reps)
            vals, ids = topk_exact(sims, k_fetch)
            ids_np, vals_np = np.asarray(ids), np.asarray(vals)


def _expected_cosine_clamped(
    test_sub: EncoderResult,
    train: EncoderResult,
    cov: KroneckerFactorizedCovariance,
    has_bias: bool,
) -> Array:
    train_diag = activation_diag_covariance(train.activations, cov, has_bias)
    test_diag = activation_diag_covariance(test_sub.activations, cov, has_bias)
    E_train = jnp.clip(
        jnp.sum(train.embeds**2 + train_diag, -1, keepdims=True), 1e-12
    )
    E_test = jnp.clip(
        jnp.sum(test_sub.embeds**2 + test_diag, -1, keepdims=True), 1e-12
    )
    return (test_sub.embeds / jnp.sqrt(E_test)) @ (
        train.embeds / jnp.sqrt(E_train)
    ).T


def _collect_remapped(
    topk_idx, topk_val, k_, keep, indices_test, values_test,
    original_train_indices, k_nearest,
) -> OrderedDict:
    orig = np.asarray(original_train_indices)
    out = OrderedDict()
    for i in range(topk_idx.shape[0]):
        ids_local = topk_idx[i, :k_]
        vals = topk_val[i, :k_]
        keep_ids, keep_vals = [], []
        for idx_local, val in zip(ids_local, vals):
            if int(idx_local) in keep:
                keep_ids.append(int(orig[int(idx_local)]))
                keep_vals.append(float(val))
                if len(keep_ids) >= k_nearest:
                    break
        out[int(indices_test[i])] = dict(
            score=float(values_test[i]), indices=keep_ids, similarities=keep_vals
        )
    return out


def find_similar_samples_cosine(
    train: EncoderResult,
    test: EncoderResult,
    indices_test,
    values_test,
    original_train_indices,
    k_nearest: int,
    source_covariance: KroneckerFactorizedCovariance,
    buffersize: int = 150,
    has_bias: bool = False,
) -> OrderedDict:
    """ref:bayesvlm/knn_kmeans.py:80-224."""
    test_sub = test[jnp.asarray(indices_test)]
    sims = _expected_cosine_clamped(test_sub, train, source_covariance, has_bias)
    ids_np, vals_np, k_, keep = _dedup_refetch(sims, k_nearest, buffersize)
    return _collect_remapped(
        ids_np, vals_np, k_, keep,
        np.asarray(indices_test), np.asarray(values_test),
        original_train_indices, k_nearest,
    )


def find_similar_samples_wasserstein(
    train: EncoderResult,
    test: EncoderResult,
    indices_test,
    values_test,
    original_train_indices,
    k_nearest: int,
    source_covariance: KroneckerFactorizedCovariance,
    buffersize: int = 150,
    has_bias: bool = False,
) -> OrderedDict:
    """ref:bayesvlm/knn_kmeans.py:226-352 (similarity = -wdist2, clamped)."""
    test_sub = test[jnp.asarray(indices_test)]
    cov = source_covariance
    train_diag = activation_diag_covariance(train.activations, cov, has_bias)
    test_diag = activation_diag_covariance(test_sub.activations, cov, has_bias)
    sims = -jnp.clip(
        wdist2(test_sub.embeds, train.embeds, test_diag, train_diag), 0.0
    )
    ids_np, vals_np, k_, keep = _dedup_refetch(sims, k_nearest, buffersize)
    return _collect_remapped(
        ids_np, vals_np, k_, keep,
        np.asarray(indices_test), np.asarray(values_test),
        original_train_indices, k_nearest,
    )
