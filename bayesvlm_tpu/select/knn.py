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
    unique entries, then trim from the end.

    DIVERGENCE (upstream latent bug fixed here): the reference's loop has
    no termination guard — when the fetched top-(k_nearest+buffersize)
    columns cannot supply enough unique train indices, its
    `topk.indices[:, :k_]` slice clamps silently, the unique count stops
    growing, and `k_ += 1` spins forever (ref:bayesvlm/knn.py:95-110).
    We break at the fetched width and return what exists. (The kmeans
    variant upstream instead RE-FETCHES a wider top-k — that behavior is
    reproduced exactly in select/knn_kmeans.py:_dedup_refetch.)"""
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


def _resolve_mesh(mesh):
    from bayesvlm_tpu.dist.mesh import resolve_auto_mesh

    return resolve_auto_mesh(mesh)


def _sims_topk_sharded(sims_fn, train: EncoderResult, k_cap: int, mesh,
                       axis: str = "data"):
    """[N_test, N_train] similarities + exact top-k_cap with TRAIN rows
    sharded over a mesh axis: per-shard topk_exact on local columns,
    all_gather the k_cap*n_dev candidates (in device = global column
    order, so tie order matches the unsharded top-k), combine. The
    distributed form of ops.topk_exact's two-stage argument — exact.
    `sims_fn(train_shard)` computes the local similarity columns
    (row-wise math only, so sharding train rows is transparent).
    Falls back to dense when the local width cannot cover k_cap.
    Zero-row pad columns (global id >= n_train, masked to -inf) can
    never surface in the result, even when a test row has >= k_cap
    similarities equal to -inf: both top-k stages are stable by index
    on ties, candidates are combined in global column order, and shard
    0 alone contributes k_cap real-column candidates ahead of any pad
    (pads live only at the tail of the last shard) — verified by
    tests/test_knn_sharded.py::test_neg_inf_similarities_no_pad_ids.
    NaN similarities are unspecified, as for a dense `lax.top_k`.
    Returns (values, global_ids) replicated. No reference counterpart
    (single-GPU torch.topk, ref:bayesvlm/knn.py:92); SURVEY §2.7.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n_train = train.embeds.shape[0]
    pad = (-n_train) % n_dev
    width = (n_train + pad) // n_dev
    if n_dev < 2 or width < k_cap:
        sims = sims_fn(train)
        return topk_exact(sims, k_cap)
    if pad:
        # zero-row padding is masked to -inf below (by global id), so it
        # can never displace a real column
        train = EncoderResult(
            embeds=jnp.concatenate(
                [train.embeds, jnp.zeros((pad,) + train.embeds.shape[1:],
                                         train.embeds.dtype)]),
            activations=jnp.concatenate(
                [train.activations,
                 jnp.zeros((pad,) + train.activations.shape[1:],
                           train.activations.dtype)]),
            residuals=jnp.concatenate(
                [train.residuals,
                 jnp.zeros((pad,) + train.residuals.shape[1:],
                           train.residuals.dtype)]),
        )

    def per_shard(tr):
        sims = sims_fn(tr)                                   # [N_t, width]
        gid0 = jax.lax.axis_index(axis) * width
        valid = (gid0 + jnp.arange(width))[None, :] < n_train
        sims = jnp.where(valid, sims, -jnp.inf)
        v, i = topk_exact(sims, k_cap)
        g = i + gid0
        # gather candidates from all shards in device (= global column)
        # order; ties then resolve exactly as in a dense top-k
        vg = jax.lax.all_gather(v, axis)                     # [n_dev, N_t, k]
        gg = jax.lax.all_gather(g, axis)
        vg = jnp.swapaxes(vg, 0, 1).reshape(v.shape[0], n_dev * k_cap)
        gg = jnp.swapaxes(gg, 0, 1).reshape(v.shape[0], n_dev * k_cap)
        v2, i2 = jax.lax.top_k(vg, k_cap)
        return v2, jnp.take_along_axis(gg, i2, axis=-1)

    return shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis),), out_specs=(P(), P()),
        check_vma=False,
    )(train)


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
    mesh="auto",
) -> OrderedDict:
    """ref:bayesvlm/knn.py:39-137. `mesh`: shard the train pool's
    similarity columns over the data mesh ("auto" = when >1 device;
    exact — see _sims_topk_sharded)."""
    idx = jnp.asarray(indices_test)
    test_sub = test[idx]
    A_inv = source_covariance.A_inv
    B_diag = jnp.diagonal(source_covariance.B_inv)
    k_cap = min(k_nearest + buffersize, train.embeds.shape[0])
    mesh = _resolve_mesh(mesh)
    sims_fn = lambda tr: expected_cosine_similarity(
        test_sub, tr, A_inv, B_diag, has_bias=has_bias)
    if mesh is None:
        vals, ids = topk_exact(sims_fn(train), k_cap)
    else:
        vals, ids = _sims_topk_sharded(sims_fn, train, k_cap, mesh)
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
    mesh="auto",
) -> OrderedDict:
    """ref:bayesvlm/knn.py:139-220 (similarity = -wdist2). `mesh`: as
    in find_similar_samples_cosine."""
    idx = jnp.asarray(indices_test)
    test_sub = test[idx]
    cov = source_covariance
    test_diag = activation_diag_covariance(test_sub.activations, cov, has_bias)
    k_cap = min(k_nearest + buffersize, train.embeds.shape[0])
    mesh = _resolve_mesh(mesh)

    def sims_fn(tr):
        tr_diag = activation_diag_covariance(tr.activations, cov, has_bias)
        return -wdist2(test_sub.embeds, tr.embeds, test_diag, tr_diag)

    if mesh is None:
        vals, ids = topk_exact(sims_fn(train), k_cap)
    else:
        vals, ids = _sims_topk_sharded(sims_fn, train, k_cap, mesh)
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
