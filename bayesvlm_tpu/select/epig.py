"""EPIG (expected predictive information gain) acquisition
(ref:bayesvlm/epig.py).

epig_from_probs_using_matmul is one jitted program: the joint entropy
contraction probs_pool [N_p, C, K] @ probs_targ [K, N_t*C] runs in bfloat16
on the MXU with fp32 accumulation (the reference casts to fp16 on CUDA,
ref:bayesvlm/epig.py:324,334 — bf16 is the TPU-native equivalent; wider
exponent, same MXU throughput).

select_epig_online keeps the reference's outer budget loop host-side (the
argmax-excluding-already-selected is data-dependent) and jits everything
inside: the probabilistic forward, EPIG scores, the single-sample gradient
step on the image projection, the rank-1-ish Hessian update, and the
20-step lambda re-optimization.
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.hessians import hessian_infonce
from bayesvlm_tpu.bayes.kfac import compute_covariances
from bayesvlm_tpu.bayes.prior import optimize_prior_precision
from bayesvlm_tpu.ops import topk_exact
from bayesvlm_tpu.probforward.smith import ProbabilisticHead, activation_diag_covariance
from bayesvlm_tpu.select.knn import expected_cosine_similarity, wdist2
from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits

Array = jax.Array


def entropy_from_probs(probs: Array) -> Array:
    """H[p] with 0 log 0 = 0 (ref:bayesvlm/epig.py:275-292)."""
    return -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0), axis=-1)


def marginal_entropy_from_probs(probs: Array) -> Array:
    """H[mean_K p] for probs [N, K, C] (ref:bayesvlm/epig.py:294-311)."""
    assert probs.ndim == 3
    return entropy_from_probs(jnp.mean(probs, axis=1))


@partial(jax.jit, static_argnames=("use_pallas",))
def epig_from_probs_using_matmul(
    probs_pool: Array, probs_targ: Array, use_pallas: Optional[bool] = None
) -> Array:
    """EPIG = H[pool] + E[H[targ]] - E[H[joint]]
    (ref:bayesvlm/epig.py:342-397).

    probs_pool [N_p, K, C], probs_targ [N_t, K, C] -> [N_p].

    `use_pallas=None` auto-selects the fused joint-entropy kernel
    (select/epig_pallas.py) on TPU — same bf16/fp32 contract, the
    [N_p*C, N_t*C] joint tiles never leave VMEM; measured 58.1 -> 51.5
    ms/step at the reference operating point (BASELINE.md round 3)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from bayesvlm_tpu.select.epig_pallas import epig_from_probs_pallas

        # explicit use_pallas=True off-TPU runs the kernel in interpret
        # mode (same contract as fused_attention)
        return epig_from_probs_pallas(
            probs_pool, probs_targ,
            interpret=jax.default_backend() != "tpu",
        )

    N_t, K, C = probs_targ.shape

    entropy_pool = marginal_entropy_from_probs(probs_pool)          # [N_p]
    entropy_targ = jnp.mean(marginal_entropy_from_probs(probs_targ))

    pool = jnp.swapaxes(probs_pool, 1, 2).astype(jnp.bfloat16)      # [N_p, C, K]
    targ = jnp.swapaxes(probs_targ, 0, 1).reshape(K, N_t * C)       # [K, N_t*C]
    targ = targ.astype(jnp.bfloat16)

    joint = jax.lax.dot_general(
        pool, targ,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / K                                                            # [N_p, C, N_t*C]
    xlogy = jnp.where(joint > 0, joint * jnp.log(joint), 0.0)
    entropy_joint = -jnp.sum(xlogy, axis=(-2, -1)) / N_t             # [N_p]

    return entropy_pool + entropy_targ - entropy_joint


def epig_from_probs_sharded(
    probs_pool: Array,
    probs_targ: Array,
    mesh,
    axis: str = "data",
    use_pallas: Optional[bool] = None,
) -> Array:
    """EPIG scores with pool rows sharded over a mesh axis.

    EPIG is per-pool-row (the target side enters only through replicated
    reductions), so the TPU-native distribution is embarrassingly
    parallel: shard_map over pool rows, target replicated, ZERO
    collectives — each chip scores its rows with the same per-row math
    as the unsharded path (exact match; padding rows are uniform
    distributions and trimmed). No reference counterpart (single-GPU,
    ref:bayesvlm/epig.py:313-340); SURVEY §2.7 data-parallel plan.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n = probs_pool.shape[0]
    pad = (-n) % n_dev
    if pad:
        filler = jnp.full(
            (pad,) + probs_pool.shape[1:],
            1.0 / probs_pool.shape[-1], probs_pool.dtype,
        )
        probs_pool = jnp.concatenate([probs_pool, filler], axis=0)

    def per_shard(pp, pt):
        return epig_from_probs_using_matmul(pp, pt, use_pallas=use_pallas)

    out = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(axis),
        # interpret-mode pallas under shard_map trips the vma validator
        # upstream (same note as models/attention_pallas.py)
        check_vma=False,
    )(probs_pool, probs_targ)
    return out[:n]


def epig_from_logits_using_matmul(
    logits_pool: ProbabilisticLogits,
    logits_targ: ProbabilisticLogits,
    seed: int,
    num_samples: int,
    chunk_size: int = 4096,
    mesh=None,
    mesh_axis: str = "data",
) -> Array:
    """Chunked-over-pool EPIG from logit distributions
    (ref:bayesvlm/epig.py:313-340). With `mesh`, each chunk's scores are
    computed pool-row-sharded over `mesh_axis` (sampling stays global,
    so chunking/seed semantics are unchanged vs the unsharded path)."""
    N_p = logits_pool.mean.shape[0]
    scores = []
    for i in range(0, N_p, chunk_size):
        probs_targ = logits_targ.sample_probas(num_samples, seed=seed + i)
        chunk = logits_pool[slice(i, min(i + chunk_size, N_p))]
        probs_pool = chunk.sample_probas(num_samples, seed=seed + i)
        if mesh is not None:
            scores.append(
                epig_from_probs_sharded(probs_pool, probs_targ, mesh,
                                        axis=mesh_axis)
            )
        else:
            scores.append(epig_from_probs_using_matmul(probs_pool, probs_targ))
    return jnp.concatenate(scores, axis=0)


def update_embeddings(kernel: Array, bias: Optional[Array], outputs: EncoderResult) -> EncoderResult:
    """Recompute embeds from the (updated) projection
    (ref:bayesvlm/epig.py:15-42): embeds = activations @ W^T (+b) + residuals."""
    embeds = outputs.activations @ kernel
    if bias is not None:
        embeds = embeds + bias
    embeds = embeds + outputs.residuals
    return EncoderResult(
        embeds=embeds, activations=outputs.activations, residuals=outputs.residuals
    )


@partial(jax.jit, static_argnames=("has_bias",))
def _epig_sgd_step(
    kernel: Array,              # [P, D] (flax layout)
    bias: Optional[Array],
    best_activation: Array,     # [1, P]
    best_residual: Array,       # [1, D]
    best_class_id: Array,       # [1]
    label_features: EncoderResult,
    src_A_inv: Array,
    src_B_diag: Array,
    tgt_A_inv: Array,
    tgt_B_diag: Array,
    logit_scale: Array,
    lr: float,
    has_bias: bool,
):
    """One manual SGD step on the projection weight only
    (ref:bayesvlm/epig.py:209-231 — bias is NOT updated there)."""

    def loss_fn(W):
        embeds = best_activation @ W + (bias if bias is not None else 0.0) + best_residual
        # probabilistic forward mean (Smith), gradient flows through embeds
        a_s = best_activation
        if has_bias:
            a_s = jnp.concatenate([a_s, jnp.ones_like(a_s[:, :1])], -1)
        quad_s = jnp.sum((a_s @ src_A_inv) * a_s, -1)
        sigma_s = quad_s[:, None] * src_B_diag[None, :]
        a_t = label_features.activations
        if has_bias:
            a_t = jnp.concatenate([a_t, jnp.ones_like(a_t[:, :1])], -1)
        quad_t = jnp.sum((a_t @ tgt_A_inv) * a_t, -1)
        sigma_t = quad_t[:, None] * tgt_B_diag[None, :]
        E_s = jnp.sum(embeds**2 + sigma_s, -1, keepdims=True)
        E_t = jnp.sum(label_features.embeds**2 + sigma_t, -1, keepdims=True)
        mean = (embeds / jnp.sqrt(E_s)) @ (label_features.embeds / jnp.sqrt(E_t)).T
        mean = mean * jnp.exp(logit_scale)
        logp = jax.nn.log_softmax(mean, axis=-1)
        return -jnp.take_along_axis(logp, best_class_id[:, None], axis=-1).mean()

    grad = jax.grad(loss_fn)(kernel)
    return kernel - lr * grad


def select_epig_online(
    label_features: EncoderResult,
    pool_features: EncoderResult,
    target_features: EncoderResult,
    pool_class_ids: Array,
    projection_kernel: Array,           # [P, D] flax layout
    projection_bias: Optional[Array],
    head: ProbabilisticHead,
    A_img: Array,
    A_txt: Array,
    B_img: Array,
    B_txt: Array,
    cov_info: dict,
    budget: int,
    lr: float,
    hessian_update_scale: float,
    num_samples: int,
    seed: int,
    projection_l2: float,
    projection_num_params: int,
    pool_max_size: Optional[int] = None,
    target_max_size: Optional[int] = None,
    chunk_size: int = 4096,
    pool_subsampling: Literal["random", "knn_cosine", "knn_wasserstein"] = "random",
    k_nearest_neighbors: int = 1,
    proj_has_bias: bool = False,
    hessian_n0: int = 327_680,
    mesh="auto",
):
    """Online EPIG active learning (ref:bayesvlm/epig.py:44-273).

    Returns (selected_indices, epig_scores). `hessian_n0` is the reference's
    hard-coded initial-Hessian sample count (ref:bayesvlm/epig.py:248-251).

    `mesh`: device mesh for pool-row-sharded per-step scoring
    (epig_from_probs_sharded). "auto" (default) uses the default data
    mesh when more than one device is visible — the same gating as the
    AL drivers' batch-sharded feature precompute; pass None to force
    single-device scoring.
    """
    from bayesvlm_tpu.dist.mesh import resolve_auto_mesh

    mesh = resolve_auto_mesh(mesh)
    cov_info = dict(cov_info)
    key = jax.random.key(seed)

    kernel = jnp.asarray(projection_kernel)
    bias = None if projection_bias is None else jnp.asarray(projection_bias)

    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, cov_info)
    head = head.set_covariances(cov_img, cov_txt)

    n_pool = len(pool_features)
    n_target = len(target_features)

    # --- target subsampling (ref:bayesvlm/epig.py:99-102) ---
    if target_max_size is not None and target_max_size < n_target:
        key, sub = jax.random.split(key)
        indices_target = np.asarray(jax.random.permutation(sub, n_target))[:target_max_size]
    else:
        indices_target = np.arange(n_target)

    # --- pool subsampling (ref:bayesvlm/epig.py:104-164) ---
    if pool_subsampling == "random":
        if pool_max_size is not None and pool_max_size < n_pool:
            key, sub = jax.random.split(key)
            indices_pool = np.asarray(jax.random.permutation(sub, n_pool))[:pool_max_size]
        else:
            indices_pool = np.arange(n_pool)
    elif pool_subsampling == "knn_cosine":
        sims = expected_cosine_similarity(
            target_features[jnp.asarray(indices_target)], pool_features,
            cov_img.A_inv, jnp.diagonal(cov_img.B_inv), has_bias=proj_has_bias,
        )
        # top-k instead of a full-width device sort (ops.topk_exact,
        # BASELINE.md); np.unique erases order, so only float-tie sets
        # straddling the k boundary could differ from argsort[::-1]
        _, nn = topk_exact(sims, min(k_nearest_neighbors, sims.shape[1]))
        indices_pool = np.unique(np.asarray(nn).flatten())
        if len(indices_pool) < budget:
            raise ValueError(
                f"Could not find enough samples in the pool. Found "
                f"{len(indices_pool)}, expected at least {budget}."
            )
    elif pool_subsampling == "knn_wasserstein":
        cov = cov_img
        pool_diag = activation_diag_covariance(pool_features.activations, cov, proj_has_bias)
        targ_sub = target_features[jnp.asarray(indices_target)]
        targ_diag = activation_diag_covariance(targ_sub.activations, cov, proj_has_bias)
        sims = -wdist2(targ_sub.embeds, pool_features.embeds, targ_diag, pool_diag)
        _, nn = topk_exact(sims, min(k_nearest_neighbors, sims.shape[1]))
        indices_pool = np.unique(np.asarray(nn).flatten())
        if len(indices_pool) < budget:
            raise ValueError(
                f"Could not find enough samples in the pool. Found "
                f"{len(indices_pool)}, expected at least {budget}."
            )
    else:
        raise ValueError(f"Unknown subsampling method: {pool_subsampling}")

    indices_pool_j = jnp.asarray(indices_pool)
    indices_target_j = jnp.asarray(indices_target)

    selected_indices: list = []
    epig_scores: list = []

    A_img = jnp.asarray(A_img)
    B_img = jnp.asarray(B_img)

    for i in range(budget):
        pool_sub = pool_features[indices_pool_j]
        targ_sub = target_features[indices_target_j]

        logits_pool = head(pool_sub, label_features)
        logits_targ = head(targ_sub, label_features)

        epig = epig_from_logits_using_matmul(
            logits_pool, logits_targ,
            num_samples=num_samples, chunk_size=chunk_size, seed=seed + i,
            mesh=mesh,
        )
        order = np.asarray(jnp.argsort(epig))[::-1]
        best = None
        for idx in order:
            if int(indices_pool[idx]) in selected_indices:
                continue
            best = int(idx)
            break
        if best is None:
            raise ValueError(
                f"EPIG pool exhausted at step {i}/{budget}: all "
                f"{len(order)} subsampled candidates are already selected "
                f"(budget too large for the pool subsample)."
            )

        best_activation = pool_sub.activations[best][None]
        best_residual = pool_sub.residuals[best][None]
        best_class_id = jnp.asarray([int(np.asarray(pool_class_ids)[indices_pool[best]])])
        best_pool_embed = pool_sub.embeds[best][None]

        selected_indices.append(int(indices_pool[best]))
        epig_scores.append(float(epig[best]))

        # --- SGD step on projection weight (ref:bayesvlm/epig.py:209-231) ---
        kernel = _epig_sgd_step(
            kernel, bias, best_activation, best_residual, best_class_id,
            label_features,
            head.source_covariance.A_inv, jnp.diagonal(head.source_covariance.B_inv),
            head.target_covariance.A_inv, jnp.diagonal(head.target_covariance.B_inv),
            head.logit_scale, lr, proj_has_bias,
        )

        # --- refresh pool/target embeds (ref:bayesvlm/epig.py:233-235) ---
        pool_features = update_embeddings(kernel, bias, pool_features)
        target_features = update_embeddings(kernel, bias, target_features)

        # --- online Hessian update (ref:bayesvlm/epig.py:237-255) ---
        # DIVERGENCE (latent reference bug FIXED here): the reference's
        # `A_new = a @ a.T` on a 1-D activation is a scalar dot product
        # (torch 1-D matmul), silently broadcast into A_img — the rank-1
        # activation outer product was clearly intended. We compute the
        # outer product; for biased projections (SigLIP) the activation is
        # extended with the bias-column 1 so A_new matches A_img's
        # [P+1, P+1] shape (the reference's scalar form only "worked"
        # because a scalar broadcasts over any shape).
        act = best_activation[0]
        if proj_has_bias:
            act = jnp.concatenate([act, jnp.ones_like(act[:1])])
        A_new = jnp.outer(act, act)
        # Reference parity: B_new uses the InfoNCE GGN even for sigmoid
        # (SigLIP) heads — ref:bayesvlm/epig.py:242-246 calls
        # compute_hessian_analytic_InfoNCE unconditionally.
        B_new = hessian_infonce(best_pool_embed, label_features.embeds, head.logit_scale)
        n = hessian_n0 + i
        s0, s1 = jnp.sqrt(jnp.float32(n)), jnp.sqrt(jnp.float32(n + 1))
        A_img = (s0 * A_img + A_new * hessian_update_scale) / s1
        B_img = (s0 * B_img + B_new * hessian_update_scale) / s1

        # --- lambda re-opt, 20 steps (ref:bayesvlm/epig.py:257-268) ---
        lmbda = optimize_prior_precision(
            projection_l2_norm=projection_l2,
            projection_num_params=projection_num_params,
            A=A_img, B=B_img,
            lmbda_init=cov_info["lambda_img"], n=cov_info["n_img"],
            lr=1e-3, num_steps=20,
        )
        cov_info["lambda_img"] = float(lmbda)

        cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, cov_info)
        head = head.set_covariances(cov_img, cov_txt)

    return selected_indices, epig_scores
