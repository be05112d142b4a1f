"""Uncertainty scores and top-k selection strategies
(ref:bayesvlm/selection.py).

Score variants:
  entropy variants (ref:selection.py:7-26):
    map_alea   H[softmax(mean)]
    exp_alea   E_theta[H[softmax(sample)]]            (MC)
    comb       H[probit softmax]                      (num_samples=0)
    comb_covar H[MC-average softmax]
  complexity variants (ref:selection.py:28-50):
    var              trace of the per-sample covariance
    logdet           logdet of full covariance
    entropy          one of the entropy variants
    exp_mutual_info  BALD: H_total - E[H_alea]
    map_mutual_info  H_total - H[softmax(mean)]

All dense math is jitted; only the final top-k indices come to host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.types import ProbabilisticLogits
from bayesvlm_tpu.ops import topk_exact

Array = jax.Array


def _plain_entropy(probs: Array) -> Array:
    logp = jnp.log(probs)
    return -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0), axis=-1)


def entropy_score(
    prob_logits: ProbabilisticLogits,
    variant: str,
    num_samples: int = 1000,
    seed: Optional[int] = None,
    chunk_size: Optional[int] = 10_000,
) -> Array:
    """ref:bayesvlm/selection.py:7-26. `chunk_size` bounds the full-
    covariance MC sample buffers (ref:bayesvlm/vlm.py:87-103 chunking)."""
    if variant == "exp_alea":
        return prob_logits.expected_aleatoric_entropy(
            num_samples=num_samples, seed=seed, chunk_size=chunk_size
        )
    if variant == "map_alea":
        probas = jax.nn.softmax(prob_logits.mean, axis=-1)
    elif variant == "comb":
        probas = prob_logits.softmax(num_samples=0, seed=seed)
    elif variant == "comb_covar":
        probas = prob_logits.softmax(
            num_samples=num_samples, seed=seed, chunk_size=chunk_size
        )
    else:
        raise ValueError(f"unknown entropy variant {variant}")
    return _plain_entropy(probas)


def complexity_score(
    prob_logits: ProbabilisticLogits,
    variant: str,
    entropy_variant: Optional[str] = None,
    seed: Optional[int] = None,
    num_samples: int = 1000,
    chunk_size: Optional[int] = 10_000,
) -> Array:
    """ref:bayesvlm/selection.py:28-50."""
    if variant == "var":
        return jnp.sum(prob_logits.diag_var, axis=-1)
    if variant == "logdet":
        return jnp.linalg.slogdet(prob_logits.var)[1]
    if variant == "entropy":
        return entropy_score(prob_logits, entropy_variant, seed=seed,
                             num_samples=num_samples, chunk_size=chunk_size)
    if variant == "exp_mutual_info":
        total = entropy_score(prob_logits, "comb_covar", seed=seed,
                              num_samples=num_samples, chunk_size=chunk_size)
        alea = entropy_score(prob_logits, "exp_alea", seed=seed,
                             num_samples=num_samples, chunk_size=chunk_size)
        return total - alea
    if variant == "map_mutual_info":
        total = entropy_score(prob_logits, "comb_covar", seed=seed,
                              num_samples=num_samples, chunk_size=chunk_size)
        alea = entropy_score(prob_logits, "map_alea", seed=seed,
                             num_samples=num_samples, chunk_size=chunk_size)
        return total - alea
    raise ValueError(f"unknown complexity variant {variant}")


def select_topk(
    prob_logits: ProbabilisticLogits,
    k: int,
    variant: str,
    entropy_variant: Optional[str] = None,
    ignore_percentage: float = 0.0,
    return_values: bool = False,
    seed: Optional[int] = None,
    chunk_size: Optional[int] = 10_000,
):
    """Top-k by complexity with optional head-offset
    (ref:bayesvlm/selection.py:52-75)."""
    N = prob_logits.mean.shape[0]
    offset = int(N * ignore_percentage) if ignore_percentage > 0 else 0
    n = min(k + offset, N)
    complexity = complexity_score(prob_logits, variant, entropy_variant,
                                  seed=seed, chunk_size=chunk_size)
    values, indices = topk_exact(complexity, n)
    if return_values:
        return indices[offset:], values[offset:]
    return indices[offset:]


def select_topk_classbalanced(
    prob_logits: ProbabilisticLogits,
    class_ids: Array,
    k: int,
    variant: str,
    entropy_variant: Optional[str] = None,
):
    """Per-class quota top-k (ref:bayesvlm/selection.py:77-102). The
    class-mask loop is host-side (ragged classes)."""
    class_ids = np.asarray(class_ids)
    classes = np.unique(class_ids)
    per = k // len(classes)
    residuals = k % len(classes)

    out = []
    for i, c in enumerate(classes):
        n = per + (1 if i < residuals else 0)
        if n == 0:
            continue
        mask = class_ids == c
        sub = prob_logits[jnp.asarray(np.nonzero(mask)[0])]
        if variant == "var":
            # diag_var (not raw var): full-covariance [n, C, C] logits
            # would otherwise produce a [n, C] score matrix that topk_exact
            # + the global-index remap below turn into garbage indices
            # (complexity_score's 'var' variant already goes through
            # diag_var; for diagonal [n, C] var the two are identical).
            score = jnp.sum(sub.diag_var, axis=1)
        else:
            score = entropy_score(sub, entropy_variant)
        _, idx = topk_exact(score, min(n, score.shape[0]))
        # DIVERGENCE (latent reference bug FIXED here): the reference
        # returns within-class-LOCAL positions (ref:bayesvlm/selection.py:
        # 96-102 appends topk indices taken inside the class mask), which
        # are meaningless as dataset indices downstream. We map them back
        # to GLOBAL dataset indices. Documented + tested in
        # tests/test_reference_parity_selection.py.
        out.append(np.nonzero(mask)[0][np.asarray(idx)])
    return jnp.asarray(np.concatenate(out))


def select_topk_randomized(
    prob_logits: ProbabilisticLogits,
    k: int,
    temp: float,
    variant: str,
    entropy_variant: Optional[str] = None,
    seed: int = 0,
):
    """Softmax(z-scored score * temp) categorical sampling with replacement
    (ref:bayesvlm/selection.py:104-120)."""
    complexity = complexity_score(prob_logits, variant, entropy_variant)
    z = (complexity - jnp.mean(complexity)) / jnp.std(complexity)
    logits = z * temp
    key = jax.random.key(seed)
    return jax.random.categorical(key, logits, shape=(k,))


def select_random(prob_logits: ProbabilisticLogits, k: int, seed: Optional[int]):
    """Seeded random permutation prefix (ref:bayesvlm/selection.py:143-147)."""
    N = prob_logits.var.shape[0]
    key = jax.random.key(0 if seed is None else seed)
    return jax.random.permutation(key, N)[:k]


def select_random_classbalanced(class_ids: Array, k: int, seed: int):
    """ref:bayesvlm/selection.py:124-140."""
    class_ids = np.asarray(class_ids)
    classes = np.unique(class_ids)
    per = k // len(classes)
    residuals = k % len(classes)
    key = jax.random.key(seed)
    out = []
    for i, c in enumerate(classes):
        n = per + (1 if i < residuals else 0)
        idx = np.nonzero(class_ids == c)[0]
        key, sub = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(sub, len(idx)))[:n]
        out.append(idx[perm])
    return jnp.asarray(np.concatenate(out))


def create_subset_json(
    prob_logits: ProbabilisticLogits,
    class_ids: Array,
    k: int,
) -> dict:
    """Batch-generate all strategy subsets (ref:bayesvlm/selection.py:150-174)."""
    d = {
        "topk_var": np.asarray(select_topk(prob_logits, k, variant="var")).tolist(),
        "topk_entropy_alea": np.asarray(
            select_topk(prob_logits, k, variant="entropy", entropy_variant="map_alea")
        ).tolist(),
        "topk_entropy_comb": np.asarray(
            select_topk(prob_logits, k, variant="entropy", entropy_variant="comb")
        ).tolist(),
        "topk_entropy_comb_covar": np.asarray(
            select_topk(prob_logits, k, variant="entropy", entropy_variant="comb_covar")
        ).tolist(),
    }
    for i in range(3):
        d[f"topk_randomized_var_{i}"] = np.asarray(
            select_topk_randomized(prob_logits, k, temp=1.0, variant="var", seed=i)
        ).tolist()
        d[f"topk_randomized_entropy_alea_{i}"] = np.asarray(
            select_topk_randomized(
                prob_logits, k, temp=1.0, variant="entropy",
                entropy_variant="map_alea", seed=i,
            )
        ).tolist()
        d[f"topk_randomized_entropy_comb_{i}"] = np.asarray(
            select_topk_randomized(
                prob_logits, k, temp=1.0, variant="entropy",
                entropy_variant="comb", seed=i,
            )
        ).tolist()
        d[f"topk_randomized_entropy_comb_covar_{i}"] = np.asarray(
            select_topk_randomized(
                prob_logits, k, temp=1.0, variant="entropy",
                entropy_variant="comb_covar", seed=i,
            )
        ).tolist()
        d[f"random_{i}"] = np.asarray(select_random(prob_logits, k, seed=i)).tolist()
    return d
