"""Expected Gradient Length acquisition — closed form, batched.

The reference computes EGL with one `autograd.grad` per (candidate, class)
pair — O(N*C) backward passes, its slowest path
(ref:scripts/activelearning_elg.py:319-491). For a linear projection the
gradient is rank-1 and has a closed form, so the whole score collapses into
a few batched contractions (SURVEY §7 step 6):

    e_i = W a_i (+ b) + res_i
    logits_i = e^s * Y_hat e_hat_i (+ logit_bias),  p_det = softmax(logits_i)
    dCE(c)/de_i = e^s * J_norm(e_i) (q_i - y_hat_c),  q_i = Y_hat^T p_det_i
    dCE(c)/dW   = (dCE/de_i) a_i^T   ->  ||dW|| = ||dCE/de_i|| * ||a_i||
    (+ bias term: ||grad|| = ||dCE/de_i|| * sqrt(||a_i||^2 + 1))

    EGL_i = sum_c p_probit_ic * ||grad_ic||

where p_probit are the *probabilistic* (probit) posterior predictive probs
(ref:scripts/activelearning_elg.py:392-393, ref:bayesvlm/vlm_elg.py:74-85)
while p_det comes from the deterministic logits used in the CE loss.

One jitted program; a [N, C, D] intermediate chunked over N.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits
from bayesvlm_tpu.ops import topk_exact

Array = jax.Array


@partial(jax.jit, static_argnames=("proj_has_bias",))
def _egl_chunk(
    embeds: Array,            # [B, D] candidate embeddings
    activations: Array,       # [B, P]
    probit_probs: Array,      # [B, C] posterior predictive weights
    Yn: Array,                # [C, D] normalized class embeddings
    logit_scale: Array,
    logit_bias: Array,
    proj_has_bias: bool,
) -> Array:
    scale = jnp.exp(logit_scale)
    r = jnp.linalg.norm(embeds, axis=-1, keepdims=True)          # [B, 1]
    U = embeds / r                                                # [B, D]

    logits = U @ Yn.T * scale + logit_bias                        # [B, C]
    p_det = jax.nn.softmax(logits, axis=-1)

    q = p_det @ Yn                                                # [B, D]
    # g_c = e^s J_norm (q - y_c); J_norm = (I - u u^T)/r
    # compute per-class through the projector without materializing J:
    # v_c = q - y_c ; Jv = (v - u (u.v)) / r
    # ||g_c||^2 = e^{2s} (||v||^2 - (u.v)^2) / r^2
    v_norm2 = (
        jnp.sum(q**2, -1)[:, None]
        - 2.0 * (q @ Yn.T)
        + jnp.sum(Yn**2, -1)[None, :]
    )                                                             # [B, C]
    uv = (U * q).sum(-1)[:, None] - U @ Yn.T                      # [B, C]
    g_norm = scale * jnp.sqrt(jnp.maximum(v_norm2 - uv**2, 0.0)) / r

    a_norm = jnp.linalg.norm(activations, axis=-1)                # [B]
    if proj_has_bias:
        a_norm = jnp.sqrt(a_norm**2 + 1.0)

    return jnp.sum(probit_probs * g_norm, axis=-1) * a_norm       # [B]


def expected_gradient_length(
    image_outputs: EncoderResult,
    text_outputs: EncoderResult,
    prob_logits: ProbabilisticLogits,
    logit_scale,
    logit_bias=0.0,
    proj_has_bias: bool = False,
    chunk_size: int = 8192,
    mesh="auto",
) -> Array:
    """EGL scores [N] for all candidates.

    `prob_logits` are the precomputed probabilistic logits of the
    candidates; the probit softmax of them provides the expectation weights
    (ref:scripts/activelearning_elg.py:392,461).

    EGL is per-candidate-row, so with a `mesh` each chunk is scored
    candidate-row-sharded over the data axis (text replicated, zero
    collectives — same shape of distribution as epig_from_probs_sharded;
    exact up to XLA reassociation at local shapes). "auto" = shard when
    more than one device is visible."""
    from bayesvlm_tpu.dist.mesh import resolve_auto_mesh

    Yn = text_outputs.embeds / jnp.linalg.norm(
        text_outputs.embeds, axis=-1, keepdims=True
    )
    probs = prob_logits.probit_softmax()
    s = jnp.asarray(logit_scale, jnp.float32)
    b = jnp.asarray(logit_bias, jnp.float32)
    mesh = resolve_auto_mesh(mesh)

    def score_rows_dense(emb, act, prb):
        return _egl_chunk(emb, act, prb, Yn, s, b, proj_has_bias)

    score_rows = score_rows_dense
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape["data"]

        def score_rows_sharded(emb, act, prb):
            n = emb.shape[0]
            pad = (-n) % n_dev
            if pad:
                emb = jnp.concatenate([emb, jnp.ones((pad,) + emb.shape[1:],
                                                     emb.dtype)])
                act = jnp.concatenate([act, jnp.ones((pad,) + act.shape[1:],
                                                     act.dtype)])
                prb = jnp.concatenate(
                    [prb, jnp.full((pad,) + prb.shape[1:],
                                   1.0 / prb.shape[-1], prb.dtype)])
            out = shard_map(
                score_rows_dense, mesh=mesh,
                in_specs=(P("data"), P("data"), P("data")),
                out_specs=P("data"), check_vma=False,
            )(emb, act, prb)
            return out[:n]

        score_rows = score_rows_sharded

    N = len(image_outputs)
    out = []
    for start in range(0, N, chunk_size):
        sl = slice(start, min(start + chunk_size, N))
        out.append(
            score_rows(
                image_outputs.embeds[sl],
                image_outputs.activations[sl],
                probs[sl],
            )
        )
    return jnp.concatenate(out, axis=0)


def select_egl(
    image_outputs: EncoderResult,
    text_outputs: EncoderResult,
    prob_logits: ProbabilisticLogits,
    k: int,
    logit_scale,
    logit_bias=0.0,
    proj_has_bias: bool = False,
):
    """Top-k by EGL (ref:scripts/activelearning_elg.py:474-491 tail)."""
    scores = expected_gradient_length(
        image_outputs, text_outputs, prob_logits,
        logit_scale, logit_bias, proj_has_bias,
    )
    values, indices = topk_exact(scores, k)
    return indices, values
