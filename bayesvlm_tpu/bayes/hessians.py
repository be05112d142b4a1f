"""Analytic GGN Hessians of the contrastive losses, reformulated for the MXU.

The reference computes, per source sample b (ref:bayesvlm/hessians.py:10-48):

    H = sum_b  J_norm_b (J_diag_b - J_pp_b) J_norm_b^T * exp(2s)

materializing [B, D, D] intermediates (J_diag via a batched [C,D]x[C,D]
product per sample). That is O(B*C*D^2) FLOPs and O(B*D^2) memory — it is why
the reference processes 5 samples at a time on an A100.

TPU-native reformulation (exact, same math): with u_b = x_b/||x_b||,
r_b = ||x_b||, the normalization Jacobian is J_norm_b = (I - u_b u_b^T)/r_b,
and for any symmetric M_b:

    J_norm M J_norm = (M - u v^T - v u^T + (u^T v) u u^T) / r^2,  v = M u.

Both losses have M_b = Y^T diag(c_b) Y (- q_b q_b^T for InfoNCE), so every
sum over b collapses into weighted Gram GEMMs:

    sum_b Y^T diag(c_b) Y / r_b^2        = Y^T diag(sum_b c_b / r_b^2) Y
    sum_b q_b q_b^T / r_b^2              = Qbar^T Qbar        (Qbar rows q_b/r_b)
    sum_b (u v^T + v u^T - s u u^T)/r^2  = Ubar^T Vbar + Vbar^T Ubar
                                           - Ubar^T diag(s_b) Ubar

with v_b = Y^T (c_b * z_b) (- q_b (p_b^T z_b)), z_b = Y u_b, s_b = u_b^T v_b.
Everything is a [B,C]x[C,D] or [D,B]x[B,D] GEMM: O(B*C*D) FLOPs, no [B,D,D]
tensor ever exists. For the default workload (B=C=32768, D=512) this is
~170x fewer FLOPs than the reference loop and maps 1:1 onto the MXU.

Multi-chip: shard the source-batch axis; each chip computes its partial
[D,D] terms and the [C] weight vector; `psum` over the data axis yields the
global factors (see bayesvlm_tpu.dist).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _zeros_matching_vma(shape, ref: Array) -> Array:
    """fp32 zeros whose varying-manual-axes type matches `ref`.

    Scan carries must type-match the body output; inside shard_map the
    partial statistics are varying over the mesh axis while a plain
    jnp.zeros is unvarying, so the init must be pcast to varying. Outside
    shard_map the vma set is empty and this is exactly jnp.zeros.
    """
    z = jnp.zeros(shape, jnp.float32)
    axes = tuple(getattr(jax.typeof(ref), "vma", ()) or ())
    if axes:
        z = jax.lax.pcast(z, axes, to="varying")
    return z


def _assemble_factor(w: Array, G: Array, Y: Array) -> Array:
    """Final [D, D] factor Y^T diag(w) Y + G.

    Computed as a sqrt-weighted Gram (w >= 0 for both losses): in
    Y^T @ (w*Y) the (i,j) entry rounds Y[c,i]*fl(w_c*Y[c,j]) while (j,i)
    rounds Y[c,j]*fl(w_c*Y[c,i]) — a ~1-ulp/term skew that accumulates to
    ~1e-4 absolute asymmetry over 10^5-sample runs at exp(2s) scaling.
    (sqrt(w)*Y)^T (sqrt(w)*Y) has identical per-term products for (i,j)
    and (j,i), so the output is symmetric to the last ulp.
    """
    with jax.default_matmul_precision("highest"):
        Yw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None] * Y
        H = Yw.T @ Yw + G
        # G's cross terms (U^T V + V^T U) are two separate GEMMs whose
        # reduction tilings may differ by ~1 ulp; the GGN is symmetric by
        # definition, so project out the rounding skew exactly.
        return 0.5 * (H + H.T)


def _l2_normalize(x: Array, axis: int = -1, keepdims: bool = False):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    normalized = x / norm
    if not keepdims:
        norm = jnp.squeeze(norm, axis=axis)
    return normalized, norm


@partial(jax.jit, static_argnames=("precision",))
def _infonce_block_stats(
    source_embeds: Array,  # [B, D]
    Y: Array,              # [C, D] normalized targets
    logit_scale: Array,
    row_mask: Optional[Array] = None,  # [B] 1.0 valid / 0.0 padded
    precision: str = "highest",
):
    """Per-block partial sums for the InfoNCE GGN.

    Returns (w [C], G [D,D]) such that the block's Hessian contribution is
    Y^T diag(w) Y + G (exp(2s) factor included). Matmul precision defaults
    to fp32 ('highest'): Hessian factors accumulate over 10^5+ samples and
    TPU-default bf16 passes would bias the Gram sums. precision='high'
    (bf16x3 passes) is 1.6x faster with measured 1.7e-5 max relative error
    vs fp64 (BASELINE.md round 2) — safe for the lambda-regularized
    downstream, opt-in. `row_mask` zeroes the contribution of padded rows
    (sharded accumulation pads B to the device count).
    """
    with jax.default_matmul_precision(precision):
        scale = jnp.exp(logit_scale)
        if row_mask is not None:
            # keep padded rows finite under 1/||x||, then zero their weight
            safe = row_mask[:, None] > 0
            source_embeds = jnp.where(safe, source_embeds, 1.0)
        U, r = _l2_normalize(source_embeds)      # [B, D], [B]
        inv_r = 1.0 / r
        if row_mask is not None:
            inv_r = inv_r * row_mask
        inv_r2 = inv_r * inv_r

        Z = U @ Y.T                               # [B, C] cosine sims
        P = jax.nn.softmax(Z * scale, axis=-1)    # [B, C]

        # w = sum_b p_b / r_b^2 -> Y^T diag(w) Y term (computed by caller)
        w = P.T @ inv_r2                          # [C]

        Q = P @ Y                                 # [B, D]   q_b = Y^T p_b
        PZ = P * Z                                # [B, C]
        T = PZ @ Y                                # [B, D]   Y^T (p*z)
        pz_dot = jnp.sum(PZ, axis=-1)             # [B]      p^T z  (= q^T u)
        V = T - Q * pz_dot[:, None]               # [B, D]   v_b
        s = jnp.sum(PZ * Z, axis=-1) - pz_dot**2  # [B]      u^T v

        Ub = U * inv_r[:, None]                   # rows u_b / r_b
        Vb = V * inv_r[:, None]
        Qb = Q * inv_r[:, None]

        # s_b = Var_{p_b}(z_b) >= 0 exactly; clamp fp rounding of
        # E[z^2]-E[z]^2 so the sqrt-weighted Gram below is well defined.
        # Computing the diag-weighted term as (sqrt(s)*U)^T (sqrt(s)*U)
        # instead of (s*U)^T U makes the per-term products identical for
        # the (i,j) and (j,i) entries, so the GEMM output is symmetric to
        # the last ulp — the asymmetric form accumulates ~1-ulp/term skew
        # that reaches ~1e-4 absolute after 10^5-sample accumulation at
        # exp(2s) scaling.
        Us = Ub * jnp.sqrt(jnp.maximum(s, 0.0))[:, None]
        G = -(Qb.T @ Qb) - (Ub.T @ Vb) - (Vb.T @ Ub) + Us.T @ Us
        return w * scale**2, G * scale**2


@partial(jax.jit, static_argnames=("block_size", "precision"))
def _hessian_infonce_jit(
    source_embeds: Array,
    target_embeds: Array,
    logit_scale: Array,
    block_size: Optional[int],
    precision: str,
) -> Array:
    Y, _ = _l2_normalize(target_embeds)
    B = source_embeds.shape[0]
    if block_size is None or block_size >= B:
        w, G = _infonce_block_stats(
            source_embeds, Y, logit_scale, precision=precision
        )
    else:
        n_full = B // block_size
        blocks = source_embeds[: n_full * block_size].reshape(
            n_full, block_size, -1
        )

        def body(carry, blk):
            w_acc, G_acc = carry
            w, G = _infonce_block_stats(blk, Y, logit_scale, precision=precision)
            return (w_acc + w, G_acc + G), None

        init = (
            jnp.zeros(Y.shape[0], jnp.float32),
            jnp.zeros((Y.shape[1], Y.shape[1]), jnp.float32),
        )
        (w, G), _ = jax.lax.scan(body, init, blocks)
        if n_full * block_size < B:
            w_r, G_r = _infonce_block_stats(
                source_embeds[n_full * block_size :], Y, logit_scale,
                precision=precision,
            )
            w = w + w_r
            G = G + G_r

    return _assemble_factor(w, G, Y)


def hessian_infonce(
    source_embeds: Array,
    target_embeds: Array,
    logit_scale: Array,
    block_size: Optional[int] = None,
    precision: str = "highest",
) -> Array:
    """GGN of -log softmax_C(sim * e^s) wrt the source embeddings, summed
    over the batch. Exact reformulation of ref:bayesvlm/hessians.py:10-48,
    fully jitted end-to-end (block scan + factor assembly in one XLA
    program — measured 2.3x over the per-block-dispatch structure,
    BASELINE.md round 2).

    Args:
      source_embeds: [B, D]
      target_embeds: [C, D] (the contrastive "classes")
      logit_scale:   scalar log-temperature
      block_size:    optional chunking of B to bound the [B, C] intermediates.
      precision:     'highest' (fp32 GEMMs, parity default) or 'high'
                     (bf16x3: 1.6x faster, 1.7e-5 max rel error vs fp64).

    Returns: [D, D]
    """
    return _hessian_infonce_jit(
        jnp.asarray(source_embeds, jnp.float32),
        jnp.asarray(target_embeds, jnp.float32),
        jnp.asarray(logit_scale, jnp.float32),
        block_size,
        precision,
    )


@partial(jax.jit, static_argnames=("chunk_j", "precision"))
def _siglip_block_stats(
    x_block: Array,        # [B, D] source embeds
    diag_idx: Array,       # [B] int — index j for which label is +1
    Yn: Array,             # [N, D] normalized targets
    logit_scale: Array,
    logit_bias: Array,
    row_mask: Optional[Array] = None,
    chunk_j: Optional[int] = None,
    precision: str = "highest",
):
    """Per-block partial sums for the SigLIP GGN.

    `chunk_j` optionally scans the target axis in chunks of that size,
    bounding the [B, N] logits buffers to [B, chunk_j] — the TPU analogue
    of the reference's chunk-over-j loop (ref:bayesvlm/hessians.py:98-115),
    wired to the CLI's --siglip_chunk_size. Results are chunking-invariant
    (the statistics are plain sums over j).
    """
    with jax.default_matmul_precision(precision):
        return _siglip_block_stats_body(
            x_block, diag_idx, Yn, logit_scale, logit_bias, row_mask, chunk_j
        )


def _siglip_block_stats_body(
    x_block, diag_idx, Yn, logit_scale, logit_bias, row_mask, chunk_j
):
    # body of _siglip_block_stats, factored out so the matmul-precision
    # scope above is a real `with` (the previous manual __enter__/__exit__
    # leaked the global precision if tracing raised mid-body)
    scale = jnp.exp(logit_scale)
    if row_mask is not None:
        safe = row_mask[:, None] > 0
        x_block = jnp.where(safe, x_block, 1.0)
    U, r = _l2_normalize(x_block)
    inv_r = 1.0 / r
    if row_mask is not None:
        inv_r = inv_r * row_mask
    inv_r2 = inv_r * inv_r

    B = x_block.shape[0]
    N = Yn.shape[0]

    def _stats_for(Y_c: Array, col: Array, col_valid: Optional[Array]):
        # Y_c: [n, D] target chunk; col: [n] global column ids.
        Z = U @ Y_c.T                              # [B, n] cosine sims
        logits = Z * scale + logit_bias
        labels = jnp.where(col[None, :] == diag_idx[:, None], 1.0, -1.0)
        sig = jax.nn.sigmoid(logits * labels)
        C = (scale**2) * sig * (1.0 - sig)         # [B, n] per-pair weights
        if col_valid is not None:
            C = C * col_valid[None, :]
        w_c = C.T @ inv_r2                         # [n]
        CZ = C * Z
        V_c = CZ @ Y_c                             # [B, D] partial v_b
        s_c = jnp.sum(CZ * Z, axis=-1)             # [B]    partial u^T v
        return w_c, V_c, s_c

    if chunk_j is None or chunk_j >= N:
        cols = jax.lax.iota(jnp.int32, N)
        w, V, s = _stats_for(Yn, cols, None)
    else:
        pad = (-N) % chunk_j
        Yp = jnp.pad(Yn, ((0, pad), (0, 0)))
        valid = jnp.pad(jnp.ones(N, jnp.float32), (0, pad))
        n_chunks = Yp.shape[0] // chunk_j
        Yp = Yp.reshape(n_chunks, chunk_j, -1)
        validp = valid.reshape(n_chunks, chunk_j)
        base = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_j
        local = jax.lax.iota(jnp.int32, chunk_j)

        def body(carry, inp):
            V_acc, s_acc = carry
            Y_c, v_c, b0 = inp
            w_c, V_c, s_c = _stats_for(Y_c, b0 + local, v_c)
            return (V_acc + V_c, s_acc + s_c), w_c

        init = (
            _zeros_matching_vma((B, Yn.shape[1]), x_block),
            _zeros_matching_vma((B,), x_block),
        )
        (V, s), w_stack = jax.lax.scan(body, init, (Yp, validp, base))
        w = w_stack.reshape(-1)[:N]

    Ub = U * inv_r[:, None]
    Vb = V * inv_r[:, None]
    # s_b = sum_j c_j z_j^2 >= 0 (c is a sigmoid product); sqrt-weighted
    # Gram keeps the GEMM exactly symmetric (see _infonce_block_stats).
    Us = Ub * jnp.sqrt(jnp.maximum(s, 0.0))[:, None]
    G = -(Ub.T @ Vb) - (Vb.T @ Ub) + Us.T @ Us
    return w, G


@partial(jax.jit, static_argnames=("block_size", "chunk_size_j", "precision"))
def _hessian_siglip_jit(
    x_batch: Array,
    indices_batch: Array,
    y: Array,
    logit_scale: Array,
    logit_bias: Array,
    block_size: Optional[int],
    chunk_size_j: Optional[int],
    precision: str,
) -> Array:
    """GGN of the SigLIP sigmoid loss wrt the source embeddings, summed over
    the batch. Exact reformulation of ref:bayesvlm/hessians.py:50-117.

    `indices_batch[b]` gives the row of the [N,N] label matrix (2I - 1) used
    for sample b (ref:bayesvlm/hessians.py:89-90). The reference chunks the
    target axis at `chunk_size_j` to bound its [B, D, D] intermediates; here
    no such intermediate exists, but `chunk_size_j` still bounds the [B, N]
    logits buffers (results are chunking-invariant). `block_size` chunks the
    source axis the same way.
    """
    Yn, _ = _l2_normalize(y)
    B = x_batch.shape[0]
    if block_size is None or block_size >= B:
        w, G = _siglip_block_stats(
            x_batch, indices_batch, Yn, logit_scale, logit_bias,
            chunk_j=chunk_size_j, precision=precision,
        )
    else:
        n_full = B // block_size
        xb = x_batch[: n_full * block_size].reshape(n_full, block_size, -1)
        ib = indices_batch[: n_full * block_size].reshape(n_full, block_size)

        def body(carry, blk):
            w_acc, G_acc = carry
            x_blk, i_blk = blk
            w, G = _siglip_block_stats(
                x_blk, i_blk, Yn, logit_scale, logit_bias,
                chunk_j=chunk_size_j, precision=precision,
            )
            return (w_acc + w, G_acc + G), None

        init = (
            jnp.zeros(Yn.shape[0], jnp.float32),
            jnp.zeros((Yn.shape[1], Yn.shape[1]), jnp.float32),
        )
        (w, G), _ = jax.lax.scan(body, init, (xb, ib))
        if n_full * block_size < B:
            w_r, G_r = _siglip_block_stats(
                x_batch[n_full * block_size :],
                indices_batch[n_full * block_size :],
                Yn, logit_scale, logit_bias,
                chunk_j=chunk_size_j, precision=precision,
            )
            w = w + w_r
            G = G + G_r

    return _assemble_factor(w, G, Yn)


def hessian_siglip(
    x_batch: Array,
    indices_batch: Array,
    y: Array,
    logit_scale: Array,
    logit_bias: Array,
    block_size: Optional[int] = None,
    chunk_size_j: Optional[int] = None,
    precision: str = "highest",
) -> Array:
    """Public entry for the SigLIP GGN (docstring semantics on
    _hessian_siglip_jit); fully jitted end-to-end. precision as in
    hessian_infonce."""
    return _hessian_siglip_jit(
        jnp.asarray(x_batch, jnp.float32),
        jnp.asarray(indices_batch, jnp.int32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(logit_scale, jnp.float32),
        jnp.asarray(logit_bias, jnp.float32),
        block_size,
        chunk_size_j,
        precision,
    )


@partial(jax.jit, static_argnames=("append_bias_column",))
@jax.default_matmul_precision("highest")
def activation_gram(activations: Array, append_bias_column: bool = False) -> Array:
    """A-factor partial sum: activations^T @ activations, with an optional
    appended ones column for biased projections
    (ref:scripts/hessian_estimation.py:100-104).
    """
    a = jnp.asarray(activations, jnp.float32)
    if append_bias_column:
        a = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=-1)
    return a.T @ a
