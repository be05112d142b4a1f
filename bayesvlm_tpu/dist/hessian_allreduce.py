"""Sharded K-FAC factor accumulation: shard the source-batch axis over the
`data` mesh axis, compute per-shard partial statistics with the GEMM
reformulation, and `psum` the [C]-weight vector and [D, D] partials over
ICI. The [C, D] target matrix is replicated (it is the contrastive "class
batch" — 32768 x 1024 fp32 = 128 MB, well within HBM).

This is the SPMD replacement for the reference's single-GPU inner loop
(ref:scripts/hessian_estimation.py:62-104); no counterpart exists upstream.

The jitted SPMD programs are built once per (mesh, axis, options) key and
cached: `kfac_ggn` calls these helpers once per class batch, and a fresh
closure per call would defeat jit's cache and re-trace (and, absent the
persistent compilation cache, re-compile) every batch.

`precision`, `block_size`, and `chunk_j` mirror the single-device options
on bayesvlm_tpu.bayes.hessians: `precision` selects the GEMM passes
('highest' fp32 parity default / 'high' bf16x3), `block_size` scans the
per-shard source rows in blocks to bound the [block, C] logits buffers
(a [B/n_dev, 32768] fp32 buffer is still ~0.5 GB at the default workload),
and `chunk_j` bounds the SigLIP target axis the same way.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bayesvlm_tpu.bayes.hessians import (
    _assemble_factor,
    _infonce_block_stats,
    _siglip_block_stats,
    _l2_normalize,
    _zeros_matching_vma,
)

Array = jax.Array


def _pad_rows(x: np.ndarray, multiple: int):
    B = x.shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return x, np.ones(B, np.float32)
    mask = np.concatenate([np.ones(B, np.float32), np.zeros(pad, np.float32)])
    x = np.concatenate([x, np.ones((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, mask


def _as_global(x, mesh: Mesh, spec: P):
    """Build a jax Array laid out as `spec` over `mesh`.

    Single-process meshes: plain device-less asarray (jit places it).
    Multi-process meshes (global-batch mode): every host holds the
    identical full host array; make_array_from_callback hands each
    addressable shard its slice, producing a true global array whose psum
    crosses hosts (ICI within a slice, DCN across).
    """
    x = np.asarray(x)
    if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
        return jnp.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def _blocked_stats(stats_fn, row_arrays, block_size, out_shapes):
    """Scan `stats_fn` over row blocks of the per-shard arrays, summing the
    (w, G) partials — the per-shard analogue of the block scan in
    hessians._hessian_*_jit, bounding the [block, C] intermediates."""
    B = row_arrays[0].shape[0]
    if block_size is None or block_size >= B:
        return stats_fn(*row_arrays)
    n_full = B // block_size
    blocks = tuple(
        a[: n_full * block_size].reshape((n_full, block_size) + a.shape[1:])
        for a in row_arrays
    )

    def body(carry, blk):
        w, G = stats_fn(*blk)
        return (carry[0] + w, carry[1] + G), None

    # carries must match the body output's varying-manual-axes type
    # (the partial stats are varying over the mesh axis under shard_map)
    init = tuple(_zeros_matching_vma(s, row_arrays[0]) for s in out_shapes)
    (w, G), _ = jax.lax.scan(body, init, blocks)
    if n_full * block_size < B:
        rest = tuple(a[n_full * block_size :] for a in row_arrays)
        w_r, G_r = stats_fn(*rest)
        w, G = w + w_r, G + G_r
    return w, G


@lru_cache(maxsize=None)
def _infonce_program(mesh: Mesh, axis: str, block_size, precision: str):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(axis)),
        out_specs=P(),
    )
    def _shard_fn(src_shard, Y_rep, s, mask_shard):
        def stats(src_blk, mask_blk):
            return _infonce_block_stats(
                src_blk, Y_rep, s, row_mask=mask_blk, precision=precision
            )

        D = Y_rep.shape[1]
        w, G = _blocked_stats(
            stats, (src_shard, mask_shard), block_size,
            ((Y_rep.shape[0],), (D, D)),
        )
        w = jax.lax.psum(w, axis)
        G = jax.lax.psum(G, axis)
        return _assemble_factor(w, G, Y_rep)

    return jax.jit(_shard_fn)


def sharded_hessian_infonce(
    source_embeds,
    target_embeds,
    logit_scale,
    mesh: Mesh,
    axis: str = "data",
    block_size: Optional[int] = None,
    precision: str = "highest",
) -> Array:
    """Multi-chip InfoNCE GGN: returns the replicated [D, D] Hessian."""
    n_dev = mesh.shape[axis]
    src, mask = _pad_rows(np.asarray(source_embeds, np.float32), n_dev)
    Y, _ = _l2_normalize(jnp.asarray(target_embeds, jnp.float32))
    scale = jnp.asarray(logit_scale, jnp.float32)

    return _infonce_program(mesh, axis, block_size, precision)(
        _as_global(src, mesh, P(axis, None)),
        _as_global(Y, mesh, P()),
        scale,
        _as_global(mask, mesh, P(axis)),
    )


@lru_cache(maxsize=None)
def _siglip_program(mesh: Mesh, axis: str, block_size, chunk_j, precision: str):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P(), P(axis)),
        out_specs=P(),
    )
    def _shard_fn(x_shard, idx_shard, Yn_rep, s_, b_, mask_shard):
        def stats(x_blk, idx_blk, mask_blk):
            return _siglip_block_stats(
                x_blk, idx_blk, Yn_rep, s_, b_, row_mask=mask_blk,
                chunk_j=chunk_j, precision=precision,
            )

        D = Yn_rep.shape[1]
        w, G = _blocked_stats(
            stats, (x_shard, idx_shard, mask_shard), block_size,
            ((Yn_rep.shape[0],), (D, D)),
        )
        w = jax.lax.psum(w, axis)
        G = jax.lax.psum(G, axis)
        return _assemble_factor(w, G, Yn_rep)

    return jax.jit(_shard_fn)


def sharded_hessian_siglip(
    x_batch,
    indices_batch,
    y,
    logit_scale,
    logit_bias,
    mesh: Mesh,
    axis: str = "data",
    block_size: Optional[int] = None,
    chunk_j: Optional[int] = None,
    precision: str = "highest",
) -> Array:
    n_dev = mesh.shape[axis]
    x, mask = _pad_rows(np.asarray(x_batch, np.float32), n_dev)
    idx = np.asarray(indices_batch, np.int32)
    pad = x.shape[0] - idx.shape[0]
    if pad:
        idx = np.concatenate([idx, np.zeros(pad, np.int32)])
    Yn, _ = _l2_normalize(jnp.asarray(y, jnp.float32))
    s = jnp.asarray(logit_scale, jnp.float32)
    b = jnp.asarray(logit_bias, jnp.float32)

    return _siglip_program(mesh, axis, block_size, chunk_j, precision)(
        _as_global(x, mesh, P(axis, None)),
        _as_global(idx, mesh, P(axis)),
        _as_global(Yn, mesh, P()),
        s, b,
        _as_global(mask, mesh, P(axis)),
    )


@lru_cache(maxsize=None)
def _gram_program(mesh: Mesh, axis: str, append_bias_column: bool):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(),
    )
    def _shard_fn(a_shard, mask_shard):
        a_masked = a_shard * mask_shard[:, None]
        if append_bias_column:
            ones = mask_shard[:, None]
            a_masked = jnp.concatenate([a_masked, ones], axis=-1)
        with jax.default_matmul_precision("highest"):
            partial_gram = a_masked.T @ a_masked
        return jax.lax.psum(partial_gram, axis)

    return jax.jit(_shard_fn)


def sharded_activation_gram(
    activations,
    mesh: Mesh,
    append_bias_column: bool = False,
    axis: str = "data",
) -> Array:
    """Batch-sharded activations^T @ activations with psum over ICI."""
    n_dev = mesh.shape[axis]
    a, mask = _pad_rows(np.asarray(activations, np.float32), n_dev)

    return _gram_program(mesh, axis, append_bias_column)(
        _as_global(a, mesh, P(axis, None)), _as_global(mask, mesh, P(axis))
    )
