"""K-FAC GGN estimation driver (ref:scripts/hessian_estimation.py:26-109).

Semantics preserved exactly: split the dataset into class batches of
`num_classes`; within each class batch the B factor accumulates the GGN of
every source sample against that class batch's targets, and the A factor
accumulates the activation Gram (+bias column for SigLIP); finally both are
divided by sqrt(n).

TPU-first differences:
  - the reference's inner loop of 5-sample batches exists only to bound the
    [B, D, D] intermediates of its per-sample formula; our GEMM
    reformulation has no such intermediate, so the inner "batch" is a block
    size of thousands, chosen to bound the [block, C] logits buffer
    (32768 x 32768 fp32 = 4 GB -> block 2048 = 256 MB).
  - with a mesh, each class batch's source rows are sharded over the data
    axis and the [D, D]/[C] partials are psum-reduced over ICI
    (bayesvlm_tpu.dist.hessian_allreduce).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.hessians import (
    activation_gram,
    hessian_infonce,
    hessian_siglip,
)


def kfac_ggn(
    logit_scale,
    logit_bias,
    num_classes: int,
    source_embeds,
    source_activations,
    target_embeds,
    likelihood: str,
    block_size: int = 2048,
    chunk_size_j: Optional[int] = None,
    precision: str = "highest",
    mesh=None,
    progress: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (A, B), both already divided by sqrt(n)
    (ref:hessian_estimation.py:106-109).

    `block_size` chunks the source axis (the CLI threads --la_batch_size
    here; the reference's default of 5 bounds its [B, D, D] intermediates,
    ours bounds the [block, C] logits buffer — results are invariant).
    `chunk_size_j` chunks the SigLIP target axis (--siglip_chunk_size).
    `precision`: 'highest' (fp32 GEMMs, default) or 'high' (bf16x3, 1.6x
    faster, 1.7e-5 max rel error vs fp64 — BASELINE.md round 2).
    """
    source_embeds = np.asarray(source_embeds, np.float32)
    source_activations = np.asarray(source_activations, np.float32)
    target_embeds = np.asarray(target_embeds, np.float32)

    num_class_batches = len(target_embeds) // num_classes
    if num_class_batches == 0:
        raise ValueError(
            f"Too few datapoints for K-FAC approximation. Need at least "
            f"{num_classes} datapoints."
        )

    use_mesh = mesh is not None and mesh.devices.size > 1
    if use_mesh:
        from bayesvlm_tpu.dist.hessian_allreduce import (
            sharded_activation_gram,
            sharded_hessian_infonce,
            sharded_hessian_siglip,
        )

    A = 0.0
    B = 0.0
    for i in range(num_class_batches):
        if progress:
            print(f"K-FAC class batch {i + 1}/{num_class_batches}", flush=True)
        start, end = i * num_classes, (i + 1) * num_classes
        tgt = target_embeds[start:end]
        src = source_embeds[start:end]
        act = source_activations[start:end]

        if likelihood == "info_nce":
            if use_mesh:
                H = sharded_hessian_infonce(
                    src, tgt, logit_scale, mesh,
                    block_size=block_size, precision=precision,
                )
            else:
                H = hessian_infonce(
                    src, tgt, logit_scale, block_size=block_size,
                    precision=precision,
                )
            B = B + np.asarray(H, np.float64)
            if use_mesh:
                G = sharded_activation_gram(act, mesh)
            else:
                G = activation_gram(act)
            A = A + np.asarray(G, np.float64)
        elif likelihood == "siglip":
            indices = np.arange(len(src), dtype=np.int32)
            if use_mesh:
                H = sharded_hessian_siglip(
                    src, indices, tgt, logit_scale, logit_bias, mesh,
                    block_size=block_size, chunk_j=chunk_size_j,
                    precision=precision,
                )
            else:
                H = hessian_siglip(
                    src, indices, tgt, logit_scale, logit_bias,
                    block_size=block_size, chunk_size_j=chunk_size_j,
                    precision=precision,
                )
            B = B + np.asarray(H, np.float64)
            if use_mesh:
                G = sharded_activation_gram(act, mesh, append_bias_column=True)
            else:
                G = activation_gram(act, append_bias_column=True)
            A = A + np.asarray(G, np.float64)
        else:
            raise ValueError(
                f"Invalid likelihood: {likelihood}, must be one of "
                f"['info_nce', 'siglip']."
            )

    n = num_class_batches * num_classes
    A = A / np.sqrt(n)
    B = B / np.sqrt(n)
    return A.astype(np.float32), B.astype(np.float32)
