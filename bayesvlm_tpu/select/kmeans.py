"""Pure-JAX k-means (Lloyd's algorithm) for representative selection.

Replaces the reference's sklearn KMeans / MiniBatchKMeans
(ref:scripts/activelearning_kmeans.py:94-164): the assignment and update
steps are one jitted `lax.scan` — distances are a single [N, K] GEMM per
iteration, so clustering 10^5 x 10^3 embeddings runs on-device instead of
on a host CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.types import EncoderResult

Array = jax.Array


@partial(jax.jit, static_argnames=("k", "num_iters"))
def kmeans_fit(
    x: Array, k: int, seed: int = 0, num_iters: int = 100
) -> Tuple[Array, Array]:
    """Lloyd k-means. Returns (centroids [k, D], assignments [N])."""
    N, D = x.shape
    key = jax.random.key(seed)
    init_idx = jax.random.choice(key, N, shape=(k,), replace=False)
    centroids = x[init_idx]

    x_sq = jnp.sum(x**2, axis=-1)  # [N]

    def assign(c):
        d = x_sq[:, None] - 2.0 * (x @ c.T) + jnp.sum(c**2, -1)[None, :]
        return jnp.argmin(d, axis=-1)

    def step(c, _):
        a = assign(c)
        one_hot = jax.nn.one_hot(a, k, dtype=x.dtype)          # [N, k]
        counts = one_hot.sum(0)                                 # [k]
        sums = one_hot.T @ x                                    # [k, D]
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], c
        )
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    return centroids, assign(centroids)


def cluster_and_select_representatives(
    train_outputs: EncoderResult,
    k_clusters: int,
    seed: int = 0,
    num_iters: int = 100,
    mesh="auto",
) -> Tuple[Array, EncoderResult]:
    """K-means over train embeddings; pick the sample closest to each
    centroid; dedupe (ref:scripts/activelearning_kmeans.py:94-164).

    With a `mesh`, the embedding rows are placed sharded over the data
    axis and GSPMD partitions every Lloyd iteration (the [N, K] distance
    GEMM and argmin are row-local; XLA inserts the psum for the
    centroid sums). "auto" = shard when more than one device is
    visible; results can differ from single-device only by float
    reassociation of the per-centroid sums.

    Returns (representative_indices [<=k], representative EncoderResult)."""
    from bayesvlm_tpu.dist.mesh import resolve_auto_mesh

    embeds = jnp.asarray(train_outputs.embeds, jnp.float32)
    mesh = resolve_auto_mesh(mesh)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        embeds = jax.device_put(embeds, NamedSharding(mesh, P("data", None)))
    centroids, _ = kmeans_fit(embeds, k_clusters, seed=seed, num_iters=num_iters)

    # closest sample to each centroid (argmin over N per centroid)
    d = (
        jnp.sum(centroids**2, -1)[:, None]
        - 2.0 * (centroids @ embeds.T)
        + jnp.sum(embeds**2, -1)[None, :]
    )
    closest = jnp.argmin(d, axis=-1)                            # [k]
    rep_idx = jnp.asarray(np.unique(np.asarray(closest)))

    reps = train_outputs[rep_idx]
    return rep_idx, reps
