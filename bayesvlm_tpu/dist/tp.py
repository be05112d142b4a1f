"""Tensor-parallel partition specs for the scan-stacked towers.

Megatron-style sharding of each transformer block over the `model` mesh
axis, expressed purely as NamedShardings on the stacked [L, ...] parameter
tree — GSPMD then partitions the einsums and inserts the all-reduces, per
the annotate-shardings recipe (SURVEY §2.7 "keep mesh axis ('model')
available"; no reference counterpart — the reference is single-device):

  q/k/v kernels  [L, D, D]   -> shard OUTPUT dim ('model'): head-parallel
  q/k/v biases   [L, D]      -> shard over 'model'
  out_proj kernel [L, D, D]  -> shard INPUT dim: psum after out projection
  mlp fc1 kernel [L, D, M]   -> shard OUTPUT dim
  mlp fc1 bias   [L, M]      -> shard over 'model'
  mlp fc2 kernel [L, M, D]   -> shard INPUT dim: psum after fc2
  everything else (LayerNorms, embeddings, projection heads, out/fc2
  biases) -> replicated

The leading L axis (nn.scan PARTITION_NAME "layers") is never sharded
here; it remains available for pipeline experiments.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name -> (kernel spec maker, bias spec maker); specs are for the
# per-layer shape, the stacked L axis is prepended by the caller.
_COL_PARALLEL = {"q_proj", "k_proj", "v_proj", "fc1"}   # shard output dim
_ROW_PARALLEL = {"out_proj", "fc2"}                     # shard input dim


def _spec_for_path(path, leaf, axis: str) -> P:
    names = [getattr(k, "key", None) for k in path]
    stacked = "layers" in names  # scan-stacked: leading L axis
    lead = (None,) if stacked else ()
    module = None
    for n in names:
        if n in _COL_PARALLEL or n in _ROW_PARALLEL:
            module = n
    kind = names[-1]

    if module in _COL_PARALLEL:
        if kind == "kernel":
            return P(*lead, None, axis)
        if kind == "bias":
            return P(*lead, axis)
    if module in _ROW_PARALLEL and kind == "kernel":
        return P(*lead, axis, None)
    # out_proj/fc2 biases, layer norms, embeddings, projections: replicated
    return P()


def tower_partition_specs(params: Any, axis: str = "model") -> Any:
    """PartitionSpec pytree matching `params` (Megatron TP over `axis`)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path, leaf, axis), params
    )


def shard_tower_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the tower params with TP NamedShardings over `mesh`."""
    specs = tower_partition_specs(params, axis=axis)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs,
    )
