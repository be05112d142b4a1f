"""Device mesh construction and sharding helpers.

The workload is embarrassingly data-parallel (frozen encoders, [D, D]
Hessian partial sums): the canonical mesh is 1-D `('data',)` over all chips
of a slice, with an optional `('data', 'model')` 2-D mesh kept available for
tensor-sharding the ViT-H towers. Collectives ride ICI within a slice;
`jax.distributed.initialize()` extends the same code across slices (DCN)
without change — there is no reference counterpart to any of this
(the reference is single-device; SURVEY §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    shape defaults to putting every device on the first axis.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


def default_mesh() -> Mesh:
    return make_mesh()


def resolve_auto_mesh(mesh):
    """Shared "auto" gating for selection-layer entry points: "auto" ->
    a data mesh over the LOCAL devices when more than one is visible,
    else pass through (None disables sharding, an explicit Mesh forces
    it).

    Local, not global, on purpose: selection entry points take
    process-local arrays and fetch results to host, which a global
    multi-controller mesh would forbid (non-addressable outputs). Under
    multi-process launch each process therefore shards its (replicated)
    selection math over its own chips — consistent across processes
    because inputs and seeds are identical. Pass an explicit global
    mesh only with globally-sharded inputs."""
    if isinstance(mesh, str) and mesh == "auto":
        local = jax.local_devices()
        return make_mesh(local) if len(local) > 1 else None
    return mesh


def data_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
