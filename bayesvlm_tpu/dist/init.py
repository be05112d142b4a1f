"""Multi-host initialization and per-host input sharding glue.

Single entry point for scaling the same scripts from one chip to a
multi-host slice (ICI) or multiple slices (DCN):

    from bayesvlm_tpu.dist.init import initialize_distributed
    ctx = initialize_distributed()          # no-op on single host
    mesh = ctx.mesh                          # all global devices on 'data'
    dm.shard_for_host(ctx.host_id, ctx.num_hosts)   # webdataset tar split

The reference has no distributed machinery at all (SURVEY §2.7); this is
the TPU-native scaling layer. Collective layout: K-FAC partial sums psum
over the full 'data' axis — XLA routes intra-slice segments over ICI and
inter-slice over DCN automatically for a 1-D mesh ordered host-major.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

from bayesvlm_tpu.dist.mesh import make_mesh


@dataclasses.dataclass
class DistContext:
    mesh: object          # global data mesh (all devices, all hosts)
    local_mesh: object    # this host's devices only — for host-local
                          # compute over host-sharded data (e.g. kfac_ggn
                          # per-host accumulation before allreduce_factors)
    host_id: int
    num_hosts: int
    num_devices: int

    @property
    def is_primary(self) -> bool:
        return self.host_id == 0


def allreduce_factors(A, B, n_local: float, num_hosts: int = None,
                      _allgather=None):
    """Combine per-host K-FAC partial factors into the global convention.

    kfac_ggn returns per-host sums divided by sqrt(n_local); the global
    factors are sum_h sums_h / sqrt(sum_h n_h)
    (ref:hessian_estimation.py:106-109 applied to the global pair count).
    No-op on a single host. `_allgather` is injectable for tests; the
    default is jax.experimental.multihost_utils.process_allgather (DCN).
    """
    import numpy as np

    if num_hosts is None:
        num_hosts = jax.process_count()
    if num_hosts <= 1:
        return A, B
    if _allgather is None:
        from jax.experimental.multihost_utils import process_allgather

        _allgather = process_allgather
    import jax.numpy as jnp

    root = np.sqrt(np.float64(n_local)).astype(np.float32)
    stacked = _allgather(
        (jnp.asarray(A * root), jnp.asarray(B * root), jnp.asarray(root**2))
    )
    A_all, B_all, n_all = (np.asarray(x) for x in stacked)
    n_global = float(n_all.sum())
    return (
        (A_all.sum(0) / np.sqrt(n_global)).astype(np.float32),
        (B_all.sum(0) / np.sqrt(n_global)).astype(np.float32),
    )


def allgather_rows(x, num_hosts: int = None, return_counts: bool = False):
    """Gather per-host row blocks into one array in rank order, handling
    uneven per-host counts (pads to the max count, slices back after the
    gather). Used by the global-class-batch Stage-1 mode and the
    multi-process AL feature gather. ``return_counts`` additionally
    returns the per-host row counts (rank order) so callers can invert a
    striped row assignment."""
    import numpy as np

    if num_hosts is None:
        num_hosts = jax.process_count()
    x = np.asarray(x)
    if num_hosts <= 1:
        return (x, np.asarray([x.shape[0]])) if return_counts else x
    import jax.numpy as jnp
    from jax.experimental.multihost_utils import process_allgather

    counts = np.asarray(
        process_allgather(jnp.asarray(x.shape[0], jnp.int32))
    )
    m = int(counts.max())
    if x.shape[0] < m:
        pad = np.zeros((m - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad], axis=0)
    stacked = np.asarray(process_allgather(jnp.asarray(x)))
    out = np.concatenate(
        [stacked[h, : int(counts[h])] for h in range(num_hosts)], axis=0
    )
    return (out, counts) if return_counts else out


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistContext:
    """Initialize jax.distributed when multi-host env vars / args are
    present; always returns a DistContext with the global data mesh."""
    addr = (
        coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    # NOTE: do not probe jax.process_count() here — it initializes the
    # XLA backend, after which jax.distributed.initialize() refuses to run.
    if addr and not jax.distributed.is_initialized():
        if (num_processes or 1) > 1:
            # CPU backends need gloo for cross-process collectives
            # (exercised by the 2-process integration test; TPU slices use
            # their native transport and ignore this)
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    return DistContext(
        mesh=make_mesh(),
        local_mesh=make_mesh(jax.local_devices()),
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        num_devices=len(jax.devices()),
    )
