"""Orbax checkpoint lane — TPU-native persistence for production runs.

The reference persists every artifact with ``torch.save``: K-FAC factors and
the prior-precision JSON (ref:bayesvlm/hessians.py:137-167,203-217) and the
AL projection checkpoints (ref:scripts/activelearning.py:657-660).
``io/{torch_compat,artifacts}.py`` keep those contracts byte-compatible.

This module adds the lane a TPU deployment actually wants on top of that:

- **sharded saves** straight from device buffers (each host writes its own
  shards via orbax/tensorstore — no host-side gather),
- **restore-with-sharding**: arrays land already laid out on a
  ``jax.sharding.Mesh`` instead of being replicated then resharded,
- **async background writes** (``async_save_pytree``) so a long Stage-1 run
  never stalls on IO,
- **step-managed retention** (``StepCheckpoints``) for AL loops and long
  Hessian runs — keep-latest-N with atomic finalization,
- **conversion** to/from the reference ``.pt`` artifact directory
  (``hessians_to_orbax`` / ``orbax_to_hessians``) so ``.pt`` remains the
  interchange format with the reference ecosystem.

The prior-precision info is written as the same
``prior_precision_analytic.json`` sidecar the ``.pt`` directory uses, so
``artifacts.load_info`` works unchanged on an orbax artifact directory.

Orbax checkpoints here are plain ``StandardCheckpointHandler`` pytrees —
readable by any orbax consumer, no custom handlers.
"""

from __future__ import annotations

import shutil
import warnings
from pathlib import Path
from typing import Any, Callable, Optional, Sequence, Union

import jax
import numpy as np

PathLike = Union[str, Path]

# Orbax import is deferred-but-cheap; keep it module-level so failures are
# loud at import time for anyone opting into this lane.
import orbax.checkpoint as ocp

_FACTORS_SUBDIR = "factors_orbax"


def _abspath(path: PathLike) -> Path:
    # orbax requires absolute paths.
    return Path(path).expanduser().resolve()


# ---------------------------------------------------------------------------
# Plain pytree save / load
# ---------------------------------------------------------------------------

def save_pytree(path: PathLike, tree: Any, *, overwrite: bool = True) -> None:
    """Synchronous sharded save of ``tree`` (jax/np arrays + scalars) to an
    orbax checkpoint directory at ``path``."""
    path = _abspath(path)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=overwrite)


class AsyncSaveHandle:
    """Handle for a background save; call :meth:`wait` (or use as a context
    manager) before relying on the checkpoint being complete."""

    def __init__(self, checkpointer: "ocp.AsyncCheckpointer"):
        self._ckptr = checkpointer
        self._done = False

    def wait(self) -> None:
        if not self._done:
            self._ckptr.wait_until_finished()
            self._ckptr.close()
            self._done = True

    def __enter__(self) -> "AsyncSaveHandle":
        return self

    def __exit__(self, *exc) -> None:
        self.wait()


def async_save_pytree(
    path: PathLike, tree: Any, *, overwrite: bool = True
) -> AsyncSaveHandle:
    """Start a background save and return a handle. The calling step can keep
    running; device buffers are snapshotted before this returns, so the tree
    may be donated/overwritten immediately after."""
    path = _abspath(path)
    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    ckptr.save(path, args=ocp.args.StandardSave(tree), force=overwrite)
    return AsyncSaveHandle(ckptr)


ShardingLike = Union[
    jax.sharding.Sharding,          # one sharding for every array leaf
    Any,                            # pytree of shardings matching `tree`
    Callable[[Any], Optional[jax.sharding.Sharding]],  # metadata -> sharding
]


def _metadata_tree(path: Path) -> Any:
    """The stored pytree of per-leaf metadata (shapes/dtypes), unwrapped from
    orbax's StepMetadata envelope."""
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        meta = ckptr.metadata(path)
    item = getattr(meta, "item_metadata", meta)
    return getattr(item, "tree", item)


def _abstract_tree(path: Path, shardings: Optional[ShardingLike]) -> Any:
    """Build the abstract restore target from stored metadata, attaching the
    requested shardings so orbax restores arrays already distributed."""
    meta = _metadata_tree(path)

    def one(m: Any, s: Any) -> Any:
        shape = getattr(m, "shape", None)
        dtype = getattr(m, "dtype", None)
        if dtype is None:
            return m  # non-array leaf: restore as stored
        shape = tuple(shape) if shape is not None else ()
        if callable(s) and not isinstance(s, jax.sharding.Sharding):
            s = s(m)
        if len(shape) == 0 and isinstance(s, jax.sharding.Sharding):
            # scalars can't take a partitioned spec; restore them
            # replicated over the same devices (global => multi-process safe)
            if isinstance(s, jax.sharding.NamedSharding):
                s = jax.sharding.NamedSharding(
                    s.mesh, jax.sharding.PartitionSpec())
            elif hasattr(s, "replicate"):
                # PositionalSharding and friends
                s = s.replicate()
            # other sharding types (e.g. raw GSPMDSharding) pass through;
            # callers with scalar-bearing trees should use NamedSharding /
            # SingleDeviceSharding (the only lanes exercised in tests)
        return jax.ShapeDtypeStruct(shape, dtype, sharding=s)

    if shardings is None or isinstance(shardings, jax.sharding.Sharding) \
            or callable(shardings):
        return jax.tree_util.tree_map(lambda m: one(m, shardings), meta)
    # pytree of shardings matching the checkpoint structure
    return jax.tree_util.tree_map(one, meta, shardings)


def _maybe_cross_topology_fallback(err: ValueError, path: Path) -> None:
    """Gate the cross-topology restore fallback.

    Returns (warning emitted) if ``err`` looks like orbax failing to
    populate shardings written by a different device topology; re-raises
    ``err`` otherwise so genuine metadata/dtype mismatches surface directly.
    Multi-process callers must pass ``shardings``/``like`` — falling back
    there would land the FULL global array on one device per process.
    """
    msg = str(err).lower()
    if "sharding" not in msg and "device" not in msg and "mesh" not in msg:
        raise err
    if jax.process_count() > 1:
        raise ValueError(
            f"cross-topology restore of {path} in a multi-process run: pass "
            "shardings= or like= so arrays land distributed (the single-"
            "device fallback would replicate the full array per process)"
        ) from err
    warnings.warn(
        f"orbax restore of {path} could not populate the stored shardings "
        f"({err}); falling back to a single-device restore on "
        f"{jax.local_devices()[0]} (cross-topology read-back)",
        RuntimeWarning,
        stacklevel=3,
    )


def load_pytree(
    path: PathLike,
    *,
    like: Any = None,
    shardings: Optional[ShardingLike] = None,
) -> Any:
    """Restore a pytree saved by :func:`save_pytree`.

    - ``like``: optional abstract/concrete target tree (structure, dtypes and
      shardings taken from it — the usual train-state restore).
    - ``shardings``: alternatively, a single ``Sharding`` applied to every
      array, a pytree of shardings, or ``metadata -> sharding`` callable.
      Arrays then land on devices already laid out — no replicate-then-shard.

    With neither, arrays restore as host-committed ``jax.Array``s with the
    stored shapes/dtypes.
    """
    path = _abspath(path)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        if like is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    getattr(x, "shape", ()), getattr(x, "dtype", None),
                    sharding=(x.sharding if isinstance(x, jax.Array) else
                              getattr(x, "sharding", None)),
                )
                if hasattr(x, "shape") and hasattr(x, "dtype") else x,
                like,
            )
            return ckptr.restore(path, args=ocp.args.StandardRestore(abstract))
        # restore against the stored metadata even when no shardings are
        # requested — an unguided StandardRestore() is topology-sensitive
        # (and warns); the abstract tree pins shapes/dtypes explicitly
        abstract = _abstract_tree(path, shardings)
        try:
            return ckptr.restore(
                path, args=ocp.args.StandardRestore(abstract))
        except ValueError as err:
            if shardings is not None:
                raise
            # cross-topology restore: the stored sharding references a
            # device topology that doesn't exist here (e.g. a checkpoint
            # written by a 2-process mesh read back single-process), so
            # orbax can't populate shardings from the sharding file. Land
            # every leaf on the default local device instead — the standard
            # "restore a slice checkpoint on one host for inspection" path.
            _maybe_cross_topology_fallback(err, path)
            single = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
            abstract = _abstract_tree(path, single)
            return ckptr.restore(
                path, args=ocp.args.StandardRestore(abstract))


def checkpoint_metadata(path: PathLike) -> Any:
    """Stored tree structure / shapes / dtypes without reading array data."""
    return _metadata_tree(_abspath(path))


# ---------------------------------------------------------------------------
# Step-managed retention (AL loops, long Stage-1 runs)
# ---------------------------------------------------------------------------

class StepCheckpoints:
    """Keep-latest-N step checkpoints with atomic finalization.

    Thin wrapper over ``ocp.CheckpointManager`` pinned to the standard pytree
    handler so checkpoints stay plain and interoperable. Saves are async by
    default; :meth:`wait` / :meth:`close` flush them. Use as a context manager
    in drivers.
    """

    def __init__(self, directory: PathLike, *, max_to_keep: Optional[int] = 3):
        self._mgr = ocp.CheckpointManager(
            _abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
            ),
        )

    def save(self, step: int, tree: Any, *, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def restore(
        self,
        step: Optional[int] = None,
        *,
        like: Any = None,
        shardings: Optional[ShardingLike] = None,
    ) -> Any:
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no step checkpoints under {self._mgr.directory}")
        if like is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=(x.sharding if isinstance(x, jax.Array)
                              else getattr(x, "sharding", None)),
                )
                if hasattr(x, "shape") and hasattr(x, "dtype") else x,
                like,
            )
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        path = Path(self._mgr.directory) / str(step) / "default"
        abstract = _abstract_tree(path, shardings)
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except ValueError as err:
            if shardings is not None:
                raise
            # cross-topology fallback — see load_pytree
            _maybe_cross_topology_fallback(err, path)
            single = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
            abstract = _abstract_tree(path, single)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> Sequence[int]:
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "StepCheckpoints":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ---------------------------------------------------------------------------
# Hessian artifact directory conversion (.pt <-> orbax)
# ---------------------------------------------------------------------------

def save_hessians_orbax(
    la_dir: PathLike,
    A_img: Any, B_img: Any, A_txt: Any, B_txt: Any,
    *,
    overwrite: bool = True,
) -> Path:
    """Write all four raw K-FAC factors as one orbax pytree under
    ``<la_dir>/factors_orbax``. The prior-precision JSON stays the shared
    sidecar (``artifacts.save_prior_precision``) — identical in both lanes."""
    la_dir = _abspath(la_dir)
    la_dir.mkdir(parents=True, exist_ok=True)
    tree = {
        "A_img": np.asarray(A_img, np.float32),
        "B_img": np.asarray(B_img, np.float32),
        "A_txt": np.asarray(A_txt, np.float32),
        "B_txt": np.asarray(B_txt, np.float32),
    }
    out = la_dir / _FACTORS_SUBDIR
    save_pytree(out, tree, overwrite=overwrite)
    return out


def load_hessians_orbax(
    la_dir: PathLike,
    tag: str,
    *,
    shardings: Optional[ShardingLike] = None,
):
    """Load the (A, B) factors for one direction from an orbax artifact
    directory (counterpart of ``artifacts.load_hessians``; same fp32
    contract, ref:bayesvlm/hessians.py:203-217)."""
    if tag not in ("img", "txt"):
        raise ValueError(f"tag must be 'img' or 'txt', got {tag!r}")
    path = _abspath(la_dir) / _FACTORS_SUBDIR
    tree = load_pytree(path, shardings=shardings)
    return tree[f"A_{tag}"], tree[f"B_{tag}"]


def has_orbax_factors(la_dir: PathLike) -> bool:
    return (_abspath(la_dir) / _FACTORS_SUBDIR).exists()


def hessians_to_orbax(la_dir: PathLike, out_dir: Optional[PathLike] = None) -> Path:
    """Convert a reference-format ``.pt`` Hessian artifact directory into an
    orbax one. ``out_dir`` defaults to ``la_dir`` itself (the orbax factors
    live alongside the ``.pt`` files — both lanes readable)."""
    from bayesvlm_tpu.io.artifacts import load_hessians, load_info, save_prior_precision

    la_dir = _abspath(la_dir)
    out_dir = la_dir if out_dir is None else _abspath(out_dir)
    A_img, B_img = load_hessians(la_dir, "img")
    A_txt, B_txt = load_hessians(la_dir, "txt")
    out = save_hessians_orbax(out_dir, A_img, B_img, A_txt, B_txt)
    if out_dir != la_dir:
        info = load_info(la_dir)
        save_prior_precision(
            out_dir, info["lambda_img"], info["n_img"],
            info["lambda_txt"], info["n_txt"],
        )
    return out


def orbax_to_hessians(ckpt_dir: PathLike, la_dir: Optional[PathLike] = None) -> Path:
    """Convert an orbax Hessian artifact directory back to the reference
    ``.pt`` layout (interchange with the reference ecosystem)."""
    from bayesvlm_tpu.io.artifacts import load_info, save_hessians, save_prior_precision

    ckpt_dir = _abspath(ckpt_dir)
    la_dir = ckpt_dir if la_dir is None else _abspath(la_dir)
    tree = load_pytree(ckpt_dir / _FACTORS_SUBDIR)
    save_hessians(la_dir, tree["A_img"], tree["B_img"], "img")
    save_hessians(la_dir, tree["A_txt"], tree["B_txt"], "txt")
    if la_dir != ckpt_dir:
        info = load_info(ckpt_dir)
        save_prior_precision(
            la_dir, info["lambda_img"], info["n_img"],
            info["lambda_txt"], info["n_txt"],
        )
    return la_dir


def remove_checkpoint(path: PathLike) -> None:
    """Delete an orbax checkpoint directory (best-effort, idempotent)."""
    path = _abspath(path)
    if path.exists():
        shutil.rmtree(path)
