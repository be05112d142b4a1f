"""Input-pipeline overlap: keep the TPU fed while the host decodes.

The reference feeds its GPU through torch DataLoader worker processes
(ref:bayesvlm/data/laion400m.py:79-92, `num_workers`); our loaders are
plain Python iterables, so without help the host decode and the device
forward SERIALIZE — measured on the 1-vCPU build host at ViT-L Stage-1
shapes: PIL lane 195 img/s, native C++ lane 538 img/s vs 934 img/s of
chip throughput (BASELINE.md stage-1 section). Two composable pieces:

- PrefetchLoader: a bounded-queue background thread running the wrapped
  iterable. PIL and the ctypes native-decode call both release the GIL,
  so one thread is enough to overlap host decode with device compute:
  steady-state throughput goes from 1/(1/feed + 1/chip) to
  min(feed, chip).

- ParallelPILLoader: fork-based decode worker processes for the PIL
  lane, the analogue of the reference's `num_workers`. Tar shards are
  assigned round-robin to workers (worker w takes tar_paths[w::N]);
  each worker streams its shards sequentially and emits preprocessed
  batches; the consumer interleaves worker queues round-robin, so the
  output order is deterministic for a fixed (shards, num_workers)
  config — like the reference's multi-worker loader, it differs from
  the num_workers=0 order. drop_last applies per worker. Workers are
  forked AFTER construction so the dataset/transform need not pickle.

Worker-count math for real hosts: workers_needed = ceil(chip_rate /
per_core_decode_rate) — e.g. 934/195 ≈ 5 PIL workers per chip, or 2
native threads (BASELINE.md).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
import warnings
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

class _Ctrl:
    """Control-message envelope for the prefetch queues. A private class
    (not a tuple/str) so no wrapped loader's batch object can ever be
    mistaken for an end/error signal — isinstance survives pickling
    across the process boundary, unlike object identity."""

    __slots__ = ("kind", "payload")

    def __init__(self, kind: str, payload=None):
        self.kind = kind
        self.payload = payload


def _end():
    return _Ctrl("end")


def _err(payload):
    return _Ctrl("err", payload)


class PrefetchLoader:
    """Wrap an iterable of batches with a depth-bounded background
    prefetch thread. Exceptions in the source re-raise in the consumer.

    The thread is started per ``__iter__`` and joined when the iterator
    is exhausted or closed, so the wrapper is re-iterable and safe for
    partial consumption (``close()`` / garbage collection stop it).
    """

    def __init__(self, loader: Iterable, depth: int = 2):
        self.loader = loader
        self.depth = max(1, int(depth))

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def run():
            try:
                for item in self.loader:
                    while True:
                        if stop.is_set():
                            return
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                q.put(_end())
            except BaseException as e:  # propagate to consumer
                q.put(_err(e))

        t = threading.Thread(target=run, daemon=True, name="bvt-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, _Ctrl):
                    if item.kind == "end":
                        break
                    raise item.payload
                yield item
        finally:
            stop.set()
            # drain so the producer can observe stop and exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)


_warned_fork_after_jax = False


def _warn_if_forking_after_jax_init():
    """Warn once when decode workers fork after the JAX backend has been
    initialized in this process (ADVICE round-2): the forked children
    inherit live device-client/gRPC thread state. Harmless for the
    PIL/tar work they do in practice, but not guaranteed by the runtime."""
    global _warned_fork_after_jax
    if _warned_fork_after_jax:
        return
    import sys
    jax_mod = sys.modules.get("jax")
    if jax_mod is None:
        return
    try:
        from jax._src import xla_bridge
        initialized = bool(xla_bridge._backends)
    except Exception:
        return
    if initialized:
        _warned_fork_after_jax = True
        warnings.warn(
            "ParallelPILLoader is forking decode workers after the JAX "
            "backend was initialized in this process; forking with live "
            "device-client threads is not guaranteed safe. Prefer building "
            "and iterating dataloaders before first device use, or use "
            "num_workers<2 / the native decode lane.",
            RuntimeWarning, stacklevel=3,
        )


def _worker_main(tar_paths, make_iter, batch_size, drop_last, collate_fn,
                 out_q, stop_evt):
    """Worker process body: stream assigned shards, emit collated batches."""
    try:
        batch: List = []
        for sample in make_iter(tar_paths):
            if stop_evt.is_set():
                out_q.cancel_join_thread()
                return
            batch.append(sample)
            if len(batch) == batch_size:
                out_q.put(collate_fn(batch))
                batch = []
        if batch and not drop_last:
            out_q.put(collate_fn(batch))
        out_q.put(_end())
    except BaseException as e:
        try:
            out_q.put(_err(repr(e)))
        except Exception:
            pass


class ParallelPILLoader:
    """Multi-process decode for webdataset-style tar streams.

    Parameters
    ----------
    tar_paths: the shard list (already host-sharded if multi-host).
    make_iter: callable(tar_path_subset) -> iterator of preprocessed
        samples — the per-worker pipeline (tar read -> decode ->
        transform). Runs inside forked workers.
    batch_size / drop_last / collate_fn: batching contract of
        IterableLoader (drop_last applies per worker).
    num_workers: decode processes. Queue depth per worker is 2 batches
        (bounded memory: 2 * num_workers * batch bytes).
    """

    def __init__(self, tar_paths: Sequence[str], make_iter: Callable,
                 batch_size: int, num_workers: int,
                 drop_last: bool = True,
                 collate_fn: Optional[Callable] = None):
        from bayesvlm_tpu.data.loader import default_collate

        if num_workers < 2:
            raise ValueError("ParallelPILLoader needs num_workers >= 2; "
                             "use IterableLoader for sequential decode")
        self.tar_paths = [str(p) for p in tar_paths]
        self.make_iter = make_iter
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate

    def __iter__(self) -> Iterator:
        # Workers are forked: they inherit the dataset/transform without
        # pickling, but forking a process that already holds live
        # TPU-client/gRPC threads is not guaranteed safe even though the
        # children only do PIL/tar work. Build and start dataloaders
        # BEFORE the first device use where possible; if fork-related
        # hangs appear on a real host, fall back to num_workers<2 (the
        # PrefetchLoader thread lane) or the native decode lane.
        ctx = mp.get_context("fork")  # inherit dataset/transform, no pickling
        n = min(self.num_workers, max(1, len(self.tar_paths)))
        if n < 2:
            # fewer shards than 2: degenerate to in-process iteration
            batch: List = []
            for sample in self.make_iter(self.tar_paths):
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield self.collate_fn(batch)
                    batch = []
            if batch and not self.drop_last:
                yield self.collate_fn(batch)
            return
        # warn only when we are actually about to fork (the n<2 branch
        # above never forks, and must not burn the warn-once flag)
        _warn_if_forking_after_jax_init()
        stop_evt = ctx.Event()
        queues = [ctx.Queue(maxsize=2) for _ in range(n)]
        procs = [
            ctx.Process(
                target=_worker_main,
                args=(self.tar_paths[w::n], self.make_iter, self.batch_size,
                      self.drop_last, self.collate_fn, queues[w], stop_evt),
                daemon=True,
            )
            for w in range(n)
        ]
        for p in procs:
            p.start()
        live = list(range(n))
        try:
            # deterministic round-robin over worker queues
            while live:
                for w in list(live):
                    while True:
                        try:
                            item = queues[w].get(timeout=5.0)
                            break
                        except queue.Empty:
                            # a worker killed without posting its _end/_err
                            # sentinel (OOM-kill, segfault in PIL/zlib)
                            # would otherwise hang this get forever
                            if not procs[w].is_alive():
                                raise RuntimeError(
                                    f"decode worker {w} died without "
                                    f"signaling (exitcode "
                                    f"{procs[w].exitcode})")
                    if isinstance(item, _Ctrl):
                        if item.kind == "end":
                            live.remove(w)
                            continue
                        raise RuntimeError(
                            f"decode worker {w} failed: {item.payload}")
                    yield item
        finally:
            stop_evt.set()
            for q in queues:
                try:
                    while True:
                        q.get_nowait()
                except Exception:
                    pass
            for p in procs:
                p.join(timeout=5.0)
                if p.is_alive():
                    p.terminate()
