"""Multi-model co-residency serving: N probabilistic VLMs on one chip.

The reference serves nothing (batch scripts only, ref:scripts/zeroshot.py);
`serve.BatchingServer` is this framework's single-model online lane. This
module is the next production step up: several models RESIDENT on the same
chip at once, multiplexed by one dispatcher thread. The measured memory
envelope makes co-residency a first-class TPU capability, not a trick —
compiled peak HBM at the swept sweet spots is 0.6-1.3 GiB per tower
(BASELINE.md round-4 table: weights dominate, ~12 ViT-H-class towers fit
in a v5e's 16 GiB), while serving load per model is often far below one
chip's throughput. Co-residency turns that slack into consolidation:
one chip serves a CLIP and a SigLIP (or an fp-accurate and an int8 lane
of the same tower) instead of idling two.

Design (same principles as serve.BatchingServer, which documents why a
single dispatcher thread owns the device):

- Each model is a **lane**: an unstarted `BatchingServer` used purely as
  the per-model execution engine — its AOT program ladder, input
  coercion, padding/bucket dispatch (`_run`), and stats. Lanes never
  start their own thread; the multiplexer is the only device owner.
- One global FIFO carries (lane, request) pairs. The dispatcher takes
  the OLDEST pending request, holds that lane's batch open up to
  `max_wait_ms` (exactly like the single-model server), and defers
  other lanes' arrivals to an internal queue that is always drained
  oldest-first before new work — so scheduling is FIFO-fair across
  models at batch granularity and no lane can starve another.
- Per-lane batch sizes / bucket ladders / input dtypes are independent
  (`batch_size` and `buckets` accept dicts keyed by model name): a
  latency-critical model can run a fine pow2 ladder while a bulk model
  runs one big program.

    ms = MultiModelServer(
        {"clip": vlm_clip, "siglip": vlm_siglip},
        batch_size={"clip": 8, "siglip": 16},
        buckets="pow2", max_wait_ms=3.0,
    ).start()
    fut = ms.submit("clip", image)        # Future -> [C] probabilities
    probs = ms.predict("siglip", image)   # sync convenience
    ms.stats()["clip"].latency_ms_p50
    ms.hbm_footprint()                    # per-model + total compiled HBM
    ms.stop(drain=True)

Trade-off documented up front: while one lane's batch is held open
(bounded by `max_wait_ms`), other lanes' requests wait in the deferred
queue — worst-case added latency for a request is the sum of the other
lanes' open windows ahead of it. Keep `max_wait_ms` small for mixed
residency (the default 5 ms holds p50 added latency under one window at
moderate load).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Dict, Optional

import numpy as np

from bayesvlm_tpu.serve import (
    _STOP as _RESOLVE_STOP,  # serve._resolve_loop's own sentinel object
    BatchingServer,
    ServerStats,
    _fail,
    _Request,
    _resolve_loop,
)

__all__ = ["MultiModelServer"]

_STOP = object()


def _per_lane(value, name, default=None):
    """Resolve a scalar-or-dict config value for one lane."""
    if isinstance(value, dict):
        return value.get(name, default)
    return value


class MultiModelServer:
    """Serve several ProbabilisticVLMs from one chip with one dispatcher.

    Parameters
    ----------
    models : dict of name -> ProbabilisticVLM (class prompts set). Each
        gets its own AOT program ladder compiled at construction.
    batch_size : int, or dict name -> int. Compiled (maximum) batch per
        dispatch for each lane.
    max_wait_ms : hold-open window after the first request of a batch
        (shared by all lanes; see module docstring for the co-residency
        latency trade-off).
    input_dtype : dtype (or dict name -> dtype) the programs compile
        for; uint8 fuses the /255+normalize lane into the graph.
    max_queue : global backpressure bound across all lanes.
    buckets : None | "pow2" | list[int] | dict name -> any of those;
        per-lane partial-batch program ladders (serve.BatchingServer).
    pipeline_depth : 0 resolves each batch inline; >0 starts ONE shared
        async-fetch resolver thread for all lanes (serve._resolve_loop):
        the dispatcher hands each batch's on-device result over and
        immediately dispatches the next lane's batch, so the fetch of
        one model's batch overlaps the execution of the next model's —
        the compute-bound co-residency duty cycle. Bounds in-flight
        unfetched batches across all lanes.
    """

    def __init__(self, models: Dict[str, object], batch_size,
                 max_wait_ms: float = 5.0, input_dtype=None,
                 max_queue: int = 1024, buckets=None,
                 pipeline_depth: int = 0):
        if not models:
            raise ValueError("models must be a non-empty dict")
        if pipeline_depth < 0:
            raise ValueError(f"pipeline_depth must be >= 0, got {pipeline_depth}")
        self.pipeline_depth = int(pipeline_depth)
        self._resolve_q = None
        self._resolve_thread: Optional[threading.Thread] = None
        self._lanes: Dict[str, BatchingServer] = {}
        for name, vlm in models.items():
            bs = _per_lane(batch_size, name)
            if bs is None:
                raise ValueError(f"no batch_size for model {name!r}")
            # the lane is never start()ed: it contributes its compiled
            # ladder, coercion, padding/bucket dispatch and stats; this
            # object's dispatcher is the only thread touching the device
            self._lanes[name] = BatchingServer(
                vlm, int(bs), max_wait_ms=max_wait_ms,
                input_dtype=_per_lane(input_dtype, name),
                buckets=_per_lane(buckets, name),
            )
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._deferred: deque = deque()  # dispatcher-thread-only
        self._pending: Dict[str, int] = {n: 0 for n in self._lanes}
        self._thread: Optional[threading.Thread] = None
        self._accepting = False
        self._lock = threading.Lock()

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "MultiModelServer":
        with self._lock:
            if self._thread is not None:
                raise RuntimeError("server already started")
            self._accepting = True
            if self.pipeline_depth > 0 and self._resolve_q is None:
                self._resolve_q = queue.Queue(maxsize=self.pipeline_depth)
                self._resolve_thread = threading.Thread(
                    target=_resolve_loop, args=(self._resolve_q,),
                    name="bvt-multiserve-resolve", daemon=True,
                )
                self._resolve_thread.start()
                # lanes push to the SHARED resolver queue (one FIFO for
                # the whole server keeps resolution in dispatch order)
                for lane in self._lanes.values():
                    lane._resolve_q = self._resolve_q
            self._thread = threading.Thread(
                target=self._dispatch_loop, name="bvt-multiserve-dispatch",
                daemon=True,
            )
            self._thread.start()
        return self

    def _shutdown_resolver(self, timeout: Optional[float]) -> bool:
        rq, rt = self._resolve_q, self._resolve_thread
        self._resolve_q = None
        self._resolve_thread = None
        for lane in self._lanes.values():
            lane._resolve_q = None
        if rt is None:
            return True
        rq.put(_RESOLVE_STOP)
        rt.join(timeout=timeout)
        return not rt.is_alive()

    def stop(self, drain: bool = True,
             timeout: Optional[float] = 30.0) -> bool:
        """Stop accepting; drain=True serves queued requests first,
        drain=False fails undispatched ones. Same return contract as
        BatchingServer.stop: True once the dispatcher has exited."""
        with self._lock:
            thread = self._thread
            if thread is None:
                return True
            self._accepting = False
            self._thread = None
        if not drain:
            failed = []
            try:
                while True:
                    item = self._queue.get_nowait()
                    if item is not _STOP:
                        failed.append(item)
            except queue.Empty:
                pass
            for name, req in failed:
                self._dec_pending(name, 1)
                _fail(req.future,
                      RuntimeError("server stopped without draining"))
        self._queue.put(_STOP)
        thread.join(timeout=timeout)
        if not thread.is_alive():
            # defense-in-depth sweep (submit() shares the lock with the
            # _accepting check, so nothing can land behind the sentinel)
            strays = []
            try:
                while True:
                    item = self._queue.get_nowait()
                    if item is not _STOP:
                        strays.append(item)
            except queue.Empty:
                pass
            for name, req in strays:
                self._dec_pending(name, 1)
                _fail(req.future, RuntimeError(
                    "request raced a server stop and was never dispatched"))
            # in pipelined mode, True additionally means every in-flight
            # batch has been fetched and its futures resolved
            return self._shutdown_resolver(timeout)
        return False

    def __enter__(self) -> "MultiModelServer":
        return self.start()

    def __exit__(self, *exc):
        self.stop(drain=True)

    # -- request path -------------------------------------------------------

    def submit(self, model: str, image) -> Future:
        """Enqueue one image for `model`; resolves to [C] probabilities."""
        lane = self._lanes.get(model)
        if lane is None:
            raise KeyError(
                f"unknown model {model!r}; resident: {sorted(self._lanes)}")
        req = _Request(lane._coerce(image))  # caller-thread decode/validate
        with self._lock:
            if not self._accepting:
                raise RuntimeError("server not accepting (call start())")
            self._queue.put_nowait((model, req))  # queue.Full = backpressure
            self._pending[model] += 1
        with lane._lock:
            lane._stats.requests += 1
        return req.future

    def predict(self, model: str, image,
                timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(model, image).result(timeout=timeout)

    # -- dispatcher ---------------------------------------------------------

    def _dec_pending(self, name: str, n: int) -> None:
        with self._lock:
            self._pending[name] -= n

    def _dispatch_loop(self):
        stop_seen = False
        while True:
            try:
                # oldest pending request first: the deferred queue holds
                # requests pulled (in FIFO order) during earlier lanes'
                # hold-open windows, so its head predates anything queued
                if self._deferred:
                    name, req = self._deferred.popleft()
                else:
                    if stop_seen:
                        return
                    item = self._queue.get()
                    if item is _STOP:
                        return
                    name, req = item
                lane = self._lanes[name]
                batch = [req]
                # same-lane requests already deferred are older than
                # anything in the queue: take them first, keep the rest
                # in order
                rest: deque = deque()
                while self._deferred and len(batch) < lane.batch_size:
                    nm, rq = self._deferred.popleft()
                    if nm == name:
                        batch.append(rq)
                    else:
                        rest.append((nm, rq))
                rest.extend(self._deferred)
                self._deferred = rest
                # hold the batch open like the single-model server
                deadline = time.monotonic() + self.max_wait_s
                while len(batch) < lane.batch_size and not stop_seen:
                    remaining = deadline - time.monotonic()
                    try:
                        item = (self._queue.get(timeout=remaining)
                                if remaining > 0 else self._queue.get_nowait())
                    except queue.Empty:
                        break
                    if item is _STOP:
                        stop_seen = True  # serve batch + deferred, then exit
                        break
                    nm, rq = item
                    if nm == name:
                        batch.append(rq)
                    else:
                        self._deferred.append(item)
                self._dec_pending(name, len(batch))
                lane._run(batch)
            except Exception:  # noqa: BLE001 — the dispatcher must NOT die
                # (same contract as BatchingServer._dispatch_loop: _run
                # fails its own batch's futures; anything escaping here is
                # a bug in the resolution path — count it, keep serving)
                try:
                    with self._lanes[name]._lock:
                        self._lanes[name]._stats.errors += 1
                except Exception:  # noqa: BLE001
                    pass

    # -- observability ------------------------------------------------------

    def stats(self) -> Dict[str, ServerStats]:
        """Per-model counters; queue_depth is THIS server's pending count
        for that lane (the lanes' own queues are unused)."""
        out = {}
        with self._lock:
            pending = dict(self._pending)
        for name, lane in self._lanes.items():
            s = lane.stats()
            s.queue_depth = pending[name]
            out[name] = s
        return out

    def signature(self) -> Dict[str, dict]:
        return {name: lane.signature() for name, lane in self._lanes.items()}

    def hbm_footprint(self) -> Dict[str, float]:
        """Compiled-HBM co-residency estimate in GiB: per model the max
        over its ladder programs of (args + outputs + temps - aliased)
        from XLA's memory analysis, plus 'total' (the sum — programs of
        different models never run concurrently here, but their weights
        stay resident). Models whose backend reports no analysis are
        reported as 0.0."""
        def peak(compiled) -> int:
            try:
                ma = compiled.memory_analysis()
            except Exception:  # noqa: BLE001 — backend-optional API
                return 0
            g = lambda n: int(getattr(ma, n, 0) or 0)  # noqa: E731
            return (g("argument_size_in_bytes") + g("output_size_in_bytes")
                    + g("temp_size_in_bytes") - g("alias_size_in_bytes"))

        out = {}
        for name, lane in self._lanes.items():
            programs = lane.vlm._serving["programs"]
            out[name] = round(
                max(peak(p) for p in programs.values()) / 2**30, 4)
        out["total"] = round(sum(out.values()), 4)
        return out
