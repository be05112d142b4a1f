"""Dynamic micro-batching server for low-latency probabilistic serving.

The reference exposes inference only through batch scripts
(ref:scripts/zeroshot.py:25-128) — there is no online-serving component
anywhere in the repo. This module is the TPU-native production lane on
top of `pipeline.ProbabilisticVLM.compile_serving`: a single dispatcher
thread owns the device, concurrent callers enqueue one image each, and
the dispatcher coalesces them into fixed-shape batches for the
AOT-compiled fused program (one XLA dispatch per batch, donated pixel
buffer, probit softmax on device — semantics of
ref:scripts/zeroshot.py:119-120).

Why a single dispatcher thread: JAX dispatch is not free-threaded, the
axon tunnel serializes device access anyway, and the AOT executable has
ONE compiled signature — so the natural design is N request threads ->
queue -> 1 device thread, exactly like a production TPU serving binary.
Partial batches (a lone request after `max_wait_ms`) are padded to a
compiled batch size with a repeat of the last row; padded rows are
sliced off before futures resolve, so callers never observe padding.
With `buckets` (a ladder of compiled sizes — XLA's static shapes make a
program ladder the TPU-idiomatic answer to variable load), a partial
batch dispatches to the smallest compiled size that fits, cutting the
padding waste from (batch_size - n) to (bucket - n) rows.

    vlm = ProbabilisticVLM.from_pretrained(...).set_class_prompts(classes)
    server = BatchingServer(vlm, batch_size=8, max_wait_ms=3.0)
    server.start()
    fut = server.submit(image)          # concurrent.futures.Future
    probs = fut.result()                # [C] calibrated probabilities
    probs = server.predict(image)       # sync convenience
    server.stop(drain=True)

`scripts/serve.py` wraps this in an HTTP front end.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

__all__ = ["BatchingServer", "ServerStats"]

_STOP = object()  # queue sentinel: dispatcher exits after seeing it


def _fail(future: Future, exc: BaseException) -> None:
    """set_exception tolerating futures already cancelled by the caller."""
    try:
        future.set_exception(exc)
    except InvalidStateError:
        pass


def _resolve_loop(q) -> None:
    """Async-fetch resolver thread (shared by BatchingServer lanes and
    MultiModelServer): consumes (lane, live, device_probs, bucket, n)
    tuples, blocks on the device->host fetch, and resolves the futures.

    Why a separate thread: JAX dispatch is async — by the time a batch's
    results are ENQUEUED here, the dispatcher has already moved on to
    dispatching the next batch, so the fetch of batch N overlaps the
    execution of batch N+1. Without this, the dispatcher serializes
    dispatch -> execute -> fetch per batch, and on hosts with a long
    device round trip (the dev tunnel's ~0.3-0.5 s RTT; PCIe/DCN hops in
    general) throughput is RTT-bound instead of compute-bound. FIFO per
    queue, so futures resolve in dispatch order."""
    while True:
        item = q.get()
        if item is _STOP:
            return
        lane, live, probs_dev, bucket, n = item
        try:
            probs = np.asarray(probs_dev)
        except Exception as exc:  # noqa: BLE001 — propagate to callers
            with lane._lock:
                lane._stats.errors += n
            for req in live:
                _fail(req.future, exc)
            continue
        try:
            lane._finish(live, probs, bucket, n)
        except Exception:  # noqa: BLE001 — the resolver must NOT die
            with lane._lock:
                lane._stats.errors += 1


@dataclass
class ServerStats:
    """Counters since start(); fill = served rows / dispatched rows."""

    requests: int = 0
    batches: int = 0
    dispatched_rows: int = 0
    padded_rows: int = 0
    errors: int = 0
    queue_depth: int = 0
    fill: float = 1.0
    latency_ms_p50: float = 0.0
    latency_ms_p95: float = 0.0
    latency_ms_max: float = 0.0


class _Request:
    __slots__ = ("image", "future", "t_enqueue")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.future: Future = Future()
        self.t_enqueue = time.monotonic()


class BatchingServer:
    """Coalesce concurrent single-image requests into AOT-served batches.

    Parameters
    ----------
    vlm : ProbabilisticVLM with class prompts set. If its serving
        program is missing or compiled for a different batch size /
        dtype, `compile_serving(batch_size, input_dtype)` is run here.
    batch_size : compiled (maximum) batch per dispatch. On a >1-device
        mesh it must divide over the data axis (compile_serving checks).
    max_wait_ms : how long the dispatcher holds an open batch after the
        FIRST request arrives before dispatching it partially filled.
        Lower = better tail latency at low load; higher = better fill
        (throughput) under load. 0 dispatches whatever a single drain
        of the queue yields.
    input_dtype : dtype the program is compiled for. uint8 compiles the
        /255 + normalize lane into the graph (raw-camera ingestion:
        4x less host->device traffic than float32).
    max_queue : backpressure bound; submit() raises queue.Full beyond it.
    buckets : batch-size ladder for partial batches. XLA programs have
        static shapes, so a partial batch must pad to SOME compiled
        size; with a ladder it pads only to the smallest compiled size
        that fits instead of all the way to batch_size. None (default)
        compiles batch_size only (today's single-program behavior);
        "pow2" compiles a power-of-two ladder up to batch_size (on a
        >1-device mesh: multiples of the data-axis size); an explicit
        list of ints is used as-is (batch_size is always included).
    pipeline_depth : 0 (default) resolves each batch inline — the
        dispatcher blocks on the device->host fetch before dispatching
        the next batch. >0 starts an async-fetch resolver thread
        (`_resolve_loop`): the dispatcher hands each batch's on-device
        result to the resolver and immediately dispatches the next one,
        so fetch overlaps execution and throughput stays compute-bound
        on hosts with a long device round trip. The value bounds the
        number of in-flight unfetched batches (device-buffer
        backpressure); 2-8 is plenty. Results still resolve in dispatch
        order.
    """

    def __init__(self, vlm, batch_size: int, max_wait_ms: float = 5.0,
                 input_dtype=None, max_queue: int = 1024, buckets=None,
                 pipeline_depth: int = 0):
        import jax.numpy as jnp

        if input_dtype is None:
            input_dtype = jnp.float32
        if pipeline_depth < 0:
            raise ValueError(f"pipeline_depth must be >= 0, got {pipeline_depth}")
        self.pipeline_depth = int(pipeline_depth)
        self._resolve_q = None
        self._resolve_thread: Optional[threading.Thread] = None
        self.batch_size = int(batch_size)
        self._buckets = self._build_ladder(vlm, buckets)
        srv = vlm._serving
        if (srv is None or srv["dtype"] != np.dtype(input_dtype)
                or not set(self._buckets).issubset(srv["programs"])):
            vlm.compile_serving(self._buckets, input_dtype=input_dtype)
        self.vlm = vlm
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._shape = vlm._serving["image_shape"]  # (H, W, 3)
        self._dtype = np.dtype(vlm._serving["dtype"])
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._thread: Optional[threading.Thread] = None
        self._accepting = False
        self._lock = threading.Lock()
        self._lat_ring = np.zeros(1024, np.float64)
        self._lat_n = 0
        self._stats = ServerStats()

    def _build_ladder(self, vlm, buckets) -> list:
        """Sorted compiled-batch-size ladder ending at batch_size."""
        if self.batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {self.batch_size}")
        step = 1  # every size must divide over the data axis when sharded
        if vlm.mesh is not None and vlm.mesh.devices.size > 1:
            axis = ("data" if "data" in vlm.mesh.axis_names
                    else vlm.mesh.axis_names[0])
            step = vlm.mesh.shape[axis]
            if self.batch_size % step != 0:
                raise ValueError(
                    f"batch_size {self.batch_size} must be divisible by "
                    f"the {step}-way '{axis}' mesh axis")
        if buckets is None:
            return [self.batch_size]
        if buckets == "pow2":
            ladder, b = [], step
            while b < self.batch_size:
                ladder.append(b)
                b *= 2
            return ladder + [self.batch_size]
        ladder = sorted({int(b) for b in buckets} | {self.batch_size})
        bad = [b for b in ladder
               if b < 1 or b > self.batch_size or b % step != 0]
        if bad:
            raise ValueError(
                f"bucket sizes must be in [1, batch_size={self.batch_size}]"
                f" and divisible by {step} (mesh data axis), got {bad}")
        return ladder

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "BatchingServer":
        with self._lock:
            if self._thread is not None:
                raise RuntimeError("server already started")
            self._accepting = True
            if self.pipeline_depth > 0 and self._resolve_q is None:
                self._resolve_q = queue.Queue(maxsize=self.pipeline_depth)
                self._resolve_thread = threading.Thread(
                    target=_resolve_loop, args=(self._resolve_q,),
                    name="bvt-serve-resolve", daemon=True,
                )
                self._resolve_thread.start()
            self._thread = threading.Thread(
                target=self._dispatch_loop, name="bvt-serve-dispatch",
                daemon=True,
            )
            self._thread.start()
        return self

    def _shutdown_resolver(self, timeout: Optional[float]) -> bool:
        """Plant the resolver sentinel (after the dispatcher has exited,
        so FIFO guarantees every in-flight batch drains first) and join.
        No-op True when no resolver is running."""
        rq, rt = self._resolve_q, self._resolve_thread
        self._resolve_q = None
        self._resolve_thread = None
        if rt is None:
            return True
        rq.put(_STOP)
        rt.join(timeout=timeout)
        return not rt.is_alive()

    def stop(self, drain: bool = True,
             timeout: Optional[float] = 30.0) -> bool:
        """Stop accepting; drain=True serves queued requests first,
        drain=False fails them with RuntimeError. Returns True once the
        dispatcher has actually exited; False means the join timed out
        and in-flight work may still be executing (callers that mutate
        shared VLM state afterwards — e.g. a label swap — must treat
        False as "do not proceed", or pass timeout=None to block until
        exit)."""
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
            for req in failed:
                _fail(req.future,
                      RuntimeError("server stopped without draining"))
        self._queue.put(_STOP)
        thread.join(timeout=timeout)
        if not thread.is_alive():
            # submit() enqueues under the same lock as its _accepting
            # check, so no request can land behind the sentinel anymore;
            # this sweep is defense-in-depth (e.g. an external put).
            strays = []
            try:
                while True:
                    item = self._queue.get_nowait()
                    if item is not _STOP:
                        strays.append(item)
            except queue.Empty:
                pass
            for req in strays:
                _fail(req.future, RuntimeError(
                    "request raced a server stop and was never dispatched"))
            # in pipelined mode, True additionally means every in-flight
            # batch has been fetched and its futures resolved
            return self._shutdown_resolver(timeout)
        return False

    def __enter__(self) -> "BatchingServer":
        return self.start()

    def __exit__(self, *exc):
        self.stop(drain=True)

    # -- request path -----------------------------------------------------

    def _coerce(self, image) -> np.ndarray:
        """Validate/convert ONE image to the compiled [H, W, 3] row.
        Runs on the caller's thread (PIL decode + resize off the
        dispatcher's critical path)."""
        if not isinstance(image, np.ndarray) and not hasattr(image, "shape"):
            if self.vlm.transform is None:
                raise ValueError("PIL inputs need a transform; construct "
                                 "the VLM via from_pretrained")
            image = np.asarray(self.vlm.transform(image))
        image = np.asarray(image)
        if tuple(image.shape) != self._shape:
            raise ValueError(
                f"image shape {tuple(image.shape)} != compiled {self._shape}")
        if image.dtype != self._dtype:
            want_float = np.issubdtype(self._dtype, np.floating)
            have_float = np.issubdtype(image.dtype, np.floating)
            if not (want_float and have_float):
                # uint8<->float coercion would skip (or fake) the
                # in-graph normalize lane — same guard as _predict_fast
                raise ValueError(
                    f"image dtype {image.dtype} incompatible with the "
                    f"{self._dtype}-compiled program")
            image = image.astype(self._dtype)
        return image

    def submit(self, image) -> Future:
        """Enqueue one [H, W, 3] image (or PIL); resolves to [C] probs."""
        req = _Request(self._coerce(image))
        with self._lock:
            # The enqueue must share the lock with the _accepting check:
            # stop() flips _accepting under the same lock BEFORE planting
            # the sentinel, so any submit that passes the check is
            # guaranteed to land ahead of the sentinel and be served.
            if not self._accepting:
                raise RuntimeError("server not accepting (call start())")
            self._queue.put_nowait(req)  # queue.Full = backpressure signal
            self._stats.requests += 1
        return req.future

    def submit_many(self, images: Sequence) -> list:
        return [self.submit(im) for im in images]

    def predict(self, image, timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(image).result(timeout=timeout)

    # -- dispatcher -------------------------------------------------------

    def _collect(self) -> Optional[list]:
        """Block for the first request, then hold the batch open up to
        max_wait_s (or until full). None -> stop sentinel seen."""
        item = self._queue.get()
        if item is _STOP:
            return None
        batch = [item]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
            else:
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
            if item is _STOP:
                # serve what we have, then exit: re-plant the sentinel
                self._queue.put(_STOP)
                break
            batch.append(item)
        return batch

    def _dispatch_loop(self):
        while True:
            try:
                batch = self._collect()
                if batch is None:
                    return
                self._run(batch)
            except Exception:  # noqa: BLE001 — the dispatcher must NOT die:
                # a dead dispatcher with _accepting still True would hang
                # every future request forever. _run fails its own batch's
                # futures; anything escaping to here is a bug in the
                # resolution path itself — count it and keep serving.
                with self._lock:
                    self._stats.errors += 1

    def _run(self, batch: list):
        # Claim each future (RUNNING) so a caller-side cancel() can no
        # longer win the race and make set_result raise InvalidStateError;
        # already-cancelled requests are dropped before wasting a row.
        live = [r for r in batch if r.future.set_running_or_notify_cancel()]
        n = len(live)
        if not n:
            return
        # smallest compiled program that fits: with a bucket ladder a
        # partial batch wastes (bucket - n) rows, not (batch_size - n)
        bucket = next(b for b in self._buckets if b >= n)
        sink = self._resolve_q
        try:
            pixels = np.stack([r.image for r in live])
            if n < bucket:
                pad = np.broadcast_to(
                    pixels[-1:], (bucket - n, *self._shape))
                pixels = np.concatenate([pixels, pad])
            # public predict(): hits the AOT fast path on signature
            # match, and still serves correctly through the general
            # path if a runtime change (e.g. quant-cache swap) forced
            # a fallback
            probs_dev = self.vlm.predict(pixels)
            if sink is None:
                probs = np.asarray(probs_dev)
        except Exception as exc:  # noqa: BLE001 — propagate to callers
            with self._lock:
                self._stats.errors += n
            for req in live:
                _fail(req.future, exc)
            return
        if sink is not None:
            # pipelined lane: start the D2H copy now, hand resolution to
            # the resolver thread, and return to dispatch the next batch
            # (the blocking put bounds in-flight device result buffers
            # at pipeline_depth)
            try:
                probs_dev.copy_to_host_async()
            except AttributeError:  # general-path np output: already host
                pass
            sink.put((self, live, probs_dev, bucket, n))
            return
        self._finish(live, probs, bucket, n)

    def _finish(self, live: list, probs: np.ndarray, bucket: int, n: int):
        """Record stats and resolve futures for one served batch (called
        by the dispatcher inline, or by the resolver in pipelined mode)."""
        now = time.monotonic()
        with self._lock:
            s = self._stats
            s.batches += 1
            s.dispatched_rows += bucket
            s.padded_rows += bucket - n
            for req in live:
                self._lat_ring[self._lat_n % self._lat_ring.size] = (
                    now - req.t_enqueue) * 1000.0
                self._lat_n += 1
        for i, req in enumerate(live):
            try:
                req.future.set_result(probs[i])
            except InvalidStateError:  # defensive: claimed above
                pass

    # -- observability ----------------------------------------------------

    def signature(self) -> dict:
        """Public compiled-signature view (what /healthz reports)."""
        return {
            "batch_size": self.batch_size,
            "buckets": list(self._buckets),
            "image_shape": list(self._shape),
            "input_dtype": str(self._dtype),
            "max_wait_ms": self.max_wait_s * 1000.0,
            "pipeline_depth": self.pipeline_depth,
        }

    def stats(self) -> ServerStats:
        with self._lock:
            s = ServerStats(**vars(self._stats))
            s.queue_depth = self._queue.qsize()
            s.fill = ((s.dispatched_rows - s.padded_rows)
                      / s.dispatched_rows if s.dispatched_rows else 1.0)
            k = min(self._lat_n, self._lat_ring.size)
            if k:
                lat = np.sort(self._lat_ring[:k])
                s.latency_ms_p50 = float(lat[int(0.50 * (k - 1))])
                s.latency_ms_p95 = float(lat[int(0.95 * (k - 1))])
                s.latency_ms_max = float(lat[-1])
        return s
