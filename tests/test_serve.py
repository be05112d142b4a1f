"""BatchingServer (dynamic micro-batching over the AOT serving lane) and
the HTTP front end: batched results must equal the direct predict()
chain, padding must never leak into results, errors must propagate to
the right futures, and lifecycle (drain / no-drain stop, label swap)
must be deterministic. No reference counterpart (the reference has no
serving component); the math contract is ref:scripts/zeroshot.py:119-120
via pipeline.ProbabilisticVLM."""

import http.client
import importlib.util
import json
import threading
import time
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
from bayesvlm_tpu.pipeline import ProbabilisticVLM
from bayesvlm_tpu.serve import BatchingServer

ROOT = Path(__file__).resolve().parent.parent
PROMPTS = [f"An image of a thing {i}" for i in range(4)]


@pytest.fixture(scope="module")
def hessian_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_hessians")
    rng = np.random.default_rng(0)

    def spd(d, s=0.5):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return M @ M.T / d * s + np.eye(d, dtype=np.float32)

    P, D, Pt = (TINY_CLIP_CONFIG.vision.hidden_size,
                TINY_CLIP_CONFIG.vision.projection_dim,
                TINY_CLIP_CONFIG.text.hidden_size)
    save_hessians(tmp, spd(P), spd(D), "img")
    save_hessians(tmp, spd(Pt), spd(D), "txt")
    save_prior_precision(tmp, 5.0, 1.0, 5.0, 1.0)
    return tmp


def _make_vlm(hessian_dir):
    return ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=30, mesh=None,
    ).set_class_prompts(PROMPTS)


@pytest.fixture(scope="module")
def vlm(hessian_dir):
    return _make_vlm(hessian_dir)


@pytest.fixture(scope="module")
def reference_predict(hessian_dir):
    """Independent plain VLM (general path, no AOT program): the
    ground truth every batched/served result is compared against."""
    plain = _make_vlm(hessian_dir)
    return lambda imgs: np.asarray(plain.predict(imgs))


def _images(n=6, size=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, size, size, 3)).astype(np.float32)


def test_concurrent_submissions_match_direct(vlm, reference_predict):
    imgs = _images(n=12, seed=3)
    expected = reference_predict(imgs)
    with BatchingServer(vlm, batch_size=4, max_wait_ms=20.0) as srv:
        results = [None] * len(imgs)

        def worker(i):
            results[i] = srv.predict(imgs[i], timeout=120)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = srv.stats()
    for i, r in enumerate(results):
        np.testing.assert_allclose(r, expected[i], rtol=1e-5, atol=1e-6)
    assert stats.requests == 12
    assert stats.batches >= 3  # 12 rows cannot fit in fewer than 3 x B=4
    assert stats.latency_ms_p50 > 0.0
    assert 0.0 < stats.fill <= 1.0


def test_partial_batch_is_padded_and_sliced(vlm, reference_predict):
    img = _images(n=1, seed=4)[0]
    expected = reference_predict(img[None])[0]
    srv = BatchingServer(vlm, batch_size=4, max_wait_ms=1.0).start()
    try:
        probs = srv.predict(img, timeout=120)
        np.testing.assert_allclose(probs, expected, rtol=1e-5, atol=1e-6)
        assert probs.shape == (len(PROMPTS),)
        stats = srv.stats()
        assert stats.requests == 1
        assert stats.batches == 1
        assert stats.padded_rows == 3  # padding never reaches the caller
    finally:
        srv.stop(drain=True)


def test_submit_validation_and_lifecycle(vlm):
    srv = BatchingServer(vlm, batch_size=4, max_wait_ms=1.0)
    with pytest.raises(RuntimeError, match="not accepting"):
        srv.submit(_images(n=1)[0])
    srv.start()
    with pytest.raises(RuntimeError, match="already started"):
        srv.start()
    with pytest.raises(ValueError, match="shape"):
        srv.submit(np.zeros((8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="dtype"):
        srv.submit(np.zeros((32, 32, 3), np.uint8))  # float32-compiled
    # float64 -> float32 coercion is allowed (same guard as predict())
    fut = srv.submit(_images(n=1, seed=5)[0].astype(np.float64))
    assert fut.result(timeout=120).shape == (len(PROMPTS),)
    srv.stop(drain=True)
    with pytest.raises(RuntimeError, match="not accepting"):
        srv.submit(_images(n=1)[0])
    srv.stop()  # second stop is a no-op


def test_drain_serves_all_queued(vlm, reference_predict):
    imgs = _images(n=7, seed=6)
    expected = reference_predict(imgs)
    srv = BatchingServer(vlm, batch_size=4, max_wait_ms=200.0).start()
    futs = srv.submit_many(list(imgs))
    srv.stop(drain=True)  # sentinel lands BEHIND the queued requests
    for i, f in enumerate(futs):
        np.testing.assert_allclose(f.result(timeout=1), expected[i],
                                   rtol=1e-5, atol=1e-6)


def test_stop_without_drain_fails_queued(vlm, monkeypatch):
    """Requests still queued when stop(drain=False) runs must fail with
    a RuntimeError; the batch already in flight must still resolve."""
    entered, release = threading.Event(), threading.Event()
    real_predict = vlm.predict

    def gated(pixels, **kw):
        entered.set()
        assert release.wait(timeout=60)
        return real_predict(pixels, **kw)

    monkeypatch.setattr(vlm, "predict", gated)
    srv = BatchingServer(vlm, batch_size=4, max_wait_ms=0.0).start()
    first = srv.submit(_images(n=1, seed=7)[0])
    assert entered.wait(timeout=60)  # dispatcher is inside predict
    late = srv.submit_many(list(_images(n=4, seed=8)))

    stopper = threading.Thread(target=srv.stop, kwargs=dict(drain=False))
    stopper.start()
    # stop(drain=False) fails every queued future BEFORE planting the
    # sentinel; waiting for them to resolve (instead of a sleep) makes
    # the ordering deterministic even on a loaded 1-vCPU host
    deadline = time.monotonic() + 60
    while (not all(f.done() for f in late)
           and time.monotonic() < deadline):
        time.sleep(0.005)
    release.set()
    stopper.join(timeout=60)
    assert not stopper.is_alive()

    assert first.result(timeout=60).shape == (len(PROMPTS),)
    assert all(f.done() for f in late)
    for f in late:
        exc = f.exception()
        assert exc is not None, "queued requests must fail on no-drain stop"
        assert "without draining" in str(exc)


def test_request_behind_stop_sentinel_is_failed(vlm):
    """A submit() racing stop() can enqueue its request BEHIND the stop
    sentinel (after the accepting check but after the sentinel landed);
    stop() must fail such strays instead of leaving their futures
    forever unresolved. Simulated deterministically by injecting the
    stray right after the sentinel is planted."""
    import bayesvlm_tpu.serve as serve_mod

    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=0.0).start()
    stray = serve_mod._Request(_images(n=1, seed=13)[0])
    real_put = srv._queue.put

    def put_with_stray(item):
        real_put(item)
        if item is serve_mod._STOP:
            real_put(stray)

    srv._queue.put = put_with_stray
    srv.stop(drain=True)
    exc = stray.future.exception(timeout=5)
    assert isinstance(exc, RuntimeError)
    assert "raced a server stop" in str(exc)


def test_dispatch_error_propagates_to_batch(vlm, monkeypatch):
    def boom(pixels, **kw):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(vlm, "predict", boom)
    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=50.0).start()
    try:
        futs = srv.submit_many(list(_images(n=2, seed=9)))
        for f in futs:
            with pytest.raises(RuntimeError, match="injected"):
                f.result(timeout=120)
        assert srv.stats().errors == 2
    finally:
        srv.stop(drain=False)


def test_uint8_lane(hessian_dir, reference_predict):
    """uint8-compiled server: raw bytes in, in-graph /255+normalize,
    results equal to the float general path on the same pixels."""
    vlm = _make_vlm(hessian_dir)
    rng = np.random.default_rng(10)
    u8 = rng.integers(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    expected = reference_predict(u8)
    import jax.numpy as jnp

    with BatchingServer(vlm, batch_size=2, max_wait_ms=5.0,
                        input_dtype=jnp.uint8) as srv:
        futs = srv.submit_many(list(u8))
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), expected[i],
                                       rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError, match="dtype"):
            srv.submit(_images(n=1)[0])  # float on the uint8 program


# -- HTTP front end ----------------------------------------------------


def _load_serve_script():
    spec = importlib.util.spec_from_file_location(
        "bvt_serve_script", ROOT / "scripts" / "serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def http_server(hessian_dir):
    mod = _load_serve_script()
    app = mod.ServingApp(_make_vlm(hessian_dir), batch_size=2,
                         max_wait_ms=2.0, input_dtype="float32")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), mod.make_handler(app))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield app, httpd.server_address[1]
    httpd.shutdown()
    app.server.stop(drain=False)


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.request(method, path, body=body, headers=headers or {})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def test_http_predict_and_observability(http_server, reference_predict):
    app, port = http_server
    img = _images(n=1, seed=11)[0]
    expected = reference_predict(img[None])[0]

    status, out = _request(
        port, "POST", "/predict", body=img.astype(np.float32).tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"})
    assert status == 200
    np.testing.assert_allclose(out["probs"], expected, rtol=1e-5, atol=1e-6)
    assert out["class"] == int(np.argmax(expected))
    assert out["latency_ms"] > 0

    status, out2 = _request(
        port, "POST", "/predict",
        body=json.dumps({"image": img.tolist()}).encode(),
        headers={"Content-Type": "application/json"})
    assert status == 200
    np.testing.assert_allclose(out2["probs"], expected, rtol=1e-5, atol=1e-6)

    status, health = _request(port, "GET", "/healthz")
    assert status == 200 and health["ok"]
    assert health["batch_size"] == 2
    assert health["image_shape"] == [32, 32, 3]

    status, stats = _request(port, "GET", "/stats")
    assert status == 200
    assert stats["requests"] >= 2
    assert stats["batches"] >= 1

    status, err = _request(
        port, "POST", "/predict", body=b"\x00" * 12,
        headers={"Content-Type": "application/octet-stream",
                 "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"})
    assert status == 400 and "error" in err

    status, err = _request(port, "GET", "/nope")
    assert status == 404


def test_http_class_prompt_swap(http_server, reference_predict):
    app, port = http_server
    new_prompts = [f"An image of a thing {i}" for i in range(5)]
    status, out = _request(
        port, "POST", "/class_prompts",
        body=json.dumps({"prompts": new_prompts}).encode(),
        headers={"Content-Type": "application/json"})
    assert status == 200 and out["num_classes"] == 5

    img = _images(n=1, seed=12)[0]
    status, pred = _request(
        port, "POST", "/predict", body=img.astype(np.float32).tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"})
    assert status == 200
    assert len(pred["probs"]) == 5
    assert sum(pred["probs"]) == pytest.approx(1.0, rel=1e-5)

    # restore the 4-class label set for any later module-scoped use
    status, out = _request(
        port, "POST", "/class_prompts",
        body=json.dumps({"prompts": PROMPTS}).encode(),
        headers={"Content-Type": "application/json"})
    assert status == 200 and out["num_classes"] == 4


def test_cancelled_request_is_skipped_and_dispatcher_survives(
        vlm, monkeypatch):
    """A caller-side fut.cancel() on a queued request must neither kill
    the dispatcher (InvalidStateError on set_result) nor consume a batch
    row; everything else in the batch still resolves."""
    entered, release = threading.Event(), threading.Event()
    real_predict = vlm.predict

    def gated(pixels, **kw):
        entered.set()
        assert release.wait(timeout=60)
        return real_predict(pixels, **kw)

    monkeypatch.setattr(vlm, "predict", gated)
    srv = BatchingServer(vlm, batch_size=4, max_wait_ms=0.0).start()
    first = srv.submit(_images(n=1, seed=20)[0])
    assert entered.wait(timeout=60)  # dispatcher is inside predict
    futs = srv.submit_many(list(_images(n=3, seed=21)))
    assert futs[1].cancel()  # still queued: cancellable
    release.set()

    assert first.result(timeout=120).shape == (len(PROMPTS),)
    assert futs[0].result(timeout=120).shape == (len(PROMPTS),)
    assert futs[2].result(timeout=120).shape == (len(PROMPTS),)
    assert futs[1].cancelled()
    # the dispatcher survived the cancelled future: new work is served
    assert srv.predict(_images(n=1, seed=22)[0],
                       timeout=120).shape == (len(PROMPTS),)
    srv.stop(drain=True)


def test_stop_reports_dispatcher_exit(vlm, monkeypatch):
    """stop() returns False when the join times out with the dispatcher
    still mid-predict (callers must not mutate shared VLM state then),
    True once it has actually exited."""
    entered, release = threading.Event(), threading.Event()
    real_predict = vlm.predict

    def gated(pixels, **kw):
        entered.set()
        assert release.wait(timeout=60)
        return real_predict(pixels, **kw)

    monkeypatch.setattr(vlm, "predict", gated)
    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=0.0).start()
    fut = srv.submit(_images(n=1, seed=23)[0])
    assert entered.wait(timeout=60)
    assert srv.stop(drain=True, timeout=0.05) is False
    release.set()
    assert fut.result(timeout=120).shape == (len(PROMPTS),)

    srv2 = BatchingServer(vlm, batch_size=2, max_wait_ms=0.0).start()
    assert srv2.stop(drain=True) is True


def test_signature_is_public(vlm):
    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=0.0)
    sig = srv.signature()
    assert sig["batch_size"] == 2
    assert sig["image_shape"] == [32, 32, 3]
    assert sig["input_dtype"] == "float32"
    assert sig["max_wait_ms"] == 0.0


def test_servingapp_predict_retries_after_swap(vlm, hessian_dir):
    """A /predict that lands in a label-swap's stopped window must wait
    out the swap (via _swap_lock) and succeed on the replacement server
    instead of surfacing 'not accepting' to the client."""
    mod = _load_serve_script()
    app = mod.ServingApp(vlm, batch_size=2, max_wait_ms=0.0,
                         input_dtype="float32")
    app.server.stop(drain=True)        # the mid-swap stopped window
    app._swap_lock.acquire()           # swap "in progress"
    out = {}

    def go():
        out["probs"] = app.predict(_images(n=1, seed=24)[0])

    t = threading.Thread(target=go)
    t.start()
    time.sleep(0.2)  # let the first attempt fail and park on the lock
    app.server = app._make().start()   # swap completes
    app._swap_lock.release()
    t.join(timeout=120)
    assert not t.is_alive()
    assert out["probs"].shape == (len(PROMPTS),)
    app.server.stop(drain=True)


def test_http_error_status_mapping_and_swap_recovery(vlm, monkeypatch):
    """Server faults map to 5xx (not 400), and a failed label swap
    leaves the endpoint serving with the old labels."""
    mod = _load_serve_script()
    app = mod.ServingApp(vlm, batch_size=2, max_wait_ms=0.0,
                         input_dtype="float32", predict_timeout_s=30.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), mod.make_handler(app))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    img = _images(n=1, seed=25)[0]
    img_req = dict(
        body=img.astype(np.float32).tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"})
    try:
        # client error: bad payload size -> 400
        status, err = _request(
            port, "POST", "/predict", body=b"\x00" * 12,
            headers=img_req["headers"])
        assert status == 400

        # server fault: injected device failure -> 500
        def boom(pixels, **kw):
            raise RuntimeError("injected device failure")

        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(vlm, "predict", boom)
            status, err = _request(port, "POST", "/predict", **img_req)
            assert status == 500 and "injected" in err["error"]

        # failed swap: endpoint stays alive with the OLD label set
        def tokenizer_explodes(prompts):
            raise RuntimeError("tokenizer exploded")

        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(app.vlm, "set_class_prompts", tokenizer_explodes)
            status, err = _request(
                port, "POST", "/class_prompts",
                body=json.dumps({"prompts": ["a", "b", "c"]}).encode(),
                headers={"Content-Type": "application/json"})
            assert status == 500 and "tokenizer" in err["error"]
        status, pred = _request(port, "POST", "/predict", **img_req)
        assert status == 200 and len(pred["probs"]) == len(PROMPTS)

        # shutdown window: 'not accepting' -> 503
        app.server.stop(drain=True)
        status, err = _request(port, "POST", "/predict", **img_req)
        assert status == 503
    finally:
        httpd.shutdown()
        app.server.stop(drain=False)


def test_bucket_ladder_reduces_padding(vlm, reference_predict):
    """With buckets='pow2' a partial batch pads only to the smallest
    compiled size that fits (here 3 -> bucket 4, 1 padded row) instead
    of all the way to batch_size=8 (5 padded rows)."""
    imgs = _images(n=3, seed=40)
    expected = reference_predict(imgs)
    srv = BatchingServer(vlm, batch_size=8, max_wait_ms=50.0,
                         buckets="pow2").start()
    try:
        assert srv._buckets == [1, 2, 4, 8]
        assert srv.signature()["buckets"] == [1, 2, 4, 8]
        futs = srv.submit_many(list(imgs))
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), expected[i],
                                       rtol=1e-5, atol=1e-6)
        stats = srv.stats()
        assert stats.dispatched_rows == 4   # bucket 4, not batch_size 8
        assert stats.padded_rows == 1
        assert stats.fill == pytest.approx(0.75)
    finally:
        srv.stop(drain=True)

    with pytest.raises(ValueError, match="bucket sizes"):
        BatchingServer(vlm, batch_size=8, buckets=[16])


def test_bucket_ladder_respects_mesh_divisibility():
    """On a >1-device mesh every compiled size must divide over the data
    axis: the pow2 ladder starts at the axis size, and explicit buckets
    that don't divide are rejected."""
    from types import SimpleNamespace

    fake_vlm = SimpleNamespace(mesh=SimpleNamespace(
        devices=SimpleNamespace(size=8), axis_names=("data",),
        shape={"data": 8}))
    srv = BatchingServer.__new__(BatchingServer)
    srv.batch_size = 32
    assert srv._build_ladder(fake_vlm, "pow2") == [8, 16, 32]
    assert srv._build_ladder(fake_vlm, None) == [32]
    assert srv._build_ladder(fake_vlm, [8, 24]) == [8, 24, 32]
    with pytest.raises(ValueError, match="divisible"):
        srv._build_ladder(fake_vlm, [4])
    srv.batch_size = 12
    with pytest.raises(ValueError, match="divisible"):
        srv._build_ladder(fake_vlm, "pow2")


# -- pipelined async-fetch mode (pipeline_depth > 0) -------------------------


def test_pipelined_results_match_inline(vlm, reference_predict):
    """pipeline_depth>0 moves the device->host fetch to a resolver
    thread; every result must still equal the direct predict chain and
    all stats must account for every batch."""
    imgs = _images(n=12, seed=21)
    expected = reference_predict(imgs)
    with BatchingServer(vlm, batch_size=4, max_wait_ms=20.0,
                        pipeline_depth=3) as srv:
        assert srv.signature()["pipeline_depth"] == 3
        futs = [srv.submit(im) for im in imgs]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), expected[i],
                                       rtol=1e-5, atol=1e-6)
        stats = srv.stats()
    assert stats.requests == 12
    assert stats.batches >= 3
    assert stats.latency_ms_p50 > 0.0


def test_pipelined_stop_drain_resolves_in_flight(vlm, reference_predict):
    """stop(drain=True) in pipelined mode returns True only after the
    resolver has fetched and resolved every in-flight batch."""
    imgs = _images(n=7, seed=22)
    expected = reference_predict(imgs)
    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=5.0,
                         pipeline_depth=2).start()
    futs = [srv.submit(im) for im in imgs]
    assert srv.stop(drain=True, timeout=120) is True
    for i, f in enumerate(futs):
        # done (not merely pending): the resolver drained before stop returned
        assert f.done()
        np.testing.assert_allclose(f.result(timeout=1), expected[i],
                                   rtol=1e-5, atol=1e-6)
    # restart after stop works (fresh resolver thread)
    srv.start()
    try:
        np.testing.assert_allclose(
            srv.predict(imgs[0], timeout=120), expected[0],
            rtol=1e-5, atol=1e-6)
    finally:
        assert srv.stop(drain=True, timeout=120) is True


def test_pipelined_dispatch_error_propagates(vlm, monkeypatch):
    def boom(pixels, **kw):
        raise RuntimeError("injected predict failure")

    srv = BatchingServer(vlm, batch_size=2, max_wait_ms=0.0,
                         pipeline_depth=2).start()
    try:
        monkeypatch.setattr(srv, "vlm", type(
            "B", (), {"predict": staticmethod(boom)})())
        futs = [srv.submit(im) for im in _images(n=2, seed=23)]
        for f in futs:
            with pytest.raises(RuntimeError, match="injected predict"):
                f.result(timeout=120)
        assert srv.stats().errors == 2
    finally:
        monkeypatch.undo()
        srv.stop(drain=False, timeout=120)


def test_pipeline_depth_validation(vlm):
    with pytest.raises(ValueError, match="pipeline_depth"):
        BatchingServer(vlm, batch_size=2, pipeline_depth=-1)
