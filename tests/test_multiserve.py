"""MultiModelServer (multi-model co-residency on one chip): results for
every lane must equal that model's direct predict() chain, lanes must be
independently batched/bucketed, errors must stay inside their lane, and
the lifecycle contract must match BatchingServer's. No reference
counterpart (the reference has no serving at all); the per-model math
contract is ref:scripts/zeroshot.py:119-120 via pipeline.ProbabilisticVLM.

Runs tiny-clip + tiny-siglip resident together — the two production
families, exercising both head types (biasless CLIP / biased SigLIP)
through one dispatcher."""

import threading

import numpy as np
import pytest

from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG, TINY_SIGLIP_CONFIG
from bayesvlm_tpu.multiserve import MultiModelServer
from bayesvlm_tpu.pipeline import ProbabilisticVLM

CLIP_PROMPTS = [f"An image of a thing {i}" for i in range(4)]
SIGLIP_PROMPTS = [f"A photo of object {i}" for i in range(5)]


def _spd(rng, d, s=0.5):
    M = rng.normal(size=(d, d)).astype(np.float32)
    return M @ M.T / d * s + np.eye(d, dtype=np.float32)


@pytest.fixture(scope="module")
def clip_vlm(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ms_clip_hessians")
    rng = np.random.default_rng(0)
    cfg = TINY_CLIP_CONFIG
    save_hessians(tmp, _spd(rng, cfg.vision.hidden_size),
                  _spd(rng, cfg.vision.projection_dim), "img")
    save_hessians(tmp, _spd(rng, cfg.text.hidden_size),
                  _spd(rng, cfg.vision.projection_dim), "txt")
    save_prior_precision(tmp, 5.0, 1.0, 5.0, 1.0)
    return ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(tmp), dtype="fp32", prior_num_steps=30, mesh=None,
    ).set_class_prompts(CLIP_PROMPTS)


@pytest.fixture(scope="module")
def siglip_vlm(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ms_siglip_hessians")
    rng = np.random.default_rng(1)
    cfg = TINY_SIGLIP_CONFIG
    # image-side activations are the fc1 outputs (+1 bias col);
    # text-side last-token hidden (+1 bias col) — test_e2e_siglip.py
    save_hessians(tmp, _spd(rng, cfg.vision.mlp_dim + 1),
                  _spd(rng, cfg.vision.projection_dim), "img")
    save_hessians(tmp, _spd(rng, cfg.text.hidden_size + 1),
                  _spd(rng, cfg.vision.projection_dim), "txt")
    save_prior_precision(tmp, 5.0, 1.0, 5.0, 1.0)
    return ProbabilisticVLM.from_pretrained(
        "tiny-siglip", str(tmp), dtype="fp32", prior_num_steps=30, mesh=None,
    ).set_class_prompts(SIGLIP_PROMPTS)


@pytest.fixture(scope="module")
def expected(clip_vlm, siglip_vlm):
    """Ground truth via each model's general (non-AOT) predict path on
    fresh inputs — what every served result must reproduce."""
    def fn(name, imgs):
        vlm = clip_vlm if name == "clip" else siglip_vlm
        return np.asarray(vlm.predict(np.asarray(imgs)))
    return fn


def _images(n, seed, size=32):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, size, size, 3)).astype(np.float32)


def test_interleaved_concurrent_submissions_match_direct(
        clip_vlm, siglip_vlm, expected):
    clip_imgs = _images(9, seed=3)
    sig_imgs = _images(7, seed=4)
    want_clip = expected("clip", clip_imgs)
    want_sig = expected("siglip", sig_imgs)
    with MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 3}, max_wait_ms=20.0,
    ) as ms:
        futs = []
        # interleave submissions from many threads: the dispatcher must
        # route every request to its own lane's programs
        def submit(name, img, out, i):
            out[i] = ms.submit(name, img)

        jobs, clip_futs, sig_futs = [], [None] * 9, [None] * 7
        for i in range(9):
            jobs.append(threading.Thread(
                target=submit, args=("clip", clip_imgs[i], clip_futs, i)))
        for i in range(7):
            jobs.append(threading.Thread(
                target=submit, args=("siglip", sig_imgs[i], sig_futs, i)))
        for t in jobs:
            t.start()
        for t in jobs:
            t.join()
        for i, f in enumerate(clip_futs):
            got = f.result(timeout=120)
            assert got.shape == (len(CLIP_PROMPTS),)
            np.testing.assert_allclose(got, want_clip[i],
                                       rtol=1e-5, atol=1e-6)
        for i, f in enumerate(sig_futs):
            got = f.result(timeout=120)
            assert got.shape == (len(SIGLIP_PROMPTS),)
            np.testing.assert_allclose(got, want_sig[i],
                                       rtol=1e-5, atol=1e-6)
        stats = ms.stats()
        assert stats["clip"].requests == 9
        assert stats["siglip"].requests == 7
        assert stats["clip"].batches >= 1 and stats["siglip"].batches >= 1


def test_unknown_model_raises(clip_vlm):
    ms = MultiModelServer({"clip": clip_vlm}, batch_size=2)
    with pytest.raises(KeyError, match="unknown model"):
        ms.submit("nope", _images(1, seed=0)[0])


def test_submit_before_start_raises(clip_vlm):
    ms = MultiModelServer({"clip": clip_vlm}, batch_size=2)
    with pytest.raises(RuntimeError, match="not accepting"):
        ms.submit("clip", _images(1, seed=0)[0])


def test_per_lane_buckets_and_signature(clip_vlm, siglip_vlm):
    ms = MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 4},
        buckets={"clip": "pow2", "siglip": None},
    )
    sig = ms.signature()
    assert sig["clip"]["buckets"] == [1, 2, 4]
    assert sig["siglip"]["buckets"] == [4]


def test_stop_drain_serves_everything(clip_vlm, siglip_vlm, expected):
    imgs = _images(5, seed=6)
    want = expected("clip", imgs)
    ms = MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 2, "siglip": 2}, max_wait_ms=50.0,
    ).start()
    futs = [ms.submit("clip", im) for im in imgs]
    assert ms.stop(drain=True, timeout=120) is True
    for i, f in enumerate(futs):
        np.testing.assert_allclose(f.result(timeout=1), want[i],
                                   rtol=1e-5, atol=1e-6)


def test_stop_no_drain_fails_undispatched(clip_vlm, siglip_vlm,
                                          monkeypatch):
    """Gate the lane's execution so the dispatcher is deterministically
    stuck inside its first batch: stop(drain=False) must fail everything
    still queued, and the in-flight batch must still resolve once the
    gate opens."""
    import time as _time

    gate = threading.Event()
    orig_predict = siglip_vlm.predict

    def gated_predict(pixels, *a, **k):
        gate.wait(timeout=60)
        return orig_predict(pixels, *a, **k)

    monkeypatch.setattr(siglip_vlm, "predict", gated_predict)
    ms = MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 2, "siglip": 2}, max_wait_ms=0.0,
    ).start()
    futs = [ms.submit("siglip", im) for im in _images(6, seed=7)]
    # wait until the dispatcher has pulled its first (gated) batch
    deadline = _time.monotonic() + 30
    while (ms.stats()["siglip"].queue_depth == 6
           and _time.monotonic() < deadline):
        _time.sleep(0.01)
    # dispatcher is blocked in the gate: join times out (False), but the
    # queue has been drained and its requests failed
    ms.stop(drain=False, timeout=0.2)
    gate.set()
    served, failed = 0, 0
    for f in futs:
        try:
            f.result(timeout=120)
            served += 1
        except RuntimeError as e:
            assert "without draining" in str(e)
            failed += 1
    # the gated batch (at most batch_size=2 requests) is served; every
    # request still queued at stop() fails
    assert served <= 2 and failed >= 4 and served + failed == 6
    assert ms.stats()["siglip"].queue_depth == 0


def test_error_stays_in_its_lane(clip_vlm, siglip_vlm, expected,
                                 monkeypatch):
    clip_imgs = _images(3, seed=8)
    want = expected("clip", clip_imgs)
    boom = RuntimeError("injected lane failure")

    with MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 4}, max_wait_ms=10.0,
    ) as ms:
        # break ONLY the siglip lane's execution path
        class _Broken:
            @staticmethod
            def predict(*a, **k):
                raise boom

        monkeypatch.setattr(ms._lanes["siglip"], "vlm", _Broken())
        sig_futs = [ms.submit("siglip", im) for im in _images(2, seed=9)]
        clip_futs = [ms.submit("clip", im) for im in clip_imgs]
        for f in sig_futs:
            with pytest.raises(RuntimeError, match="injected lane failure"):
                f.result(timeout=120)
        for i, f in enumerate(clip_futs):
            np.testing.assert_allclose(f.result(timeout=120), want[i],
                                       rtol=1e-5, atol=1e-6)
        assert ms.stats()["siglip"].errors == 2
        assert ms.stats()["clip"].errors == 0


def test_no_lane_starvation_under_alternating_load(
        clip_vlm, siglip_vlm, expected):
    """Alternating single submissions with a zero hold-open window:
    FIFO-across-lanes means every request is served promptly even though
    batches never fill."""
    clip_imgs = _images(4, seed=10)
    sig_imgs = _images(4, seed=11)
    want_clip = expected("clip", clip_imgs)
    want_sig = expected("siglip", sig_imgs)
    with MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 4}, max_wait_ms=0.0,
    ) as ms:
        futs = []
        for i in range(4):
            futs.append(("clip", i, ms.submit("clip", clip_imgs[i])))
            futs.append(("siglip", i, ms.submit("siglip", sig_imgs[i])))
        for name, i, f in futs:
            want = want_clip if name == "clip" else want_sig
            np.testing.assert_allclose(f.result(timeout=120), want[i],
                                       rtol=1e-5, atol=1e-6)


# -- HTTP front end (scripts/serve.py --models_json mode) -------------------


def _load_serve_script():
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "bvt_serve_script_multi", root / "scripts" / "serve.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def http_multi(clip_vlm, siglip_vlm):
    from http.server import ThreadingHTTPServer

    mod = _load_serve_script()
    app = mod.MultiServingApp(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 2, "siglip": 2}, max_wait_ms=2.0,
        input_dtype="float32",
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), mod.make_handler(app))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield app, httpd.server_address[1]
    httpd.shutdown()
    app.server.stop(drain=False)


def _request(port, method, path, body=None, headers=None):
    import http.client
    import json

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.request(method, path, body=body, headers=headers or {})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def test_http_routes_per_model(http_multi, expected):
    _, port = http_multi
    img = _images(1, seed=12)[0]
    want_clip = expected("clip", img[None])[0]
    want_sig = expected("siglip", img[None])[0]
    raw = img.astype(np.float32).tobytes()
    hdr = {"Content-Type": "application/octet-stream",
           "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"}

    status, out = _request(port, "POST", "/predict/clip", raw, hdr)
    assert status == 200
    np.testing.assert_allclose(out["probs"], want_clip, rtol=1e-5, atol=1e-6)
    status, out = _request(port, "POST", "/predict/siglip", raw, hdr)
    assert status == 200
    np.testing.assert_allclose(out["probs"], want_sig, rtol=1e-5, atol=1e-6)

    # no model path with >1 resident, and unknown model: client errors
    status, out = _request(port, "POST", "/predict", raw, hdr)
    assert status == 400 and "model name required" in out["error"]
    status, out = _request(port, "POST", "/predict/nope", raw, hdr)
    assert status == 400 and "unknown model" in out["error"]


def test_http_multi_observability(http_multi):
    _, port = http_multi
    status, health = _request(port, "GET", "/healthz")
    assert status == 200 and health["ok"]
    assert set(health["models"]) == {"clip", "siglip"}
    assert set(health["hbm_gib"]) == {"clip", "siglip", "total"}
    status, stats = _request(port, "GET", "/stats")
    assert status == 200 and set(stats) == {"clip", "siglip"}
    assert all("latency_ms_p50" in s for s in stats.values())


def test_http_class_prompts_swap_one_lane(http_multi, expected):
    import json

    app, port = http_multi
    new_prompts = [f"swapped class {i}" for i in range(3)]
    status, out = _request(
        port, "POST", "/class_prompts/clip",
        json.dumps({"prompts": new_prompts}).encode(),
        {"Content-Type": "application/json"})
    assert status == 200 and out["num_classes"] == 3
    img = _images(1, seed=13)[0]
    raw = img.astype(np.float32).tobytes()
    hdr = {"Content-Type": "application/octet-stream",
           "X-Image-Shape": "32,32,3", "X-Image-Dtype": "float32"}
    status, out = _request(port, "POST", "/predict/clip", raw, hdr)
    assert status == 200 and len(out["probs"]) == 3
    # the OTHER lane is untouched by the swap
    status, out = _request(port, "POST", "/predict/siglip", raw, hdr)
    assert status == 200 and len(out["probs"]) == len(SIGLIP_PROMPTS)
    # restore for the other module-scoped tests
    status, _ = _request(
        port, "POST", "/class_prompts/clip",
        json.dumps({"prompts": CLIP_PROMPTS}).encode(),
        {"Content-Type": "application/json"})
    assert status == 200


def test_build_app_manifest_mode(tmp_path, clip_vlm):
    """CLI wiring: --models_json builds a MultiServingApp with per-model
    specs (random-init weights; the contract under test is routing +
    construction, not calibration)."""
    import json

    mod = _load_serve_script()
    rng = np.random.default_rng(2)
    hdir = tmp_path / "h"
    hdir.mkdir()
    cfg = TINY_CLIP_CONFIG
    save_hessians(hdir, _spd(rng, cfg.vision.hidden_size),
                  _spd(rng, cfg.vision.projection_dim), "img")
    save_hessians(hdir, _spd(rng, cfg.text.hidden_size),
                  _spd(rng, cfg.vision.projection_dim), "txt")
    save_prior_precision(hdir, 5.0, 1.0, 5.0, 1.0)
    classes = tmp_path / "classes.json"
    classes.write_text(json.dumps(["ant", "bee"]))
    manifest = tmp_path / "fleet.json"
    manifest.write_text(json.dumps({
        "tiny": {"model_str": "tiny-clip", "hessian_dir": str(hdir),
                 "classes_json": str(classes), "batch_size": 2,
                 "buckets": "pow2"},
    }))
    import argparse
    args = argparse.Namespace(
        model_str="tiny-clip", hessian_dir=None, weights_dir=None,
        tokenizer_dir=None, classes_json=None, models_json=str(manifest),
        text_prompt="An image of a {class_name}", batch_size=4,
        max_wait_ms=2.0, input_dtype="float32", dtype="fp32",
        use_mesh=False, mlp_int8=False, device="cpu", buckets=None,
        predict_timeout_s=120.0, host="127.0.0.1", port=0, verbose=False)
    app = mod.build_app(args)
    try:
        assert isinstance(app, mod.MultiServingApp)
        assert app.server.signature()["tiny"]["buckets"] == [1, 2]
        probs = app.predict(_images(1, seed=14)[0], model="tiny")
        assert probs.shape == (2,)
        # single resident model: the no-model path resolves to it
        probs = app.predict(_images(1, seed=14)[0])
        assert probs.shape == (2,)
    finally:
        app.server.stop(drain=False)


def test_hbm_footprint_reports_all_lanes(clip_vlm, siglip_vlm):
    ms = MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 4},
    )
    fp = ms.hbm_footprint()
    assert set(fp) == {"clip", "siglip", "total"}
    assert fp["total"] == pytest.approx(fp["clip"] + fp["siglip"], abs=1e-3)
    for v in fp.values():
        assert v >= 0.0


# -- pipelined async-fetch mode (shared resolver across lanes) ---------------


def test_pipelined_interleaved_lanes_match_direct(
        clip_vlm, siglip_vlm, expected):
    """pipeline_depth>0: one shared resolver fetches while the dispatcher
    runs the next lane's batch — results per lane must still equal the
    direct predict chain, in order, across interleaved lanes."""
    clip_imgs = _images(8, seed=20)
    sig_imgs = _images(6, seed=21)
    want_clip = expected("clip", clip_imgs)
    want_sig = expected("siglip", sig_imgs)
    with MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 4, "siglip": 3}, max_wait_ms=10.0,
        pipeline_depth=2,
    ) as ms:
        futs = []
        for i in range(8):
            futs.append(("clip", i, ms.submit("clip", clip_imgs[i])))
            if i < 6:
                futs.append(("siglip", i, ms.submit("siglip", sig_imgs[i])))
        for name, i, f in futs:
            want = want_clip if name == "clip" else want_sig
            np.testing.assert_allclose(f.result(timeout=120), want[i],
                                       rtol=1e-5, atol=1e-6)
        stats = ms.stats()
        assert stats["clip"].requests == 8
        assert stats["siglip"].requests == 6


def test_pipelined_stop_drain_resolves_everything(clip_vlm, siglip_vlm,
                                                  expected):
    imgs = _images(5, seed=22)
    want = expected("clip", imgs)
    ms = MultiModelServer(
        {"clip": clip_vlm, "siglip": siglip_vlm},
        batch_size={"clip": 2, "siglip": 2}, max_wait_ms=5.0,
        pipeline_depth=2,
    ).start()
    futs = [ms.submit("clip", im) for im in imgs]
    assert ms.stop(drain=True, timeout=120) is True
    for i, f in enumerate(futs):
        assert f.done()  # resolver drained before stop returned
        np.testing.assert_allclose(f.result(timeout=1), want[i],
                                   rtol=1e-5, atol=1e-6)
