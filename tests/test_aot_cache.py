"""AOT serving-ladder persistence (pipeline.save_serving /
load_serving): a restored ladder must serve bit-identical results to
the freshly compiled one, every signature mismatch must be refused
(stale caches must never serve — executables bake in shapes), and the
scripts/serve.py --aot_cache flow must skip compilation on a warm
cache. No reference counterpart (the reference has no serving
component); the math contract is ref:scripts/zeroshot.py:119-120 via
pipeline.ProbabilisticVLM. On-chip go/no-go for the underlying XLA
serialize/deserialize is measured by `bench.py --metric coldstart`
(GO: deserialize 0.04 s vs 7.2 s cold ladder compile, BASELINE.md).

This file lives in conftest.ISOLATED_FILES: deserialize_executable is
one of the two code-emitting XLA ops behind the suite's resident-state
flake, and a lean child process is both the reliable regime and the
production restart scenario being modeled.
"""

import importlib.util
import json
from pathlib import Path
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
from bayesvlm_tpu.pipeline import ProbabilisticVLM
from bayesvlm_tpu.serve import BatchingServer

ROOT = Path(__file__).resolve().parent.parent
PROMPTS = [f"An image of a thing {i}" for i in range(4)]


@pytest.fixture(scope="module")
def hessian_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aot_hessians")
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


def _make_vlm(hessian_dir, mesh=None, prompts=PROMPTS):
    return ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=30, mesh=mesh,
    ).set_class_prompts(prompts)


def _images(n, size=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, size, size, 3)).astype(np.float32)


def test_roundtrip_matches_fresh_compile(hessian_dir, tmp_path):
    src = _make_vlm(hessian_dir).compile_serving([2, 4])
    imgs = _images(4)
    expected = np.asarray(src.predict(imgs))
    path = src.save_serving(tmp_path / "ladder.aotserv")
    assert Path(path).exists()
    assert not list(tmp_path.glob("*.tmp.*")), "atomic write left a tmp file"

    dst = _make_vlm(hessian_dir)
    assert dst._serving is None
    dst.load_serving(path)
    assert sorted(dst._serving["programs"]) == [2, 4]
    assert dst._serving["dtype"] == np.dtype(np.float32)
    # tight allclose, not bit-equality: when the source ladder came from
    # the persistent compilation cache, save_serving re-serializes a
    # FRESH compile (the XLA:CPU cache-loaded-executable quirk, see
    # pipeline.save_serving), and a fresh binary may fuse differently
    # at the last ulp
    np.testing.assert_allclose(np.asarray(dst.predict(imgs)), expected,
                               rtol=1e-5, atol=1e-6)
    # the smaller ladder rung too
    np.testing.assert_allclose(np.asarray(dst.predict(imgs[:2])),
                               expected[:2], rtol=1e-5, atol=1e-6)


def test_batching_server_skips_recompile_after_load(hessian_dir, tmp_path):
    path = _make_vlm(hessian_dir).compile_serving([2, 4]).save_serving(
        tmp_path / "ladder.aotserv")
    vlm = _make_vlm(hessian_dir).load_serving(path)
    restored = vlm._serving
    with BatchingServer(vlm, batch_size=4, buckets=[2, 4],
                        max_wait_ms=5.0) as srv:
        assert vlm._serving is restored, "BatchingServer recompiled"
        imgs = _images(3, seed=7)
        got = np.stack([srv.predict(im, timeout=120) for im in imgs])
    plain = _make_vlm(hessian_dir)
    np.testing.assert_allclose(got, np.asarray(plain.predict(imgs)),
                               rtol=1e-5, atol=1e-6)


def test_load_requires_class_prompts(hessian_dir, tmp_path):
    path = _make_vlm(hessian_dir).compile_serving(2).save_serving(
        tmp_path / "l.aotserv")
    bare = ProbabilisticVLM.from_pretrained(
        "tiny-clip", str(hessian_dir), dtype="fp32",
        prior_num_steps=30, mesh=None)
    with pytest.raises(ValueError, match="set_class_prompts"):
        bare.load_serving(path)


def test_save_requires_compiled_ladder(hessian_dir, tmp_path):
    with pytest.raises(ValueError, match="compile_serving"):
        _make_vlm(hessian_dir).save_serving(tmp_path / "l.aotserv")


def test_class_count_mismatch_refused(hessian_dir, tmp_path):
    path = _make_vlm(hessian_dir).compile_serving(2).save_serving(
        tmp_path / "l.aotserv")
    other = _make_vlm(hessian_dir,
                      prompts=PROMPTS + ["An image of a thing 4"])
    with pytest.raises(ValueError, match="shape/dtype mismatch"):
        other.load_serving(path)


def test_version_and_platform_mismatch_refused(hessian_dir, tmp_path):
    import pickle

    path = _make_vlm(hessian_dir).compile_serving(2).save_serving(
        tmp_path / "l.aotserv")
    payload = pickle.loads(Path(path).read_bytes())
    stale = dict(payload, version=999)
    (tmp_path / "v.aotserv").write_bytes(pickle.dumps(stale))
    with pytest.raises(ValueError, match="version"):
        _make_vlm(hessian_dir).load_serving(tmp_path / "v.aotserv")
    alien = dict(payload, device_kind="TPU v5e")
    (tmp_path / "d.aotserv").write_bytes(pickle.dumps(alien))
    with pytest.raises(ValueError, match="device_kind"):
        _make_vlm(hessian_dir).load_serving(tmp_path / "d.aotserv")


def test_mesh_layout_mismatch_refused(hessian_dir, tmp_path):
    path = _make_vlm(hessian_dir).compile_serving(2).save_serving(
        tmp_path / "l.aotserv")
    sharded = _make_vlm(hessian_dir, mesh=make_mesh())
    with pytest.raises(ValueError, match="mesh layout"):
        sharded.load_serving(path)


def test_sharded_roundtrip(hessian_dir, tmp_path):
    mesh = make_mesh()
    src = _make_vlm(hessian_dir, mesh=mesh).compile_serving(8)
    imgs = _images(8, seed=3)
    expected = np.asarray(src.predict(imgs))
    path = src.save_serving(tmp_path / "sharded.aotserv")

    dst = _make_vlm(hessian_dir, mesh=mesh).load_serving(path)
    assert dst._serving["pix_sharding"] is not None
    np.testing.assert_allclose(np.asarray(dst.predict(imgs)), expected,
                               rtol=1e-5, atol=1e-6)


def test_from_serving_cache_zero_compile_restore(hessian_dir, tmp_path):
    src = _make_vlm(hessian_dir).compile_serving([2, 4])
    imgs = _images(4, seed=11)
    expected = np.asarray(src.predict(imgs))
    path = src.save_serving(tmp_path / "full.aotserv")

    vlm = ProbabilisticVLM.from_serving_cache(
        "tiny-clip", path, dtype="fp32", mesh=None)
    # full serving state restored: labels, prompt provenance, λ info,
    # covariance-finalized head, compiled ladder
    assert vlm._class_prompts == PROMPTS
    assert vlm._label_features is not None
    assert vlm.info["lambda_img"] == src.info["lambda_img"]
    assert sorted(vlm._serving["programs"]) == [2, 4]
    np.testing.assert_allclose(np.asarray(vlm.predict(imgs)), expected,
                               rtol=1e-5, atol=1e-6)
    # label swaps still work afterwards (text tower compiles lazily)
    vlm.set_class_prompts(PROMPTS[:3])
    assert np.asarray(vlm.predict(imgs)).shape == (4, 3)


def test_from_serving_cache_requires_runtime_block(hessian_dir, tmp_path):
    path = _make_vlm(hessian_dir).compile_serving(2).save_serving(
        tmp_path / "bare.aotserv", include_runtime=False)
    with pytest.raises(ValueError, match="include_runtime"):
        ProbabilisticVLM.from_serving_cache(
            "tiny-clip", path, dtype="fp32", mesh=None)


def test_serve_cli_aot_cache_skips_recompile(hessian_dir, tmp_path,
                                             monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "serve_script", ROOT / "scripts" / "serve.py")
    serve_script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_script)

    classes = tmp_path / "classes.json"
    classes.write_text(json.dumps([f"thing {i}" for i in range(4)]))
    args = SimpleNamespace(
        model_str="tiny-clip", hessian_dir=str(hessian_dir),
        weights_dir=None, tokenizer_dir=None, classes_json=str(classes),
        models_json=None, text_prompt="An image of a {class_name}",
        batch_size=4, max_wait_ms=0.0, input_dtype="float32",
        dtype="fp32", use_mesh=False, mlp_int8=False, device="cpu",
        buckets="2,4", predict_timeout_s=60.0, pipeline_depth=0,
        aot_cache=str(tmp_path / "aot"), verbose=False,
    )

    compiles, builds = [], []
    orig_compile = ProbabilisticVLM.compile_serving
    orig_fp = ProbabilisticVLM.from_pretrained.__func__

    def counting_compile(self, *a, **kw):
        compiles.append(1)
        return orig_compile(self, *a, **kw)

    def counting_fp(cls, *a, **kw):
        builds.append(1)
        return orig_fp(cls, *a, **kw)

    monkeypatch.setattr(ProbabilisticVLM, "compile_serving",
                        counting_compile)
    monkeypatch.setattr(ProbabilisticVLM, "from_pretrained",
                        classmethod(counting_fp))

    app1 = serve_script.build_app(args)
    try:
        assert compiles and builds, "first build must compile + build"
        assert (tmp_path / "aot" / "serving.aotserv").exists()
    finally:
        app1.server.stop(drain=False)

    compiles.clear(), builds.clear()
    app2 = serve_script.build_app(args)
    try:
        assert not compiles, "warm --aot_cache build recompiled"
        assert not builds, ("warm --aot_cache build ran the full Stage-2 "
                            "preamble instead of from_serving_cache")
        img = _images(1, seed=5)[0]
        probs = app2.predict(img)
        assert probs.shape == (4,) and np.isfinite(probs).all()
    finally:
        app2.server.stop(drain=False)

    # prompt set changed on disk -> full restore refuses (stale labels),
    # the normal build re-encodes and reuses/refreshes the ladder (the
    # refresh-save may recompile inside save_serving: serialize of a
    # DESERIALIZED executable is not faithful on this backend, so its
    # verification falls back to a fresh compile — a one-time migration
    # cost, not a serving regression)
    classes.write_text(json.dumps([f"other {i}" for i in range(4)]))
    compiles.clear(), builds.clear()
    app3 = serve_script.build_app(args)
    try:
        assert builds, "changed prompts must rebuild labels"
        probs = app3.predict(_images(1, seed=6)[0])
        assert probs.shape == (4,) and np.isfinite(probs).all()
    finally:
        app3.server.stop(drain=False)

    # ...and the refreshed file makes the NEXT restart zero-compile
    # again, now carrying the new prompt set
    compiles.clear(), builds.clear()
    app4 = serve_script.build_app(args)
    try:
        assert not builds and not compiles, (
            "restart after refresh should be zero-compile")
        probs = app4.predict(_images(1, seed=7)[0])
        assert probs.shape == (4,) and np.isfinite(probs).all()
    finally:
        app4.server.stop(drain=False)
