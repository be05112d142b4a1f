"""Mid-pass preemption survival (round-3 VERDICT #1).

The reference resumes only at whole-artifact granularity
(ref:scripts/hessian_estimation.py:194-197, ref:bayesvlm/precompute.py:88):
a preempted 327k-pair Stage-1 pass loses all its work. Here:

- ``compute_features`` / ``precompute_image_features`` write atomic part
  files every k batches and fast-forward the loader on resume — already-
  encoded samples are never re-encoded;
- ``kfac_ggn`` checkpoints the running float64 partial sums after every
  class batch (orbax StepCheckpoints) and resumes bit-identically;
- the Stage-1 CLI wires both; the integration test below SIGKILLs a real
  run mid-GGN and asserts the resumed artifacts equal an uninterrupted
  run's exactly.
"""

import io
import os
import signal
import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

class _StubEncoder:
    """Deterministic encoder stub: features are fixed linear maps of the
    input, and every call is counted so tests can assert what was (not)
    re-encoded."""

    def __init__(self, feat_dim=6):
        self.calls = 0
        self.samples_encoded = 0
        self.feat_dim = feat_dim

    def __call__(self, images):
        import jax.numpy as jnp

        from bayesvlm_tpu.types import EncoderResult

        self.calls += 1
        x = np.asarray(images, np.float32).reshape(images.shape[0], -1)
        self.samples_encoded += x.shape[0]
        d = x.shape[1]
        w = (np.arange(d * self.feat_dim, dtype=np.float32)
             .reshape(d, self.feat_dim) % 7 - 3) / 10.0
        e = x @ w
        return EncoderResult(
            embeds=jnp.asarray(e),
            activations=jnp.asarray(e * 2.0 + 1.0),
            residuals=jnp.asarray(np.zeros_like(e)),
        )


def _image_batches(n_batches, batch=4, hw=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_batches):
        out.append({
            "image": rng.normal(size=(batch, hw, hw, 3)).astype(np.float32),
            "class_id": np.arange(i * batch, (i + 1) * batch) % 5,
            "image_id": np.arange(i * batch, (i + 1) * batch),
        })
    return out


class _CrashAfter:
    """Iterable that replays `batches` but raises after `n_ok` of them —
    an in-process stand-in for a preemption (part files are written with
    atomic renames, so exception vs SIGKILL is equivalent durability)."""

    def __init__(self, batches, n_ok):
        self.batches, self.n_ok = batches, n_ok

    def __iter__(self):
        for i, b in enumerate(self.batches):
            if i == self.n_ok:
                raise RuntimeError("simulated preemption")
            yield b


# ---------------------------------------------------------------------------
# compute_features: chunked parts + resume
# ---------------------------------------------------------------------------

def test_compute_features_parts_resume(tmp_path):
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.torch_compat import load_pt_array

    batches = _image_batches(6)

    # uninterrupted ground truth
    ref_dir = tmp_path / "ref"
    enc0 = _StubEncoder()
    compute_features(enc0, batches, tag="img", cache_dir=ref_dir,
                     modality="image", checkpoint_every=2)
    assert enc0.samples_encoded == 24
    assert not (ref_dir / "_parts_img").exists()  # cleaned up on success

    # crash after 4 batches (2 complete part files), then resume
    crash_dir = tmp_path / "crash"
    enc1 = _StubEncoder()
    with pytest.raises(RuntimeError, match="preemption"):
        compute_features(enc1, _CrashAfter(batches, 4), tag="img",
                         cache_dir=crash_dir, modality="image",
                         checkpoint_every=2)
    parts = sorted((crash_dir / "_parts_img").glob("part_*.npz"))
    assert len(parts) == 2  # 4 durable batches

    enc2 = _StubEncoder()
    compute_features(enc2, batches, tag="img", cache_dir=crash_dir,
                     modality="image", checkpoint_every=2)
    # only the 2 non-durable batches were re-encoded
    assert enc2.samples_encoded == 8, enc2.samples_encoded
    assert not (crash_dir / "_parts_img").exists()

    for f in ("activations_img.pt", "embeddings_img.pt"):
        a = np.asarray(load_pt_array(crash_dir / f))
        b = np.asarray(load_pt_array(ref_dir / f))
        np.testing.assert_array_equal(a, b)


def test_compute_features_resume_mid_batch_cursor(tmp_path):
    """The resume cursor is an exact sample count: a loader whose batch
    boundaries shift between runs (native-decode drops) still resumes
    exactly, slicing the straddling batch."""
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.torch_compat import load_pt_array

    batches = _image_batches(6)
    flat = np.concatenate([b["image"] for b in batches], axis=0)

    crash_dir = tmp_path / "crash"
    enc1 = _StubEncoder()
    with pytest.raises(RuntimeError):
        compute_features(enc1, _CrashAfter(batches, 3), tag="img",
                         cache_dir=crash_dir, modality="image",
                         checkpoint_every=3)  # one part = 12 samples

    # resume with DIFFERENT batch boundaries (5 per batch)
    rebatched = [
        {"image": flat[i:i + 5]} for i in range(0, len(flat), 5)
    ]
    enc2 = _StubEncoder()
    compute_features(enc2, rebatched, tag="img", cache_dir=crash_dir,
                     modality="image", checkpoint_every=3)
    assert enc2.samples_encoded == 12  # 24 total - 12 durable

    ref_dir = tmp_path / "ref"
    compute_features(_StubEncoder(), batches, tag="img", cache_dir=ref_dir,
                     modality="image")
    for f in ("activations_img.pt", "embeddings_img.pt"):
        a = np.asarray(load_pt_array(crash_dir / f))
        b = np.asarray(load_pt_array(ref_dir / f))
        np.testing.assert_array_equal(a, b)


def test_precompute_image_features_parts_resume(tmp_path):
    from bayesvlm_tpu.inference.precompute import precompute_image_features
    from bayesvlm_tpu.io.torch_compat import load_pt_array

    batches = _image_batches(5)

    ref_dir = tmp_path / "ref"
    precompute_image_features(_StubEncoder(), batches,
                              save_predictions=True, cache_dir=ref_dir,
                              checkpoint_every=2)

    crash_dir = tmp_path / "crash"
    with pytest.raises(RuntimeError):
        precompute_image_features(_StubEncoder(), _CrashAfter(batches, 2),
                                  save_predictions=True, cache_dir=crash_dir,
                                  checkpoint_every=2)
    enc = _StubEncoder()
    res, class_ids, img_ids = precompute_image_features(
        enc, batches, save_predictions=True, cache_dir=crash_dir,
        checkpoint_every=2)
    assert enc.samples_encoded == 12  # 20 total - 8 durable
    assert not (crash_dir / "_parts_img").exists()

    for f in ("embeddings_img.pt", "activations_img.pt", "residuals_img.pt",
              "class_ids_img.pt", "image_ids.pt"):
        a = np.asarray(load_pt_array(crash_dir / f))
        b = np.asarray(load_pt_array(ref_dir / f))
        np.testing.assert_array_equal(a, b)
    # returned values match the files
    np.testing.assert_array_equal(
        np.asarray(class_ids),
        np.concatenate([b["class_id"] for b in batches]))


# ---------------------------------------------------------------------------
# kfac_ggn: step checkpoints + bit-identical resume
# ---------------------------------------------------------------------------

def _ggn_inputs(n=32, d=8, p=6, seed=1):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(n, d)).astype(np.float32)
    act = rng.normal(size=(n, p)).astype(np.float32)
    tgt = rng.normal(size=(n, d)).astype(np.float32)
    return src, act, tgt


def test_kfac_ggn_step_checkpoint_resume(tmp_path, monkeypatch):
    import bayesvlm_tpu.bayes.estimation as est

    src, act, tgt = _ggn_inputs()
    kw = dict(logit_scale=0.3, logit_bias=0.0, num_classes=8,
              source_embeds=src, source_activations=act, target_embeds=tgt,
              likelihood="info_nce", block_size=4)

    A_ref, B_ref = est.kfac_ggn(**kw)

    # crash at the start of class batch 3 (0-indexed 2): steps 1,2 durable
    ckpt_dir = tmp_path / "steps"
    orig = est.hessian_infonce
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated preemption")
        return orig(*a, **k)

    monkeypatch.setattr(est, "hessian_infonce", crashing)
    with pytest.raises(RuntimeError):
        est.kfac_ggn(**kw, checkpoint_dir=ckpt_dir)
    monkeypatch.setattr(est, "hessian_infonce", orig)

    from bayesvlm_tpu.io.orbax_ckpt import StepCheckpoints

    with StepCheckpoints(ckpt_dir) as sc:
        assert sc.latest_step() == 2

    counting = {"n": 0}

    def counting_fn(*a, **k):
        counting["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(est, "hessian_infonce", counting_fn)
    A, B = est.kfac_ggn(**kw, checkpoint_dir=ckpt_dir)
    assert counting["n"] == 2  # resumed at class batch 2 of 4
    # bit-identical: the float64 accumulation order is unchanged
    np.testing.assert_array_equal(A, A_ref)
    np.testing.assert_array_equal(B, B_ref)
    assert not Path(ckpt_dir).exists()  # removed on success


def test_kfac_ggn_stale_checkpoint_restarts(tmp_path, monkeypatch):
    """A checkpoint from a different run configuration is discarded with a
    warning, not silently mixed in."""
    import bayesvlm_tpu.bayes.estimation as est

    src, act, tgt = _ggn_inputs()
    ckpt_dir = tmp_path / "steps"
    orig = est.hessian_infonce
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return orig(*a, **k)

    monkeypatch.setattr(est, "hessian_infonce", crashing)
    with pytest.raises(RuntimeError):
        est.kfac_ggn(0.3, 0.0, 8, src, act, tgt, "info_nce",
                     block_size=4, checkpoint_dir=ckpt_dir)
    monkeypatch.setattr(est, "hessian_infonce", orig)

    # resume with num_classes=16: incompatible accumulation -> fresh start
    with pytest.warns(RuntimeWarning, match="different run configuration"):
        A, B = est.kfac_ggn(0.3, 0.0, 16, src, act, tgt, "info_nce",
                            block_size=4, checkpoint_dir=ckpt_dir)
    A_ref, B_ref = est.kfac_ggn(0.3, 0.0, 16, src, act, tgt, "info_nce",
                                block_size=4)
    np.testing.assert_array_equal(A, A_ref)
    np.testing.assert_array_equal(B, B_ref)


# ---------------------------------------------------------------------------
# Stage-1 CLI: real SIGKILL mid-GGN, resume, equality with uninterrupted
# ---------------------------------------------------------------------------

def _make_laion_tar(path, start, n):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        rng = np.random.default_rng(start)
        for i in range(start, start + n):
            img = Image.fromarray(
                rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8), "RGB")
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{i:09d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a photo number {i} of something".encode()
            info = tarfile.TarInfo(name=f"{i:09d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


_CLI_KW = """dict(
    dataset="laion400m", model_str="tiny-clip",
    precompute_batch_size=8, la_num_classes=8, la_batch_size=8,
    num_workers=1, num_files=2, max_datapoints=32,
    lambda_init_txt=10.0, lambda_init_img=10.0,
    n_init_txt=1.0, n_init_img=1.0, lr=1e-2, num_steps=10,
    use_mesh=False, feature_checkpoint_every=1, ggn_checkpoint_every=1,
)"""

_KILL_WORKER = r"""
import os, signal, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
os.environ["DATA_BASE_DIR"] = {data!r}
import jax
jax.config.update("jax_platforms", "cpu")
# mirror conftest: ATOMIC persistent-cache writes are load-bearing here —
# this process dies by SIGKILL and a torn cache entry would segfault
# later readers (CLAUDE.md cache-flake playbook)
from bayesvlm_tpu.utils import harden_compilation_cache
harden_compilation_cache()
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import bayesvlm_tpu.bayes.estimation as est
_orig = est.hessian_infonce
_calls = {{"n": 0}}
def _killer(*a, **k):
    _calls["n"] += 1
    if _calls["n"] == {kill_at}:
        os.kill(os.getpid(), signal.SIGKILL)  # hard preemption, no cleanup
    return _orig(*a, **k)
est.hessian_infonce = _killer
import hessian_estimation as he
he.main(hessian_dir={hdir!r}, **{kw})
print("UNEXPECTED: survived")
"""


@pytest.mark.slow
def test_stage1_cli_sigkill_resume(tmp_path, monkeypatch):
    """The VERDICT #1 'done' bar: SIGKILL a Stage-1 run mid-GGN-pass,
    rerun the same command, and get factors exactly equal to an
    uninterrupted run's."""
    import hessian_estimation as he

    laion_dir = tmp_path / "data" / "laion400m"
    laion_dir.mkdir(parents=True)
    for s in range(2):
        _make_laion_tar(laion_dir / f"{s:05d}.tar", s * 24, 24)
    monkeypatch.setenv("DATA_BASE_DIR", str(tmp_path / "data"))

    # uninterrupted ground truth (in-process)
    ref_dir = tmp_path / "ref"
    kw = eval(_CLI_KW)
    he.main(hessian_dir=str(ref_dir), **kw)

    # killed run: 32 datapoints / 8 classes = 4 class batches per
    # direction; SIGKILL at the 3rd hessian call -> img-direction GGN dies
    # with steps 1,2 checkpointed and the feature caches complete
    crash_dir = tmp_path / "crash"
    worker = _KILL_WORKER.format(
        repo=str(REPO), data=str(tmp_path / "data"),
        hdir=str(crash_dir), kw=_CLI_KW, kill_at=3)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", worker],
                          env=env, capture_output=True, timeout=600)
    assert proc.returncode == -signal.SIGKILL, (
        proc.returncode, proc.stdout[-2000:], proc.stderr[-2000:])
    assert (crash_dir / "_ggn_steps_img").exists()
    assert not (crash_dir / "A_img_analytic.pt").exists()

    # resume: same command, in-process
    he.main(hessian_dir=str(crash_dir), **kw)
    assert not (crash_dir / "_ggn_steps_img").exists()  # cleaned up

    from bayesvlm_tpu.io.torch_compat import load_pt_array

    for f in ("A_img_analytic.pt", "B_img_analytic.pt",
              "A_txt_analytic.pt", "B_txt_analytic.pt"):
        a = np.asarray(load_pt_array(crash_dir / f))
        b = np.asarray(load_pt_array(ref_dir / f))
        np.testing.assert_array_equal(a, b, err_msg=f)

    import json

    info_a = json.loads((crash_dir / "prior_precision_analytic.json").read_text())
    info_b = json.loads((ref_dir / "prior_precision_analytic.json").read_text())
    assert info_a == info_b
