"""uint8 ingest lane: raw uint8 crops shipped to the device with /255 +
mean/std normalization fused in-graph must match the host-normalized
float path (tolerance = fp32 op-order noise through the tower). Covers
the PIL uint8 transforms, the ImageEncoder uint8 input branch, and the
native decode_batch_u8 lane. TPU rationale: 4x less H2D traffic (no
reference counterpart — torch keeps normalize on CPU workers,
ref:bayesvlm/data/common.py:68-76)."""

import io
import tarfile

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from bayesvlm_tpu.data.transforms import (
    default_transform,
    default_transform_uint8,
    get_transform_uint8,
    siglip_transform,
    siglip_transform_uint8,
)
from bayesvlm_tpu.models import load_model


def _rand_pil(rng, w=37, h=53):
    return Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))


@pytest.mark.parametrize("pair", [
    (default_transform, default_transform_uint8),
    (siglip_transform, siglip_transform_uint8),
], ids=["clip", "siglip"])
def test_uint8_transform_geometry_matches_float(pair):
    """float transform == normalize(uint8 transform) exactly, because
    the PIL geometry ops output uint8 either way."""
    from bayesvlm_tpu.data.transforms import _normalize

    float_t, u8_t = pair
    rng = np.random.default_rng(0)
    img = _rand_pil(rng)
    f = float_t(16)(img)
    u = u8_t(16)(img)
    assert u.dtype == np.uint8 and u.shape == (16, 16, 3)
    mean_std = ((0.48145466, 0.4578275, 0.40821073),
                (0.26862954, 0.26130258, 0.27577711)) \
        if float_t is default_transform else ((0.5,) * 3, (0.5,) * 3)
    re = _normalize(u.astype(np.float32) / 255.0, *mean_std)
    np.testing.assert_array_equal(f, re)


@pytest.mark.parametrize("model", ["tiny-clip", "tiny-siglip"])
def test_encoder_uint8_input_matches_float(model):
    img_enc, _, _ = load_model(model, dtype=jnp.float32, seed=0)
    family = img_enc.config.family
    rng = np.random.default_rng(1)
    pil_imgs = [_rand_pil(rng, 48, 40) for _ in range(3)]
    f_t = get_transform_uint8(family, 32)
    from bayesvlm_tpu.data.transforms import get_transform

    float_batch = np.stack([get_transform(family, 32)(im) for im in pil_imgs])
    u8_batch = np.stack([f_t(im) for im in pil_imgs])
    r_float = img_enc(jnp.asarray(float_batch))
    r_u8 = img_enc(jnp.asarray(u8_batch))
    np.testing.assert_allclose(np.asarray(r_u8.embeds),
                               np.asarray(r_float.embeds),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_u8.activations),
                               np.asarray(r_float.activations),
                               rtol=1e-5, atol=1e-5)


def test_native_u8_lane_matches_float_lane(tmp_path):
    """decode_batch_u8 + device normalize vs decode_batch (float):
    only uint8 quantization of the bilinear output separates them."""
    from bayesvlm_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(2)
    jpegs = []
    for _ in range(6):
        img = Image.fromarray(
            rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        jpegs.append(buf.getvalue())

    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    f, st_f = native_io.decode_batch(jpegs, 32, mean, std, num_threads=2)
    u, st_u = native_io.decode_batch_u8(jpegs, 32, num_threads=2)
    assert (st_f == 0).all() and (st_u == 0).all()
    assert u.dtype == np.uint8
    renorm = (u.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    # u8 lane rounds the bilinear output to uint8 first: bound 0.5/255/std
    np.testing.assert_allclose(renorm, f, atol=0.5 / 255 / min(std) + 1e-6)

    # corrupt jpeg -> same status contract
    bad = [b"not a jpeg"] + jpegs[:1]
    _, st = native_io.decode_batch_u8(bad, 32, num_threads=1)
    assert st[0] != 0 and st[1] == 0


def test_stage1_cli_u8_pipeline_matches_float(tmp_path, monkeypatch):
    """hessian_estimation --u8_pipeline must reproduce the float
    pipeline's factors (fp32 op-order tolerance)."""
    import sys
    from pathlib import Path as P

    sys.path.insert(0, str(P(__file__).resolve().parent.parent / "scripts"))
    import hessian_estimation as he

    laion_dir = tmp_path / "data" / "laion400m"
    laion_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for s in range(2):
        with tarfile.open(laion_dir / f"{s:05d}.tar", "w") as tf:
            for i in range(24):
                gid = s * 24 + i
                img = Image.fromarray(
                    rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, "JPEG", quality=95)
                ti = tarfile.TarInfo(f"{gid:09d}.jpg")
                ti.size = len(buf.getvalue())
                tf.addfile(ti, io.BytesIO(buf.getvalue()))
                txt = f"caption {gid}".encode()
                tt = tarfile.TarInfo(f"{gid:09d}.txt")
                tt.size = len(txt)
                tf.addfile(tt, io.BytesIO(txt))
    monkeypatch.setenv("DATA_BASE_DIR", str(tmp_path / "data"))

    kwargs = dict(
        dataset="laion400m", model_str="tiny-clip",
        precompute_batch_size=8, la_num_classes=16, la_batch_size=4,
        num_workers=1, num_files=2, max_datapoints=32,
        lambda_init_txt=10.0, lambda_init_img=10.0,
        n_init_txt=1.0, n_init_img=1.0, lr=1e-2, num_steps=20,
        use_mesh=False,
    )
    he.main(hessian_dir=str(tmp_path / "float"), **kwargs)
    he.main(hessian_dir=str(tmp_path / "u8"), u8_pipeline=True, **kwargs)

    from bayesvlm_tpu.io.torch_compat import load_pt_array

    for f in ("A_img", "B_img", "A_txt", "B_txt"):
        a = np.asarray(load_pt_array(tmp_path / "float" / f"{f}_analytic.pt"))
        b = np.asarray(load_pt_array(tmp_path / "u8" / f"{f}_analytic.pt"))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
