"""Native input-pipeline runtime: tar indexing parity with tarfile, JPEG
batch decode correctness vs PIL, corrupt-sample status reporting."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from bayesvlm_tpu.data import native_io
from bayesvlm_tpu.data.transforms import DEFAULT_MEAN, DEFAULT_STD

if not native_io.available():
    built = native_io.build()
    if not built:
        pytest.skip("native library cannot be built", allow_module_level=True)


def _jpeg_bytes(w, h, color):
    img = Image.new("RGB", (w, h), color=color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_tar_index_matches_tarfile(tmp_path):
    path = tmp_path / "x.tar"
    payloads = {f"{i:04d}.jpg": _jpeg_bytes(16, 16, (i * 30 % 255, 0, 0)) for i in range(5)}
    payloads["0002.txt"] = b"caption two"
    with tarfile.open(path, "w") as tf:
        for name, data in sorted(payloads.items()):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    entries = native_io.tar_index(path)
    assert {e[0] for e in entries} == set(payloads)
    for name, offset, size in entries:
        assert native_io.read_member(path, offset, size) == payloads[name]


def test_decode_batch_matches_pil():
    jpegs = [
        _jpeg_bytes(100, 60, (200, 30, 120)),
        _jpeg_bytes(40, 80, (10, 250, 90)),
    ]
    out, status = native_io.decode_batch(
        jpegs, size=32, mean=DEFAULT_MEAN, std=DEFAULT_STD, num_threads=2
    )
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(status, 0)

    # uniform-color images: resampling kernel differences vanish; compare
    # against direct normalization of the decoded colors
    for i, color in enumerate([(200, 30, 120), (10, 250, 90)]):
        img = Image.open(io.BytesIO(jpegs[i])).convert("RGB")
        decoded = np.asarray(img, np.float32)[5, 5] / 255.0  # JPEG-lossy color
        expected = (decoded - np.asarray(DEFAULT_MEAN)) / np.asarray(DEFAULT_STD)
        center = out[i, 16, 16]
        np.testing.assert_allclose(center, expected, atol=0.05)


def test_decode_batch_square_resize():
    jpegs = [_jpeg_bytes(50, 90, (128, 128, 128))]
    out, status = native_io.decode_batch(
        jpegs, size=16, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        square_resize=True, num_threads=1,
    )
    assert out.shape == (1, 16, 16, 3)
    assert status[0] == 0
    np.testing.assert_allclose(out[0, 8, 8], (128 / 255 - 0.5) / 0.5, atol=0.05)


def test_decode_batch_corrupt_status():
    jpegs = [_jpeg_bytes(20, 20, (1, 2, 3)), b"definitely not a jpeg"]
    out, status = native_io.decode_batch(
        jpegs, size=8, mean=(0, 0, 0), std=(1, 1, 1), num_threads=2
    )
    assert status[0] == 0
    assert status[1] != 0
    np.testing.assert_array_equal(out[1], 0.0)  # zero-filled on failure
