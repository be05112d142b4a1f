"""Data-layer tests: transforms numerics, loader determinism, factory
registry, synthetic module, minimal webdataset reader."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from bayesvlm_tpu.data import (
    DataLoader,
    DataModuleFactory,
    HashTokenizer,
    SUPPORTED_MODULES,
    SyntheticDataModule,
    default_transform,
    siglip_transform,
)
from bayesvlm_tpu.data.wds import IterableLoader, WebDataset, decode_image


def test_registry_matches_reference_names():
    expected = {
        "laion400m", "flowers102", "food101", "eurosat", "cifar100",
        "stanfordcars", "dtd", "sun397", "oxfordpets", "ucf101", "cub",
        "homeoffice-art", "homeoffice-clipart", "homeoffice-product",
        "homeoffice-realworld", "homeoffice-da-art", "homeoffice-da-clipart",
        "homeoffice-da-product", "homeoffice-da-realworld",
        "imagenet-val-wds", "imagenet-100", "imagenet-50", "imagenet-r",
        "imagenet-sketch", "imagenet-da-r", "imagenet-da-sketch",
    }
    assert expected <= set(SUPPORTED_MODULES)


def test_clip_transform_numerics():
    img = Image.new("RGB", (100, 60), color=(128, 64, 255))
    out = default_transform(32)(img)
    assert out.shape == (32, 32, 3)
    # uniform image -> every pixel identical, check normalization formula
    expected_r = (128 / 255 - 0.48145466) / 0.26862954
    assert out[..., 0] == pytest.approx(expected_r, abs=1e-2)


def test_siglip_transform_square_resize():
    img = Image.new("L", (77, 13), color=128)  # grayscale -> rgb
    out = siglip_transform(16)(img)
    assert out.shape == (16, 16, 3)
    assert out[0, 0, 0] == pytest.approx((128 / 255 - 0.5) / 0.5, abs=1e-2)


def test_synthetic_module_end_to_end():
    dm = SyntheticDataModule(
        batch_size=8, num_train=20, num_test=12, num_classes=4, image_size=16
    )
    dm.setup()
    assert len(dm.class_prompts) == 4
    batches = list(dm.test_dataloader())
    assert len(batches) == 2
    assert batches[0]["image"].shape == (8, 16, 16, 3)
    assert batches[1]["image"].shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(
        batches[0]["class_id"], np.arange(8) % 4
    )


def test_loader_shuffle_determinism():
    dm = SyntheticDataModule(batch_size=4, num_train=16, num_classes=2, image_size=8)
    dm.setup()
    l1 = DataLoader(dm.train_dataset, batch_size=4, shuffle=True, seed=7)
    l2 = DataLoader(dm.train_dataset, batch_size=4, shuffle=True, seed=7)
    ids1 = np.concatenate([b["image_id"] for b in l1])
    ids2 = np.concatenate([b["image_id"] for b in l2])
    np.testing.assert_array_equal(ids1, ids2)
    assert not np.array_equal(ids1, np.arange(16))  # actually shuffled


def _make_tar(path, n, corrupt_one=False):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.new("RGB", (8, 8), color=(i * 20 % 255, 0, 0))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            if corrupt_one and i == 1:
                data = b"not a jpeg"
            info = tarfile.TarInfo(name=f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption {i}".encode()
            info = tarfile.TarInfo(name=f"{i:06d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


def test_webdataset_reader(tmp_path):
    _make_tar(tmp_path / "a.tar", 5)
    _make_tar(tmp_path / "b.tar", 3)

    def preprocess(item):
        img = decode_image(item["jpg"])
        return dict(
            image=np.asarray(img, np.float32) / 255.0,
            text=item["txt"].decode(),
            image_id=int(item["__key__"]),
        )

    ds = WebDataset([tmp_path / "a.tar", tmp_path / "b.tar"], map_fn=preprocess)
    samples = list(ds)
    assert len(samples) == 8
    assert samples[0]["text"] == "caption 0"

    loader = IterableLoader(ds, batch_size=3, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 8, 8, 3)


def test_webdataset_warn_and_continue(tmp_path):
    _make_tar(tmp_path / "c.tar", 4, corrupt_one=True)

    def preprocess(item):
        img = decode_image(item["jpg"])
        img.load()
        return dict(image=np.asarray(img), text="x", image_id=int(item["__key__"]))

    ds = WebDataset([tmp_path / "c.tar"], map_fn=preprocess)
    with pytest.warns(UserWarning):
        samples = list(ds)
    assert len(samples) == 3  # corrupt sample skipped, not fatal


def test_webdataset_host_sharding(tmp_path):
    for name in ("s0.tar", "s1.tar", "s2.tar", "s3.tar"):
        _make_tar(tmp_path / name, 2)
    ds = WebDataset(sorted(tmp_path.glob("*.tar")))
    a = ds.shard_slice(0, 2)
    b = ds.shard_slice(1, 2)
    assert set(a.tar_paths) | set(b.tar_paths) == set(str(p) for p in sorted(tmp_path.glob("*.tar")))
    assert not set(a.tar_paths) & set(b.tar_paths)


def test_hash_tokenizer():
    tok = HashTokenizer(vocab_size=64, max_length=10)
    ids = tok(["hello world", "hello"])
    assert ids.shape == (2, 10)
    assert ids.dtype == np.int32
    assert ids[0, 0] == 0  # bos
    assert (ids < 64).all()
    np.testing.assert_array_equal(tok(["hello world"])[0], ids[0])
    # identical first token for shared prefix
    assert ids[0, 1] == ids[1, 1]


def test_factory_creates_synthetic():
    f = DataModuleFactory(batch_size=4, num_workers=1)
    dm = f.create("synthetic", num_train=8, num_test=8, num_classes=2, image_size=8)
    dm.setup()
    assert len(list(dm.test_dataloader())) == 2
