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


def test_dataloader_early_break_releases_producer():
    """A consumer that stops mid-iteration must not leave the producer
    thread parked forever in a blocking q.put (thread + memory leak per
    abandoned iteration in a long-lived process)."""
    import threading
    import time as _time

    class _DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return dict(image=np.zeros((4, 4, 3), np.float32),
                        text=f"t{i}", class_id=i)

    it = iter(DataLoader(_DS(), batch_size=4, num_workers=2))
    next(it)
    it.close()  # generator finally: stop + drain + join
    deadline = _time.monotonic() + 10
    while _time.monotonic() < deadline:
        if not any(t.name == "bvt-loader-producer" and t.is_alive()
                   for t in threading.enumerate()):
            break
        _time.sleep(0.05)
    assert not any(t.name == "bvt-loader-producer" and t.is_alive()
                   for t in threading.enumerate())


def test_compute_features_first_batch_short():
    """A first batch SMALLER than later ones (routine with the native
    decode lane, which drops failed decodes) must not crash the padded
    streaming loop — later, larger batches pass through at their own
    size."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from bayesvlm_tpu.inference.precompute import compute_features

    def encoder(x):
        b = x.shape[0]
        return SimpleNamespace(
            activations=jnp.arange(b * 3, dtype=jnp.float32).reshape(b, 3),
            embeds=jnp.ones((b, 2), jnp.float32),
        )

    loader = [
        {"image": np.zeros((3, 8, 8, 3), np.float32)},   # short FIRST
        {"image": np.zeros((5, 8, 8, 3), np.float32)},   # larger later
        {"image": np.zeros((2, 8, 8, 3), np.float32)},   # short again
    ]
    act, emb = compute_features(encoder, loader, return_tensors=True)
    assert act.shape == (10, 3)
    assert emb.shape == (10, 2)


def test_corruption_transform_deterministic_per_image():
    """Noise must be a function of (seed, image content), not of a
    shared Generator's call order — otherwise multi-worker decode makes
    corruption eval non-reproducible across identically-seeded runs."""
    from bayesvlm_tpu.data.transforms import corruption_transform

    rng = np.random.default_rng(5)
    img = Image.fromarray(
        rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8))
    t = corruption_transform(8, std=0.1, seed=3)
    a = t(img)
    b = t(img)  # same transform, second call: must be identical
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, corruption_transform(8, 0.1, seed=3)(img))
    assert not np.array_equal(a, corruption_transform(8, 0.1, seed=4)(img))


def _make_cls_tar(path, n, ext="jpg", key_fmt="{i:04d}", skip_cls_for=()):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.new("RGB", (8, 8), color=(i * 20 % 255, 10, 10))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            key = key_fmt.format(i=i)
            info = tarfile.TarInfo(name=f"{key}.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if i not in skip_cls_for:
                cls = str(i % 3).encode()
                info = tarfile.TarInfo(name=f"{key}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))


def test_native_decode_loader_jpeg_members_and_noninteger_keys(tmp_path):
    """The native lane must accept *.jpeg members (the PIL lane does)
    and must not kill the stream on non-numeric __key__ values — it
    falls back to a stable content hash for image_id."""
    from bayesvlm_tpu.data import native_io
    from bayesvlm_tpu.data.transforms import DEFAULT_MEAN, DEFAULT_STD
    from bayesvlm_tpu.data.wds import NativeDecodeLoader

    if not native_io.available() and not native_io.build():
        pytest.skip("native library cannot be built")

    _make_cls_tar(tmp_path / "s.tar", 4, ext="jpeg",
                  key_fmt="n0144_{i:04d}")
    raw = WebDataset([tmp_path / "s.tar"])
    loader = NativeDecodeLoader(raw, batch_size=2, image_size=8,
                                mean=DEFAULT_MEAN, std=DEFAULT_STD)
    batches = list(loader)
    assert len(batches) == 2
    ids = np.concatenate([b["image_id"] for b in batches])
    assert len(set(ids.tolist())) == 4  # distinct, deterministic hashes
    ids2 = np.concatenate([b["image_id"] for b in list(loader)])
    np.testing.assert_array_equal(ids, ids2)  # stable across epochs


def test_imagenet_wds_ids_stable_and_missing_label_skipped(tmp_path):
    """image_id must be identical across re-iterations of the same
    loader (hessian CLIs run an image pass then a text pass over one
    loader), and a sample without a 'cls' member is warn-skipped rather
    than silently captioned with the LAST class's name."""
    from bayesvlm_tpu.data.imagenet import ImagenetWDSModule

    _make_cls_tar(tmp_path / "shard.tar", 6, skip_cls_for={2})
    m = ImagenetWDSModule(
        data_dir=str(tmp_path), batch_size=3,
        test_transform=lambda im: np.asarray(im, np.float32) / 255.0,
    )
    m.setup()
    with pytest.warns(UserWarning, match="missing 'cls'"):
        batches1 = list(m.val_dataloader())
    ids1 = np.concatenate([np.asarray(b["image_id"]).reshape(-1)
                           for b in batches1])
    cls1 = np.concatenate([np.asarray(b["class_id"]).reshape(-1)
                           for b in batches1])
    assert len(ids1) == 5  # unlabeled sample skipped
    assert (cls1 >= 0).all()
    with pytest.warns(UserWarning, match="missing 'cls'"):
        batches2 = list(m.val_dataloader())
    ids2 = np.concatenate([np.asarray(b["image_id"]).reshape(-1)
                           for b in batches2])
    np.testing.assert_array_equal(ids1, ids2)
