"""Input-pipeline overlap layer (data/prefetch.py): PrefetchLoader must
be a transparent wrapper (same batches, re-iterable, exception-safe,
partial-consumption-safe); ParallelPILLoader must yield a deterministic
round-robin interleave covering the same sample multiset as sequential
iteration. No reference counterpart (torch DataLoader workers,
ref:bayesvlm/data/laion400m.py:79-92); this is the TPU host-feed path."""

import io
import tarfile

import numpy as np
import pytest

from bayesvlm_tpu.data.prefetch import ParallelPILLoader, PrefetchLoader


def test_prefetch_transparent():
    src = [{"x": np.full((2, 3), i)} for i in range(7)]
    out = list(PrefetchLoader(src, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], src[i]["x"])


def test_prefetch_reiterable_and_partial():
    src = list(range(100))
    pl = PrefetchLoader(src, depth=3)
    it = iter(pl)
    assert [next(it) for _ in range(5)] == [0, 1, 2, 3, 4]
    it.close()  # abandon mid-stream; thread must shut down
    assert list(pl) == src  # fresh full pass still works


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = iter(PrefetchLoader(gen(), depth=2))
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def _make_tars(tmp_path, n_tars=3, per_tar=10):
    paths = []
    for s in range(n_tars):
        p = tmp_path / f"{s:05d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(per_tar):
                gid = s * per_tar + i
                data = str(gid).encode()
                ti = tarfile.TarInfo(f"{gid:06d}.txt")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
        paths.append(str(p))
    return paths


def _make_iter(tars):
    # stand-in per-worker pipeline: read .txt members as int samples
    def gen():
        for t in tars:
            with tarfile.open(t) as tf:
                for m in tf:
                    if m.isfile():
                        yield {"v": int(tf.extractfile(m).read())}
    return gen()


def test_parallel_loader_deterministic_and_complete(tmp_path):
    tars = _make_tars(tmp_path, n_tars=3, per_tar=10)
    collate = lambda batch: [s["v"] for s in batch]
    loader = ParallelPILLoader(tars, _make_iter, batch_size=4,
                               num_workers=2, drop_last=False,
                               collate_fn=collate)
    run1 = list(loader)
    run2 = list(loader)
    assert run1 == run2, "round-robin interleave must be deterministic"
    flat = sorted(v for b in run1 for v in b)
    assert flat == list(range(30)), "must cover every sample exactly once"
    # worker 0 gets tars 0,2 (20 samples), worker 1 gets tar 1 (10):
    # first batch comes from worker 0, second from worker 1
    assert run1[0] == [0, 1, 2, 3]
    assert run1[1] == [10, 11, 12, 13]


def test_parallel_loader_drop_last_per_worker(tmp_path):
    tars = _make_tars(tmp_path, n_tars=2, per_tar=10)
    collate = lambda batch: [s["v"] for s in batch]
    out = list(ParallelPILLoader(tars, _make_iter, batch_size=4,
                                 num_workers=2, drop_last=True,
                                 collate_fn=collate))
    # each worker: 10 samples -> 2 full batches, remainder dropped
    assert len(out) == 4 and all(len(b) == 4 for b in out)


def test_parallel_loader_single_shard_degenerates(tmp_path):
    tars = _make_tars(tmp_path, n_tars=1, per_tar=8)
    collate = lambda batch: [s["v"] for s in batch]
    out = list(ParallelPILLoader(tars, _make_iter, batch_size=4,
                                 num_workers=4, drop_last=False,
                                 collate_fn=collate))
    assert [v for b in out for v in b] == list(range(8))


def test_single_shard_does_not_burn_fork_warning(tmp_path):
    """The n<2 branch never forks, so it must neither emit the
    fork-after-JAX-init warning nor consume the warn-once flag (a later
    loader that actually forks would then warn nothing)."""
    import warnings

    import jax

    from bayesvlm_tpu.data import prefetch as pf

    jax.devices()  # ensure the backend is initialized (warning armed)
    old = pf._warned_fork_after_jax
    try:
        pf._warned_fork_after_jax = False
        tars = _make_tars(tmp_path, n_tars=1, per_tar=4)
        collate = lambda batch: [s["v"] for s in batch]
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            list(ParallelPILLoader(tars, _make_iter, batch_size=2,
                                   num_workers=4, drop_last=False,
                                   collate_fn=collate))
        assert not any("forking decode workers" in str(r.message)
                       for r in rec)
        assert pf._warned_fork_after_jax is False
        # a loader that actually forks still warns
        (tmp_path / "multi").mkdir()
        tars2 = _make_tars(tmp_path / "multi", n_tars=2, per_tar=4)
        with warnings.catch_warnings(record=True) as rec2:
            warnings.simplefilter("always")
            list(ParallelPILLoader(tars2, _make_iter, batch_size=2,
                                   num_workers=2, drop_last=False,
                                   collate_fn=collate))
        assert any("forking decode workers" in str(r.message)
                   for r in rec2)
    finally:
        pf._warned_fork_after_jax = old


def test_parallel_loader_worker_error_raises(tmp_path):
    tars = _make_tars(tmp_path, n_tars=2, per_tar=4)

    def bad_iter(tars):
        def gen():
            yield {"v": 0}
            raise RuntimeError("worker exploded")
        return gen()

    loader = ParallelPILLoader(tars, bad_iter, batch_size=1, num_workers=2,
                               collate_fn=lambda b: b)
    with pytest.raises(RuntimeError, match="worker"):
        list(loader)


def test_laion_module_uses_parallel_loader(tmp_path):
    """num_workers >= 2 on the PIL lane must produce the same sample SET
    as sequential, through the real Laion400mDataModule preprocess."""
    from PIL import Image

    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.prefetch import (
        ParallelPILLoader as PPL,
        PrefetchLoader as PFL,
    )

    laion = tmp_path / "laion400m"
    laion.mkdir()
    rng = np.random.default_rng(0)
    for s in range(2):
        with tarfile.open(laion / f"{s:05d}.tar", "w") as tf:
            for i in range(6):
                gid = s * 6 + i
                img = Image.fromarray(
                    rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, "JPEG", quality=95)
                ti = tarfile.TarInfo(f"{gid:09d}.jpg")
                ti.size = len(buf.getvalue())
                tf.addfile(ti, io.BytesIO(buf.getvalue()))
                txt = f"caption {gid}".encode()
                tt = tarfile.TarInfo(f"{gid:09d}.txt")
                tt.size = len(txt)
                tf.addfile(tt, io.BytesIO(txt))

    tform = lambda img: np.zeros((4, 4, 3), np.float32)
    mk = lambda workers: DataModuleFactory(
        batch_size=3, num_workers=workers, shuffle_train=False,
        train_transform=tform, test_transform=tform,
        base_path=str(tmp_path)).create("laion400m")

    seq_dm, par_dm = mk(1), mk(4)
    seq_dm.setup(), par_dm.setup()
    seq_loader, par_loader = seq_dm.test_dataloader(), par_dm.test_dataloader()
    assert isinstance(seq_loader, PFL)
    assert isinstance(par_loader, PPL)
    seq_ids = sorted(int(i) for b in seq_loader for i in b["image_id"])
    par_ids = sorted(int(i) for b in par_loader for i in b["image_id"])
    assert seq_ids == par_ids == list(range(12))


def test_parallel_loader_dead_worker_raises_not_hangs(tmp_path):
    """A worker process killed without posting its _end/_err sentinel
    (OOM-kill, segfault in a decoder) must surface as a RuntimeError in
    the consumer instead of a silent forever-hang on queue.get()."""
    import os

    tars = _make_tars(tmp_path, n_tars=2, per_tar=4)

    def dying_iter(tars):
        def gen():
            os._exit(3)  # abrupt death: no sentinel, no cleanup
            yield  # pragma: no cover
        return gen()

    loader = ParallelPILLoader(tars, dying_iter, batch_size=1,
                               num_workers=2, collate_fn=lambda b: b)
    with pytest.raises(RuntimeError, match="died without signaling"):
        list(loader)
