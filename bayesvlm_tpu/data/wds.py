"""Minimal webdataset: tar-shard streaming without the `webdataset`
package (not in this image).

Implements the subset the reference uses (ref:bayesvlm/data/laion400m.py,
imagenet_wds.py): iterate `.tar` shards, group members by key (basename
before the first dot), decode by extension, skip corrupt samples with a
warning (`warn_and_continue` semantics, ref:laion400m.py:68,74), optional
shuffle buffer, map/preprocess, batched iteration with drop_last.

Multi-host: `shard_slice(host_id, num_hosts)` assigns tar files modulo host
(the SPMD input pipeline from SURVEY §5 — tar-file modulo host id,
mirroring the reference's `dm.data_path[:num_files]` slicing).
"""

from __future__ import annotations

import io
import json
import tarfile
import warnings
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from bayesvlm_tpu.data.loader import default_collate


def _decode_member(name: str, data: bytes):
    ext = name.split(".", 1)[1] if "." in name else ""
    if ext in ("jpg", "jpeg", "png", "webp"):
        return data  # decoded lazily by the preprocess fn
    if ext == "txt":
        return data
    if ext == "json":
        return json.loads(data)
    if ext == "cls":
        return int(data)
    return data


def iterate_tar_samples_native(tar_path) -> Iterator[Dict]:
    """Native-indexed variant of iterate_tar_samples: one C pass builds the
    member index, then members are pread directly (no per-header Python).
    Same output contract."""
    from bayesvlm_tpu.data import native_io

    entries = native_io.tar_index(tar_path)
    current_key = None
    sample: Dict = {}
    for name, offset, size in entries:
        base = Path(name).name
        if "." not in base:
            continue
        key, ext = base.split(".", 1)
        if current_key is not None and key != current_key:
            if sample:
                sample["__key__"] = current_key
                yield sample
            sample = {}
        current_key = key
        try:
            data = native_io.read_member(tar_path, offset, size)
            sample[ext] = _decode_member(base, data)
        except Exception as e:  # warn_and_continue
            warnings.warn(f"skipping corrupt member {name}: {e}")
    if sample and current_key is not None:
        sample["__key__"] = current_key
        yield sample


def iterate_tar_samples(tar_path) -> Iterator[Dict]:
    """Yield {__key__, ext: bytes/obj} groups from one tar shard."""
    with tarfile.open(tar_path, "r") as tf:
        current_key = None
        sample: Dict = {}
        for member in tf:
            if not member.isfile():
                continue
            base = Path(member.name).name
            if "." not in base:
                continue
            key, ext = base.split(".", 1)
            if current_key is not None and key != current_key:
                if sample:
                    sample["__key__"] = current_key
                    yield sample
                sample = {}
            current_key = key
            try:
                data = tf.extractfile(member).read()
                sample[ext] = _decode_member(base, data)
            except Exception as e:  # warn_and_continue
                warnings.warn(f"skipping corrupt member {member.name}: {e}")
        if sample and current_key is not None:
            sample["__key__"] = current_key
            yield sample


class WebDataset:
    """Iterable dataset over tar shards with map/shuffle, warn-and-continue."""

    def __init__(
        self,
        tar_paths: Sequence,
        shuffle_buffer: int = 0,
        seed: int = 0,
        map_fn: Optional[Callable] = None,
        use_native: Optional[bool] = None,
    ):
        self.tar_paths = [str(p) for p in tar_paths]
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.map_fn = map_fn
        if use_native is None:
            try:
                from bayesvlm_tpu.data import native_io

                use_native = native_io.available()
            except Exception:
                use_native = False
        self.use_native = use_native

    def shard_slice(self, host_id: int, num_hosts: int) -> "WebDataset":
        """Deterministic per-host tar assignment (canonical sorted order)."""
        shards = sorted(self.tar_paths)[host_id::num_hosts]
        return WebDataset(
            shards, self.shuffle_buffer, self.seed, self.map_fn, self.use_native
        )

    def _raw_iter(self) -> Iterator[Dict]:
        iter_fn = iterate_tar_samples_native if self.use_native else iterate_tar_samples
        for tar in self.tar_paths:
            try:
                yield from iter_fn(tar)
            except Exception as e:  # corrupt shard: skip entirely
                warnings.warn(f"skipping corrupt shard {tar}: {e}")

    def __iter__(self) -> Iterator[Dict]:
        it = self._raw_iter()
        if self.shuffle_buffer > 1:
            it = _buffered_shuffle(it, self.shuffle_buffer, self.seed)
        for sample in it:
            if self.map_fn is not None:
                try:
                    yield self.map_fn(sample)
                except Exception as e:  # warn_and_continue on decode errors
                    warnings.warn(f"skipping sample {sample.get('__key__')}: {e}")
            else:
                yield sample


def _buffered_shuffle(it, bufsize: int, seed: int):
    rng = np.random.default_rng(seed)
    buf: List = []
    for x in it:
        buf.append(x)
        if len(buf) >= bufsize:
            i = int(rng.integers(len(buf)))
            buf[i], buf[-1] = buf[-1], buf[i]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


class IterableLoader:
    """Batched iteration over an iterable dataset (drop_last semantics of
    ref:laion400m.py:79-92)."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = True,
                 collate_fn: Callable = default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.collate_fn = collate_fn

    def __iter__(self):
        batch = []
        for sample in self.dataset:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []
        if batch and not self.drop_last:
            yield self.collate_fn(batch)


class NativeDecodeLoader:
    """Batched iteration with the native (C++) JPEG decode lane.

    Consumes RAW samples (map_fn=None WebDataset), groups `batch_size`
    jpg members, and decodes+resizes+normalizes them in one multithreaded
    native call (native/bvt_io.cc) straight into a float32 NHWC batch.

    EXPLICIT OPT-IN: the native resampler is bilinear, not the reference's
    bicubic (measured embedding delta recorded in BASELINE.md); PIL remains
    the default everywhere. Samples whose decode fails are dropped with a
    warning (warn_and_continue semantics, ref:laion400m.py:68,74), so a
    batch may come up short.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        image_size: int,
        mean: Sequence[float],
        std: Sequence[float],
        square_resize: bool = False,
        drop_last: bool = True,
        num_threads: int = 8,
        out_uint8: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.mean = tuple(mean)
        self.std = tuple(std)
        self.square_resize = square_resize
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.out_uint8 = out_uint8

    @staticmethod
    def _jpg_of(sample):
        # webdataset members may be named *.jpg or *.jpeg (the PIL lane's
        # _preprocess in imagenet.py accepts both)
        return sample.get("jpg", sample.get("jpeg"))

    @staticmethod
    def _image_id_of(key) -> int:
        """int(__key__) per the LAION contract (ref:laion400m.py map);
        non-numeric keys (e.g. 'n01440764_10026') fall back to a stable
        content hash instead of killing the stream."""
        try:
            return int(key)
        except (TypeError, ValueError):
            import zlib

            return zlib.crc32(str(key).encode("utf-8"))

    def _emit(self, samples):
        from bayesvlm_tpu.data import native_io

        if self.out_uint8:
            # device-normalize lane: raw uint8 crops out; the encoder
            # applies /255 + mean/std in-graph (see decode_batch_u8)
            imgs, status = native_io.decode_batch_u8(
                [self._jpg_of(s) for s in samples],
                self.image_size,
                square_resize=self.square_resize,
                num_threads=self.num_threads,
            )
        else:
            imgs, status = native_io.decode_batch(
                [self._jpg_of(s) for s in samples],
                self.image_size, self.mean, self.std,
                square_resize=self.square_resize, num_threads=self.num_threads,
            )
        keep = status == 0
        for s, st in zip(samples, status):
            if st != 0:
                warnings.warn(
                    f"skipping sample {s.get('__key__')}: native decode "
                    f"failed (status {int(st)})"
                )
        kept = [s for s, k in zip(samples, keep) if k]
        if not kept:
            return None
        out = {"image": imgs[keep]}
        if "txt" in kept[0]:
            out["text"] = [s["txt"].decode("utf-8") for s in kept]
        out["image_id"] = np.asarray(
            [self._image_id_of(s["__key__"]) for s in kept])
        if "cls" in kept[0]:
            out["class_id"] = np.asarray([int(s["cls"]) for s in kept])
        return out

    def __iter__(self):
        batch: List[Dict] = []
        for sample in self.dataset:
            if self._jpg_of(sample) is None:
                warnings.warn(
                    f"skipping sample {sample.get('__key__')}: no jpg/jpeg "
                    f"member"
                )
                continue
            batch.append(sample)
            if len(batch) == self.batch_size:
                out = self._emit(batch)
                if out is not None:
                    yield out
                batch = []
        if batch and not self.drop_last:
            out = self._emit(batch)
            if out is not None:
                yield out


def decode_image(data: bytes) -> Image.Image:
    return Image.open(io.BytesIO(data))
