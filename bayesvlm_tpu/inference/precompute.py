"""Feature precompute + disk cache, drop-in compatible with the reference's
cache files (ref:bayesvlm/precompute.py):

    embeddings_img.pt activations_img.pt residuals_img.pt class_ids_img.pt
    image_ids.pt embeddings_txt.pt activations_txt.pt
    activations_{tag}.pt embeddings_{tag}.pt          (hessian stage)

Cache-hit short-circuits mirror the reference exactly, so interrupted runs
resume for free (SURVEY §5 checkpoint/resume contract). Beyond the
reference's whole-artifact gating, `checkpoint_every=k` writes the
accumulated features as atomic part files every k batches
(`<cache_dir>/_parts_<tag>/part_*.npz`, tmp+rename): a preempted pass
resumes from the last completed part — already-encoded samples are never
re-encoded, the loader is fast-forwarded by exact sample count (works
mid-batch), and the final `.pt` files are byte-identical to an
uninterrupted run. Parts are deleted once the final files land.
Requires a deterministic loader order (Stage-1 uses shuffle_train=False).

TPU notes: the encoder forward is jitted with static batch shape; the final
partial batch is padded to the batch size and trimmed on host, so each
tower compiles exactly once per batch size. Result fetches are DEFERRED
and chunked (_ChunkedFetcher): per-batch np.asarray would force a host
sync every step (measured ~0.4 s/batch of pure round-trip latency on the
tunneled dev chip vs 85 ms of compute), so device results accumulate
async and are pulled every `fetch_every` batches — the input pipeline
(data/prefetch.py) keeps decoding while the device runs ahead.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array
from bayesvlm_tpu.types import EncoderResult


def _np_result(parts_e, parts_a, parts_r) -> EncoderResult:
    return EncoderResult(
        embeds=jnp.asarray(np.concatenate(parts_e, axis=0)),
        activations=jnp.asarray(np.concatenate(parts_a, axis=0)),
        residuals=jnp.asarray(np.concatenate(parts_r, axis=0)),
    )


def _pad_batch(x: np.ndarray, size: int) -> Tuple[np.ndarray, int]:
    """Pad short batches up to `size` (repeat last row; callers slice the
    result back to n). A batch LARGER than `size` passes through at its
    own size — with native-decode loaders the first batch can come up
    short (failed decodes are dropped), so `size` locked from it must
    not crash every later full batch."""
    n = x.shape[0]
    if n >= size:
        return x, n
    pad = np.repeat(x[-1:], size - n, axis=0)
    return np.concatenate([x, pad], axis=0), n


class _ChunkedFetcher:
    """Accumulate per-batch device arrays and fetch them host-side every
    `fetch_every` batches (bounded device memory, one sync per chunk
    instead of one per batch). `push` takes (device_array, n_valid)."""

    def __init__(self, fetch_every: int = 16):
        self.fetch_every = fetch_every
        self._pending: List = []
        self.parts: List[np.ndarray] = []

    def push(self, arr, n: int):
        self._pending.append((arr, n))
        if len(self._pending) >= self.fetch_every:
            self.drain()

    def drain(self):
        for arr, n in self._pending:
            self.parts.append(np.asarray(arr)[:n])
        self._pending = []

    def concat(self) -> np.ndarray:
        self.drain()
        return np.concatenate(self.parts, axis=0)


class _PartedAccumulator:
    """Crash-durable accumulation of named per-batch array streams.

    Wraps one ``_ChunkedFetcher`` per key. With a ``parts_dir`` set, every
    :meth:`flush` writes the rows accumulated since the last flush as one
    atomic ``part_{k:05d}.npz`` (tmp + ``os.replace``); a new instance
    pointed at the same directory resumes with those rows preloaded and
    reports how many samples are already done (``resumed_rows``), letting
    the caller fast-forward its loader. No cursor file: the part files ARE
    the cursor (a torn write cannot exist past the rename)."""

    def __init__(self, keys, parts_dir: Optional[Path], fetch_every: int = 16):
        self.keys = list(keys)
        self.parts_dir = Path(parts_dir) if parts_dir is not None else None
        self.fetchers: Dict[str, _ChunkedFetcher] = {
            k: _ChunkedFetcher(fetch_every) for k in self.keys
        }
        self._flushed_segments = 0  # entries of each fetcher.parts on disk
        self._next_part = 0
        self.resumed_rows = 0
        if self.parts_dir is not None and self.parts_dir.exists():
            files = sorted(self.parts_dir.glob("part_*.npz"))
            for p in files:
                with np.load(p) as z:
                    for k in self.keys:
                        self.fetchers[k].parts.append(z[k])
            if files:
                self.resumed_rows = sum(
                    a.shape[0] for a in self.fetchers[self.keys[0]].parts
                )
                self._flushed_segments = len(files)
                self._next_part = len(files)

    def push(self, key: str, arr, n: int):
        self.fetchers[key].push(arr, n)

    def flush(self):
        """Write everything accumulated since the last flush as one part."""
        if self.parts_dir is None:
            return
        for f in self.fetchers.values():
            f.drain()
        seg = self._flushed_segments
        ref = self.fetchers[self.keys[0]].parts
        if len(ref) == seg:
            return  # nothing new
        arrays = {
            k: np.concatenate(self.fetchers[k].parts[seg:], axis=0)
            for k in self.keys
        }
        self.parts_dir.mkdir(parents=True, exist_ok=True)
        tmp = self.parts_dir / f".part_{self._next_part:05d}.tmp.npz"
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, self.parts_dir / f"part_{self._next_part:05d}.npz")
        self._next_part += 1
        self._flushed_segments = len(ref)

    def concat(self, key: str) -> np.ndarray:
        return self.fetchers[key].concat()

    def cleanup(self):
        """Remove the parts directory once the final artifacts are durable."""
        if self.parts_dir is not None and self.parts_dir.exists():
            shutil.rmtree(self.parts_dir)


def _skip_done(arr_or_list, consumed: int, skip: int):
    """Fast-forward helper: given a batch and the resume cursor, return
    (remaining_batch_or_None, new_consumed) where `remaining` is the
    suffix of rows not yet encoded (None if the whole batch is done)."""
    n = len(arr_or_list)
    if consumed >= skip:
        return arr_or_list, consumed
    take = min(n, skip - consumed)
    consumed += take
    if take == n:
        return None, consumed
    return arr_or_list[take:], consumed


def encode_images_batched(image_encoder, images: np.ndarray, batch_size: int) -> EncoderResult:
    """Fixed-shape batched encoding with last-batch padding."""
    parts_e, parts_a, parts_r = [], [], []
    N = images.shape[0]
    for start in range(0, N, batch_size):
        batch = images[start : start + batch_size]
        padded, n = _pad_batch(batch, batch_size)
        r = image_encoder(jnp.asarray(padded))
        parts_e.append(np.asarray(r.embeds[:n]))
        parts_a.append(np.asarray(r.activations[:n]))
        parts_r.append(np.asarray(r.residuals[:n]))
    return _np_result(parts_e, parts_a, parts_r)


def precompute_image_features(
    image_encoder,
    loader: Iterable,
    save_predictions: bool = False,
    cache_dir: Optional[Path] = None,
    checkpoint_every: Optional[int] = None,
):
    """ref:bayesvlm/precompute.py:68-124. Returns (EncoderResult, class_ids,
    image_ids) as jnp arrays.

    ``checkpoint_every=k`` (with ``save_predictions``) chunks the cache into
    atomic part files every k batches so a preempted pass resumes without
    re-encoding (module docstring)."""
    if save_predictions and cache_dir is None:
        raise ValueError("cache_dir must be provided if save_predictions is True")

    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        paths = {
            "embeds": cache_dir / "embeddings_img.pt",
            "activations": cache_dir / "activations_img.pt",
            "residuals": cache_dir / "residuals_img.pt",
            "class_ids": cache_dir / "class_ids_img.pt",
            "image_ids": cache_dir / "image_ids.pt",
        }
        if all(p.exists() for p in paths.values()):
            result = EncoderResult(
                embeds=jnp.asarray(load_pt_array(paths["embeds"])),
                activations=jnp.asarray(load_pt_array(paths["activations"])),
                residuals=jnp.asarray(load_pt_array(paths["residuals"])),
            )
            class_ids = jnp.asarray(load_pt_array(paths["class_ids"]))
            img_ids = jnp.asarray(load_pt_array(paths["image_ids"]))
            return result, class_ids, img_ids
        if save_predictions:
            cache_dir.mkdir(parents=True, exist_ok=True)

    keys = ("embeds", "activations", "residuals", "class_ids", "image_ids")
    parts_dir = (
        cache_dir / "_parts_img"
        if checkpoint_every and save_predictions and cache_dir is not None
        else None
    )
    acc = _PartedAccumulator(keys, parts_dir)
    skip, consumed = acc.resumed_rows, 0
    batch_size = None
    batches_since_flush = 0
    for batch in loader:
        images = np.asarray(batch["image"])
        labels = np.asarray(batch["class_id"]).reshape(-1)
        img_ids_b = np.asarray(batch["image_id"]).reshape(-1)
        images, _ = _skip_done(images, consumed, skip)
        labels, _ = _skip_done(labels, consumed, skip)
        img_ids_b, consumed = _skip_done(img_ids_b, consumed, skip)
        if images is None:
            continue
        if batch_size is None:
            batch_size = images.shape[0]
        padded, n = _pad_batch(images, batch_size) if images.shape[0] < batch_size else (images, images.shape[0])
        r = image_encoder(jnp.asarray(padded))
        consumed += n
        acc.push("embeds", r.embeds, n)
        acc.push("activations", r.activations, n)
        acc.push("residuals", r.residuals, n)
        acc.push("class_ids", labels, n)
        acc.push("image_ids", img_ids_b, n)
        batches_since_flush += 1
        if parts_dir is not None and batches_since_flush >= checkpoint_every:
            acc.flush()
            batches_since_flush = 0

    result = EncoderResult(
        embeds=jnp.asarray(acc.concat("embeds")),
        activations=jnp.asarray(acc.concat("activations")),
        residuals=jnp.asarray(acc.concat("residuals")),
    )
    class_ids = jnp.asarray(acc.concat("class_ids"))
    img_ids = jnp.asarray(acc.concat("image_ids"))

    if save_predictions and cache_dir is not None:
        save_pt_array(np.asarray(result.embeds), paths["embeds"])
        save_pt_array(np.asarray(result.activations), paths["activations"])
        save_pt_array(np.asarray(result.residuals), paths["residuals"])
        save_pt_array(np.asarray(class_ids), paths["class_ids"])
        save_pt_array(np.asarray(img_ids), paths["image_ids"])
        acc.cleanup()

    return result, class_ids, img_ids


def precompute_text_features(
    text_encoder,
    class_prompts: List[str],
    batch_size: int,
    save_predictions: bool = False,
    cache_dir: Optional[Path] = None,
) -> EncoderResult:
    """ref:bayesvlm/precompute.py:127-168."""
    if cache_dir is None and save_predictions:
        raise ValueError("cache_dir must be provided if save_predictions is True")

    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        embeds_path = cache_dir / "embeddings_txt.pt"
        activations_path = cache_dir / "activations_txt.pt"
        if embeds_path.exists() and activations_path.exists():
            return EncoderResult.create(
                embeds=jnp.asarray(load_pt_array(embeds_path)),
                activations=jnp.asarray(load_pt_array(activations_path)),
            )

    parts_e, parts_a = [], []
    for start in range(0, len(class_prompts), batch_size):
        chunk = class_prompts[start : start + batch_size]
        r = text_encoder.encode_texts(chunk)
        parts_e.append(np.asarray(r.embeds))
        parts_a.append(np.asarray(r.activations))

    embeds = np.concatenate(parts_e, axis=0)
    activations = np.concatenate(parts_a, axis=0)

    if save_predictions and cache_dir is not None:
        cache_dir.mkdir(parents=True, exist_ok=True)
        save_pt_array(embeds, embeds_path)
        save_pt_array(activations, activations_path)

    return EncoderResult.create(
        embeds=jnp.asarray(embeds), activations=jnp.asarray(activations)
    )


def compute_features(
    encoder,
    loader: Iterable,
    tag: str = None,
    cache_dir: Optional[str] = None,
    return_tensors: bool = False,
    modality: str = "image",
    checkpoint_every: Optional[int] = None,
):
    """Streaming feature dump for Hessian estimation
    (ref:bayesvlm/precompute.py:173-205). Returns cache paths (or arrays).

    ``checkpoint_every=k`` (with a ``cache_dir``) makes the pass
    preemption-survivable: accumulated rows land in atomic part files every
    k batches and a restarted call resumes after the last completed part —
    skipped samples are never re-encoded (module docstring)."""
    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        path_activations = cache_dir / f"activations_{tag}.pt"
        path_embeddings = cache_dir / f"embeddings_{tag}.pt"
        if path_activations.exists() and path_embeddings.exists():
            if return_tensors:
                return (
                    jnp.asarray(load_pt_array(path_activations)),
                    jnp.asarray(load_pt_array(path_embeddings)),
                )
            return str(path_activations), str(path_embeddings)

    parts_dir = (
        cache_dir / f"_parts_{tag}"
        if checkpoint_every and cache_dir is not None
        else None
    )
    acc = _PartedAccumulator(("activations", "embeddings"), parts_dir)
    skip, consumed = acc.resumed_rows, 0
    batch_size = None
    batches_since_flush = 0
    for batch in loader:
        if modality == "image":
            images = np.asarray(batch["image"])
            images, consumed = _skip_done(images, consumed, skip)
            if images is None:
                continue
            if batch_size is None:
                batch_size = images.shape[0]
            padded, n = _pad_batch(images, batch_size)
            r = encoder(jnp.asarray(padded))
        else:
            texts = batch["text"]
            texts, consumed = _skip_done(texts, consumed, skip)
            if texts is None:
                continue
            n = len(texts)
            r = encoder.encode_texts(texts)
        consumed += n
        acc.push("activations", r.activations, n)
        acc.push("embeddings", r.embeds, n)
        batches_since_flush += 1
        if parts_dir is not None and batches_since_flush >= checkpoint_every:
            acc.flush()
            batches_since_flush = 0

    activations = acc.concat("activations")
    embeddings = acc.concat("embeddings")

    if cache_dir is not None:
        save_pt_array(activations, path_activations)
        save_pt_array(embeddings, path_embeddings)
        acc.cleanup()
        if not return_tensors:
            return str(path_activations), str(path_embeddings)
    else:
        acc.cleanup()

    return jnp.asarray(activations), jnp.asarray(embeddings)
