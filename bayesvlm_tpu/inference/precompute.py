"""Feature precompute + disk cache, drop-in compatible with the reference's
cache files (ref:bayesvlm/precompute.py):

    embeddings_img.pt activations_img.pt residuals_img.pt class_ids_img.pt
    image_ids.pt embeddings_txt.pt activations_txt.pt
    activations_{tag}.pt embeddings_{tag}.pt          (hessian stage)

Cache-hit short-circuits mirror the reference exactly, so interrupted runs
resume for free (SURVEY §5 checkpoint/resume contract).

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

from pathlib import Path
from typing import Iterable, List, Optional, Tuple

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
):
    """ref:bayesvlm/precompute.py:68-124. Returns (EncoderResult, class_ids,
    image_ids) as jnp arrays."""
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

    fe, fa, fr = _ChunkedFetcher(), _ChunkedFetcher(), _ChunkedFetcher()
    labels, ids = [], []
    batch_size = None
    for batch in loader:
        images = np.asarray(batch["image"])
        if batch_size is None:
            batch_size = images.shape[0]
        padded, n = _pad_batch(images, batch_size) if images.shape[0] < batch_size else (images, images.shape[0])
        r = image_encoder(jnp.asarray(padded))
        fe.push(r.embeds, n)
        fa.push(r.activations, n)
        fr.push(r.residuals, n)
        labels.append(np.asarray(batch["class_id"]).reshape(-1))
        ids.append(np.asarray(batch["image_id"]).reshape(-1))

    result = EncoderResult(
        embeds=jnp.asarray(fe.concat()),
        activations=jnp.asarray(fa.concat()),
        residuals=jnp.asarray(fr.concat()),
    )
    class_ids = jnp.asarray(np.concatenate(labels))
    img_ids = jnp.asarray(np.concatenate(ids))

    if save_predictions and cache_dir is not None:
        save_pt_array(np.asarray(result.embeds), paths["embeds"])
        save_pt_array(np.asarray(result.activations), paths["activations"])
        save_pt_array(np.asarray(result.residuals), paths["residuals"])
        save_pt_array(np.asarray(class_ids), paths["class_ids"])
        save_pt_array(np.asarray(img_ids), paths["image_ids"])

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
):
    """Streaming feature dump for Hessian estimation
    (ref:bayesvlm/precompute.py:173-205). Returns cache paths (or arrays)."""
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

    fa, fe = _ChunkedFetcher(), _ChunkedFetcher()
    batch_size = None
    for batch in loader:
        if modality == "image":
            images = np.asarray(batch["image"])
            if batch_size is None:
                batch_size = images.shape[0]
            padded, n = _pad_batch(images, batch_size)
            r = encoder(jnp.asarray(padded))
        else:
            texts = batch["text"]
            n = len(texts)
            r = encoder.encode_texts(texts)
        fa.push(r.activations, n)
        fe.push(r.embeds, n)

    activations = fa.concat()
    embeddings = fe.concat()

    if cache_dir is not None:
        save_pt_array(activations, path_activations)
        save_pt_array(embeddings, path_embeddings)
        if not return_tensors:
            return str(path_activations), str(path_embeddings)

    return jnp.asarray(activations), jnp.asarray(embeddings)
