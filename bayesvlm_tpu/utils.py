"""Glue helpers mirroring ref:bayesvlm/utils.py."""

from __future__ import annotations

from typing import Tuple

from bayesvlm_tpu.constants import MODEL_NAME_MAP


def get_model_type_and_size(model_str: str) -> Tuple[str, str]:
    """'clip-base' -> ('clip', 'base')  (ref:bayesvlm/utils.py:6-8)."""
    name, size = model_str.split("-", 1)
    return name, size


def get_image_size(model_str: str) -> int:
    _, _, size = MODEL_NAME_MAP[model_str]
    return size


def get_model_url(model_str: str) -> str:
    provider, model_id, _ = MODEL_NAME_MAP[model_str]
    return f"{provider}/{model_id}"


def get_likelihood(model_type: str) -> str:
    """'clip' -> info_nce, anything else -> siglip
    (ref:bayesvlm/utils.py:23-26).

    Also accepts a full model name ('tiny-siglip', 'clip-base'): names in
    the config registry resolve through their family, so the tiny test
    variants map to their family's likelihood. A bare 'tiny' is ambiguous
    (tiny-clip vs tiny-siglip) and raises.
    """
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    if model_type in CONFIGS_BY_NAME:
        return get_likelihood_for_model(model_type)
    if model_type == "tiny":
        raise ValueError(
            "'tiny' is ambiguous (tiny-clip vs tiny-siglip); pass the full "
            "model name or use get_likelihood_for_model()"
        )
    return "info_nce" if model_type == "clip" else "siglip"


def get_likelihood_for_model(model_str: str) -> str:
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    family = CONFIGS_BY_NAME[model_str].family
    return "info_nce" if family == "clip" else "siglip"


def apply_device_flag(device: str) -> None:
    """Honor the reference CLI's --device flag (ref: e.g. zeroshot.py:140).

    "cpu" forces the CPU platform (jax.config, since the JAX_PLATFORMS env
    var can be overridden by accelerator plugins); "tpu"/"cuda"/"mps" and
    anything else keep the default platform resolution (TPU when present).
    Must be called before the JAX backend initializes.
    """
    if device == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; leave platform as-is


_cache_hardened = False


def harden_compilation_cache() -> None:
    """Make jax's persistent compile-cache writes atomic (tmp + os.replace).

    jax 0.9's ``LRUCache.put`` writes entries with ``Path.write_bytes`` —
    not atomic. A writer killed mid-write (bench.py's timeout-bounded
    ``--inner`` children are killed exactly like this) leaves a torn entry
    on disk, and a concurrent reader in another process can see a partial
    file; either way ``backend.deserialize_executable`` SEGFAULTS on
    truncated bytes (observed twice in full-suite runs at
    ``compilation_cache.get_executable_and_time``). Writing to a temp file
    in the same directory and ``os.replace``-ing it in makes every entry
    either absent or complete.

    Idempotent; call before the first jit in any process that enables
    ``jax_compilation_cache_dir``. No-ops (with a warning) if jax's cache
    internals have moved.
    """
    global _cache_hardened
    if _cache_hardened:
        return
    try:
        import os
        import time
        import uuid
        import warnings

        from jax._src import lru_cache as _lru

        cache_suffix = _lru._CACHE_SUFFIX
        atime_suffix = _lru._ATIME_SUFFIX

        def _atomic_put(self, key, val):
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                warnings.warn(
                    f"Cache value for key {key!r} of size {len(val)} bytes "
                    f"exceeds the maximum cache size of {self.max_size} bytes"
                )
                return
            cache_path = self.path / f"{key}{cache_suffix}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                tmp_path = self.path / f"{key}.{uuid.uuid4().hex}.tmp"
                try:
                    tmp_path.write_bytes(val)
                    os.replace(tmp_path, cache_path)
                except BaseException:
                    tmp_path.unlink(missing_ok=True)
                    raise
                if self.eviction_enabled:
                    timestamp = time.time_ns().to_bytes(8, "little")
                    atime_path = self.path / f"{key}{atime_suffix}"
                    atime_path.write_bytes(timestamp)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        _lru.LRUCache.put = _atomic_put
        _cache_hardened = True
    except Exception as exc:  # jax internals moved: keep non-atomic writes
        import warnings

        warnings.warn(
            f"harden_compilation_cache: could not patch jax LRUCache "
            f"({exc!r}); persistent-cache writes stay non-atomic"
        )
