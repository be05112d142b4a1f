"""Atomic persistent-compile-cache writes (utils.harden_compilation_cache).

jax's LRUCache.put writes entries non-atomically; a writer killed mid-write
(bench.py --inner children are timeout-killed) leaves a torn entry whose
deserialization segfaults later readers. The hardening patch swaps in a
tmp-file + os.replace write so entries are either absent or complete.
"""

import os

import pytest

from bayesvlm_tpu.utils import harden_compilation_cache


@pytest.fixture()
def lru_cache(tmp_path):
    harden_compilation_cache()
    from jax._src.lru_cache import LRUCache

    return LRUCache(str(tmp_path / "cache"), max_size=-1)


def test_patch_applied():
    harden_compilation_cache()
    from jax._src.lru_cache import LRUCache

    assert LRUCache.put.__name__ == "_atomic_put"
    # idempotent
    harden_compilation_cache()
    assert LRUCache.put.__name__ == "_atomic_put"


def test_put_get_roundtrip_no_tmp_left(lru_cache):
    lru_cache.put("key1", b"\x00" * 1024)
    assert lru_cache.get("key1") == b"\x00" * 1024
    leftovers = [p for p in lru_cache.path.iterdir() if p.name.endswith(".tmp")]
    assert leftovers == []


def test_existing_entry_not_rewritten(lru_cache):
    lru_cache.put("key1", b"first")
    lru_cache.put("key1", b"second")  # upstream semantics: first write wins
    assert lru_cache.get("key1") == b"first"


def test_failed_write_leaves_nothing(lru_cache, monkeypatch):
    """A crash during the write (stand-in for SIGKILL mid-put) must leave
    neither a torn cache entry nor a stray tmp file."""
    real_replace = os.replace

    def boom(src, dst):
        raise OSError("killed mid-write")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError):
        lru_cache.put("key2", b"payload")
    monkeypatch.setattr(os, "replace", real_replace)
    assert lru_cache.get("key2") is None
    assert [p for p in lru_cache.path.iterdir() if p.name.endswith(".tmp")] == []


def test_empty_key_rejected(lru_cache):
    with pytest.raises(ValueError):
        lru_cache.put("", b"x")
