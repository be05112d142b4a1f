"""Tokenization for the text towers.

Real runs: wrap a HF tokenizer loaded from a *local* snapshot directory
(offline; transformers is only a host-side text codec).

Static shapes: the reference tokenizes CLIP with dynamic padding
(ref:bayesvlm/vlm.py:281) — on TPU every distinct length recompiles the
jitted tower, so we always pad to the model max length. For causal CLIP the
pooled output is taken at the EOS position, and padding after EOS cannot
attend back into the sequence, so the pooled activations are identical; for
SigLIP the reference itself uses padding='max_length' (ref:vlm.py:446).

Tests use `HashTokenizer`, a deterministic stand-in.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class HFTokenizer:
    """Adapter: HF tokenizer -> fixed-length int32 id matrix."""

    def __init__(self, tokenizer, max_length: int, pad_to_max: bool = True):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_to_max = pad_to_max

    @classmethod
    def from_local(cls, path: str, max_length: int) -> "HFTokenizer":
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        return cls(tok, max_length)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer(
            text=list(texts),
            padding="max_length" if self.pad_to_max else True,
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


class HashTokenizer:
    """Deterministic test tokenizer: hashes whitespace tokens into the
    vocab, wraps with BOS/EOS, pads with EOS-id like CLIP's tokenizer."""

    def __init__(self, vocab_size: int, max_length: int, bos_id: int = 0,
                 eos_id: int = None):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos_id = bos_id
        self.eos_id = eos_id if eos_id is not None else vocab_size - 1

    def _tok(self, text: str) -> List[int]:
        import hashlib

        ids = [self.bos_id]
        for w in text.lower().split():
            # Stable digest, not Python hash(): hash() is randomized per
            # process (PYTHONHASHSEED), which made "deterministic" test
            # inputs vary across runs.
            h = int.from_bytes(
                hashlib.md5(w.encode()).digest()[:4], "little"
            ) % (self.vocab_size - 2)
            ids.append(1 + h)
        ids = ids[: self.max_length - 1]
        ids.append(self.eos_id)
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eos_id, np.int32)
        for i, t in enumerate(texts):
            ids = self._tok(t)
            out[i, : len(ids)] = ids
        return out
