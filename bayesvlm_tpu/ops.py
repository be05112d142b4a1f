"""TPU-shaped primitive helpers shared across subsystems.

topk_exact: `jax.lax.top_k` lowers to a full per-row sort on TPU, which
dominates the probabilistic-kNN step at reference AL scale (measured:
85.1 ms for a [512, 100k] top-160 vs ~6 ms for the similarity GEMMs
that produce it — see BASELINE.md). The two-stage form bounds the sort
width: per-chunk top-k, then top-k over the `chunks*k` concatenated
candidates. Exact, because every global top-k element is necessarily in
its own chunk's top-k; tie-breaking matches `lax.top_k` (stable by
index — per-chunk top-k preserves in-chunk index order and chunks are
concatenated in index order, so the second top-k sees candidates in
global index order). Measured on chip at [512, 100k] k=160: chunks
16/64/128/256 -> 41.6/30.9/35.3/47.7 ms vs 85.1 ms single-stage.

No reference counterpart (ref:bayesvlm/knn.py:92 uses torch.topk on a
single GPU); this is a TPU lowering detail, not a semantic change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_exact(x: jax.Array, k: int):
    """Exact top-k over the last axis of a 1-D or 2-D array.

    Returns (values, indices), identical to `jax.lax.top_k(x, k)`
    including tie order. Uses a two-stage chunked lowering when the row
    width makes it profitable; falls back to `lax.top_k` otherwise.

    The -inf width padding can never surface in the result, even for
    rows with fewer than k finite entries (or none): pads live only at
    the tail of the LAST chunk, `lax.top_k` is stable by index on ties,
    and the last chunk always holds >= k real lanes (pad <= chunks-1
    <= 63 while chunk width >= max(8k, 1024)), so real -inf lanes
    outrank pads in stage 1 and every returned index is < n — verified
    by tests/test_ops_topk.py::test_fewer_than_k_finite_entries. NaN
    inputs are unspecified, exactly as for `lax.top_k`.
    """
    n = x.shape[-1]
    if k >= n or not jnp.issubdtype(x.dtype, jnp.floating):
        return jax.lax.top_k(x, k)
    # chunk-width target ~8k (first-stage sorts dominate below that,
    # second-stage candidate sorts above it); cap 64 chunks (measured
    # sweet spot at reference scale)
    chunks = max(1, min(n // max(8 * k, 1024), 64))
    if chunks < 2 or chunks * k >= n:
        return jax.lax.top_k(x, k)

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    rows = x.shape[0]
    pad = (-n) % chunks
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    width = x.shape[-1] // chunks
    xr = x.reshape(rows, chunks, width)
    v, i = jax.lax.top_k(xr, k)                            # [rows, chunks, k]
    gi = i + (jnp.arange(chunks, dtype=i.dtype) * width)[None, :, None]
    v2, i2 = jax.lax.top_k(v.reshape(rows, chunks * k), k)
    ids = jnp.take_along_axis(gi.reshape(rows, chunks * k), i2, axis=-1)
    if squeeze:
        return v2[0], ids[0]
    return v2, ids
