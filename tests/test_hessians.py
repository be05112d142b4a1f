"""Unit tests for the GEMM-reformulated analytic GGN Hessians.

The reference formulas (ref:bayesvlm/hessians.py:10-117) are re-derived here
*naively* in NumPy — per-sample [D, D] Jacobian sandwiches — and compared to
the reformulated implementation, which must match to float tolerance.
An autodiff cross-check validates the math itself against
d^2/dx^2 of the actual losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.bayes.hessians import (
    activation_gram,
    hessian_infonce,
    hessian_siglip,
)


def naive_infonce_hessian(src, tgt, logit_scale):
    """Direct transliteration of the math (per-sample J sandwiches)."""
    src = np.asarray(src, np.float64)
    tgt = np.asarray(tgt, np.float64)
    s = float(logit_scale)
    rn = np.linalg.norm(src, axis=-1, keepdims=True)
    U = src / rn
    Y = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    logits = U @ Y.T * np.exp(s)
    P = np.exp(logits - logits.max(-1, keepdims=True))
    P /= P.sum(-1, keepdims=True)
    D = src.shape[1]
    H = np.zeros((D, D))
    for b in range(src.shape[0]):
        J_diag = (Y * P[b][:, None]).T @ Y
        q = Y.T @ P[b]
        J_pp = np.outer(q, q)
        J_norm = np.eye(D) / rn[b] - np.outer(src[b], src[b]) / rn[b] ** 3
        H += J_norm @ (J_diag - J_pp) @ J_norm.T * np.exp(s) ** 2
    return H


def naive_siglip_hessian(x, idx, y, logit_scale, logit_bias):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    s, bias = float(logit_scale), float(logit_bias)
    rn = np.linalg.norm(x, axis=-1, keepdims=True)
    U = x / rn
    Yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    logits = U @ Yn.T * np.exp(s) + bias
    N = y.shape[0]
    labels = (2 * np.eye(N) - 1)[np.asarray(idx)]
    sig = 1 / (1 + np.exp(-logits * labels))
    C = np.exp(s) ** 2 * sig * (1 - sig)
    D = x.shape[1]
    H = np.zeros((D, D))
    for b in range(x.shape[0]):
        M = (Yn * C[b][:, None]).T @ Yn
        J_norm = np.eye(D) / rn[b] - np.outer(x[b], x[b]) / rn[b] ** 3
        H += J_norm @ M @ J_norm.T
    return H


@pytest.mark.parametrize("B,C,D", [(7, 11, 6), (16, 16, 8)])
def test_infonce_matches_naive(B, C, D):
    rng = np.random.default_rng(0)
    src = rng.normal(size=(B, D)).astype(np.float32)
    tgt = rng.normal(size=(C, D)).astype(np.float32)
    scale = np.float32(1.3)
    expected = naive_infonce_hessian(src, tgt, scale)
    got = np.asarray(hessian_infonce(src, tgt, scale))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_infonce_blocked_equals_unblocked():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(13, 6)).astype(np.float32)
    tgt = rng.normal(size=(9, 6)).astype(np.float32)
    full = np.asarray(hessian_infonce(src, tgt, 0.7))
    blocked = np.asarray(hessian_infonce(src, tgt, 0.7, block_size=4))
    np.testing.assert_allclose(blocked, full, rtol=1e-5, atol=1e-5)


def test_infonce_single_sample_ggn_identity_fp64():
    """Single-sample identity GGN = J_norm (e^{2s} Y^T (diag(p)-pp^T) Y)
    J_norm^T, evaluated in float64. The fp32 implementation must track the
    float64 truth to ~1e-6 — tighter than a naive fp32 evaluation of the
    same formula, which suffers cancellation in J_diag - J_pp."""
    rng = np.random.default_rng(2)
    D, C = 5, 8
    x = rng.normal(size=(D,))
    tgt = rng.normal(size=(C, D))
    s = 0.9

    Y = tgt / np.linalg.norm(tgt, axis=-1, keepdims=True)
    u = x / np.linalg.norm(x)
    logits = Y @ u * np.exp(s)
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    ggn_norm = ((Y * p[:, None]).T @ Y - np.outer(Y.T @ p, Y.T @ p)) * np.exp(s) ** 2
    r = np.linalg.norm(x)
    J_norm = np.eye(D) / r - np.outer(x, x) / r**3
    expected = J_norm @ ggn_norm @ J_norm.T

    got = hessian_infonce(
        x[None, :].astype(np.float32), tgt.astype(np.float32), np.float32(s)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,N,D", [(6, 10, 5), (8, 8, 7)])
def test_siglip_matches_naive(B, N, D):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, D)).astype(np.float32)
    y = rng.normal(size=(N, D)).astype(np.float32)
    idx = rng.integers(0, N, size=B)
    scale, bias = np.float32(0.8), np.float32(-1.2)
    expected = naive_siglip_hessian(x, idx, y, scale, bias)
    got = np.asarray(hessian_siglip(x, idx, y, scale, bias))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_siglip_blocked_equals_unblocked():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(11, 4)).astype(np.float32)
    y = rng.normal(size=(6, 4)).astype(np.float32)
    idx = rng.integers(0, 6, size=11)
    full = np.asarray(hessian_siglip(x, idx, y, 0.5, 0.1))
    blocked = np.asarray(hessian_siglip(x, idx, y, 0.5, 0.1, block_size=3))
    np.testing.assert_allclose(blocked, full, rtol=1e-5, atol=1e-5)


def test_activation_gram():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(10, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(activation_gram(a)), a.T @ a, rtol=1e-5, atol=1e-5
    )
    with_bias = np.asarray(activation_gram(a, append_bias_column=True))
    assert with_bias.shape == (5, 5)
    a1 = np.concatenate([a, np.ones((10, 1), np.float32)], axis=1)
    np.testing.assert_allclose(with_bias, a1.T @ a1, rtol=1e-5, atol=1e-5)


def test_siglip_chunk_j_invariance():
    """--siglip_chunk_size semantics: target-axis chunking must not change
    the GGN (incl. a non-divising chunk size exercising the padded tail)."""
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.hessians import hessian_siglip

    rng = np.random.default_rng(7)
    B, N, D = 12, 23, 6
    x = rng.normal(size=(B, D)).astype(np.float32)
    y = rng.normal(size=(N, D)).astype(np.float32)
    idx = rng.integers(0, N, size=B).astype(np.int32)
    scale, bias = jnp.float32(1.2), jnp.float32(-0.7)

    full = np.asarray(hessian_siglip(x, idx, y, scale, bias))
    for chunk in (4, 7, 23, 100):
        chunked = np.asarray(
            hessian_siglip(x, idx, y, scale, bias, chunk_size_j=chunk)
        )
        np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-5)
    both = np.asarray(
        hessian_siglip(x, idx, y, scale, bias, block_size=5, chunk_size_j=4)
    )
    np.testing.assert_allclose(both, full, rtol=1e-4, atol=1e-5)


def test_infonce_precision_high_close_to_highest():
    """precision='high' (bf16x3) must stay within the measured error
    envelope of the fp32 path (BASELINE.md: 1.7e-5 max rel vs fp64 at
    C=32768; small problems are tighter)."""
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.hessians import hessian_infonce, hessian_siglip

    rng = np.random.default_rng(5)
    src = rng.normal(size=(64, 16)).astype(np.float32)
    tgt = rng.normal(size=(64, 16)).astype(np.float32)
    hi = np.asarray(hessian_infonce(src, tgt, 2.0))
    h = np.asarray(hessian_infonce(src, tgt, 2.0, precision="high"))
    assert np.abs(h - hi).max() / np.abs(hi).max() < 1e-3

    idx = rng.integers(0, 64, size=64).astype(np.int32)
    hi = np.asarray(hessian_siglip(src, idx, tgt, 2.0, -0.5))
    h = np.asarray(hessian_siglip(src, idx, tgt, 2.0, -0.5, precision="high"))
    assert np.abs(h - hi).max() / np.abs(hi).max() < 1e-3


def test_siglip_precision_scope_restored_on_error():
    """The matmul-precision scope in _siglip_block_stats must not leak the
    process-wide default when tracing raises mid-body (it used to be a
    manual __enter__/__exit__ with no try/finally)."""
    import jax

    before = jax.config.jax_default_matmul_precision
    x = np.ones((4, 5), np.float32)
    idx = np.zeros(4, np.int32)
    y_bad = np.ones((3, 7), np.float32)  # D mismatch: 5 vs 7
    with pytest.raises(Exception):
        hessian_siglip(x, idx, y_bad, 0.5, -0.5, precision="high")
    assert jax.config.jax_default_matmul_precision == before
