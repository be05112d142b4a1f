"""Fused EPIG joint-entropy kernel parity (interpret mode on CPU; the
same kernel runs compiled on TPU — hardware numbers in BASELINE.md).

The kernel must reproduce the XLA path of
``epig.epig_from_probs_using_matmul`` (ref:bayesvlm/epig.py:342-397
semantics) — both share the bf16-operand / fp32-accumulation contract, so
differences are tile-ordering rounding only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul
from bayesvlm_tpu.select.epig_pallas import (
    epig_from_probs_pallas,
    joint_xlogy_rowsums,
)


def _probs(rng, n, k, c):
    z = rng.normal(size=(n, k, c)).astype(np.float32)
    e = np.exp(z - z.max(-1, keepdims=True))
    return jnp.asarray(e / e.sum(-1, keepdims=True))


@pytest.mark.parametrize("n_p,n_t,c,k", [(12, 7, 5, 9), (33, 17, 3, 16)])
def test_epig_pallas_matches_xla_path(n_p, n_t, c, k):
    rng = np.random.default_rng(0)
    probs_pool = _probs(rng, n_p, k, c)
    probs_targ = _probs(rng, n_t, k, c)

    ref = np.asarray(
        epig_from_probs_using_matmul(probs_pool, probs_targ, use_pallas=False)
    )
    got = np.asarray(
        epig_from_probs_pallas(probs_pool, probs_targ, interpret=True)
    )
    # identical bf16/fp32 contract; only reduction tiling differs
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # acquisition semantics: ranking must be stable
    assert np.argmax(got) == np.argmax(ref)


def test_rowsums_padding_is_transparent():
    """Zero-padding of K / M / N inside the kernel must not change sums:
    compare a multi-tile-ish case against a plain numpy contraction."""
    rng = np.random.default_rng(1)
    m, n, k = 37, 29, 11
    a = rng.uniform(0.0, 1.0, size=(m, k)).astype(np.float32)
    b = rng.uniform(0.0, 1.0, size=(n, k)).astype(np.float32)

    got = np.asarray(
        joint_xlogy_rowsums(
            jnp.asarray(a), jnp.asarray(b), num_samples=k, interpret=True
        )
    )

    j = (a.astype(np.float32) @ b.T.astype(np.float32)) / k
    expected = np.where(j > 0, j * np.log(j), 0.0).sum(axis=1)
    np.testing.assert_allclose(got, expected, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_rowsums_true_multi_tile_grid():
    """m=1100, n=4200 pad to a (nj=2, ni=2) grid — exercises the
    cross-sweep scratch accumulation (@pl.when(j>0)), the final-sweep
    output write, and the pl.ds scratch slicing, which the small cases
    (grid (1,1)) never reach."""
    rng = np.random.default_rng(3)
    m, n, k = 1100, 4200, 11
    a = rng.uniform(0.0, 1.0, size=(m, k)).astype(np.float32)
    b = rng.uniform(0.0, 1.0, size=(n, k)).astype(np.float32)

    got = np.asarray(
        joint_xlogy_rowsums(
            jnp.asarray(a), jnp.asarray(b), num_samples=k, interpret=True
        )
    )
    j = (a @ b.T) / k
    expected = np.where(j > 0, j * np.log(j), 0.0).sum(axis=1)
    np.testing.assert_allclose(got, expected, rtol=5e-3, atol=5e-3)


def test_explicit_pallas_on_cpu_uses_interpret():
    """use_pallas=True off-TPU must run the kernel in interpret mode
    (not crash on a non-TPU backend) and agree with the XLA path."""
    rng = np.random.default_rng(4)
    probs_pool = _probs(rng, 9, 5, 4)
    probs_targ = _probs(rng, 7, 5, 4)
    ref = np.asarray(
        epig_from_probs_using_matmul(probs_pool, probs_targ, use_pallas=False)
    )
    got = np.asarray(
        epig_from_probs_using_matmul(probs_pool, probs_targ, use_pallas=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_public_entry_auto_select_runs_on_cpu():
    """use_pallas=None must fall back to the XLA path off-TPU and agree
    with the explicit use_pallas=False call bitwise."""
    rng = np.random.default_rng(2)
    probs_pool = _probs(rng, 6, 4, 3)
    probs_targ = _probs(rng, 5, 4, 3)
    auto = np.asarray(epig_from_probs_using_matmul(probs_pool, probs_targ))
    xla = np.asarray(
        epig_from_probs_using_matmul(probs_pool, probs_targ, use_pallas=False)
    )
    assert jax.default_backend() == "cpu"
    np.testing.assert_array_equal(auto, xla)


@pytest.mark.parametrize("n_p,n_t,c,k", [(12, 7, 5, 9), (33, 17, 3, 16)])
def test_epig_pallas_int8_close_to_fp32(n_p, n_t, c, k):
    """The opt-in int8 joint-score path (per-row absmax W8A8, int32
    accumulation) must track the XLA-path scores within the documented
    error band and preserve the top-1 ranking on these fixtures."""
    rng = np.random.default_rng(7)
    probs_pool = _probs(rng, n_p, k, c)
    probs_targ = _probs(rng, n_t, k, c)

    ref = np.asarray(
        epig_from_probs_using_matmul(probs_pool, probs_targ,
                                     use_pallas=False)
    )
    got = np.asarray(
        epig_from_probs_pallas(probs_pool, probs_targ, interpret=True,
                               use_int8=True)
    )
    assert got.shape == ref.shape
    # int8 error lands relative to the ENTROPY scale (EPIG is a small
    # difference of large entropies; the bf16 path commits the same
    # operand truncation as the XLA reference so its error vs ref is
    # ~1e-6, but int8's absmax steps add genuinely new error). Measured
    # 4.3e-3 max on these fixtures vs entropy scale ~log(C); pin at
    # 1e-2 absolute. Operating-point quality numbers (K=100, C=65,
    # where sqrt(K) averaging shrinks this) live in BASELINE.md.
    assert np.abs(got - ref).max() <= 1e-2
    # ranking is what EPIG consumes: top-1 must agree on these fixtures
    assert int(np.argmax(got)) == int(np.argmax(ref))


def test_rowsums_int8_padding_is_transparent():
    """Zero-padding rows/cols must contribute nothing through the int8
    quantize (zero rows quantize to exact zeros with a clamped scale)."""
    rng = np.random.default_rng(8)
    M, N, K = 50, 30, 12
    pool = jnp.asarray(rng.uniform(0.01, 1.0, size=(M, K)), jnp.float32)
    targ = jnp.asarray(rng.uniform(0.01, 1.0, size=(N, K)), jnp.float32)
    a = np.asarray(joint_xlogy_rowsums(pool, targ, num_samples=K,
                                       interpret=True, use_int8=True))
    # same computation by hand from the quantized operands
    def q(x):
        r = np.maximum(np.abs(np.asarray(x)).max(1, keepdims=True), 1e-12)
        return np.round(np.asarray(x) * 127.0 / r).astype(np.int32), r / 127.0
    pq, ps = q(pool.astype(jnp.bfloat16).astype(jnp.float32))
    tq, ts = q(targ.astype(jnp.bfloat16).astype(jnp.float32))
    s = (tq @ pq.T).astype(np.float32) * ts * ps.T / K
    ref = np.where(s > 0, s * np.log(s), 0.0).sum(0)
    # fp32 xlogy + reduction-order differences between the kernel and
    # the numpy re-derivation: ~4e-4 relative on these sums
    np.testing.assert_allclose(a, ref, rtol=1e-3, atol=1e-3)
