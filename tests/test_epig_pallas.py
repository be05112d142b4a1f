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
