"""Pallas fused Smith head vs the unfused XLA chain (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.probforward.kernels.smith_pallas import (
    fused_probit_probs,
    smith_probit_probs_reference,
)


@pytest.mark.parametrize("B,C,D", [(16, 10, 32), (130, 257, 64)])
def test_fused_matches_reference(B, C, D):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    src_cov = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, D)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(C, D)), jnp.float32)
    tgt_cov = jnp.asarray(rng.uniform(0.01, 0.5, size=(C, D)), jnp.float32)
    scale = jnp.float32(2.0)

    expected = np.asarray(
        smith_probit_probs_reference(src, src_cov, tgt, tgt_cov, scale)
    )
    got = np.asarray(
        fused_probit_probs(src, src_cov, tgt, tgt_cov, scale, block_b=64,
                           interpret=True)
    )
    assert got.shape == (B, C)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
