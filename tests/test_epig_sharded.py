"""Pool-row-sharded EPIG scoring (epig_from_probs_sharded): exact
equivalence with the unsharded path on the virtual 8-device mesh,
including non-divisible pool sizes (uniform-row padding trimmed) and
the chunked logits-level entry point."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.select.epig import (
    epig_from_logits_using_matmul,
    epig_from_probs_sharded,
    epig_from_probs_using_matmul,
)
from bayesvlm_tpu.types import ProbabilisticLogits


def _probs(rng, n, k, c):
    x = rng.normal(size=(n, k, c)).astype(np.float32)
    return jnp.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))


@pytest.mark.parametrize("n_pool", [32, 37])  # divisible and padded
def test_sharded_probs_match_unsharded(n_pool):
    rng = np.random.default_rng(0)
    mesh = make_mesh()
    pool = _probs(rng, n_pool, 6, 5)
    targ = _probs(rng, 11, 6, 5)
    ref = np.asarray(epig_from_probs_using_matmul(pool, targ, use_pallas=False))
    out = np.asarray(epig_from_probs_sharded(pool, targ, mesh,
                                             use_pallas=False))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_sharded_logits_entry_point_matches():
    rng = np.random.default_rng(1)
    mesh = make_mesh()
    n_pool, n_targ, c = 29, 9, 4
    mk = lambda n: ProbabilisticLogits(
        mean=jnp.asarray(rng.normal(size=(n, c)), jnp.float32),
        var=jnp.asarray(np.abs(rng.normal(size=(n, c))) * 0.1, jnp.float32),
    )
    lp, lt = mk(n_pool), mk(n_targ)
    ref = np.asarray(epig_from_logits_using_matmul(
        lp, lt, seed=3, num_samples=8, chunk_size=10))
    out = np.asarray(epig_from_logits_using_matmul(
        lp, lt, seed=3, num_samples=8, chunk_size=10, mesh=mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
