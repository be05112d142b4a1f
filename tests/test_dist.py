"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from bayesvlm_tpu.bayes.hessians import (
    activation_gram,
    hessian_infonce,
    hessian_siglip,
)
from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.dist.hessian_allreduce import (
    sharded_activation_gram,
    sharded_hessian_infonce,
    sharded_hessian_siglip,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU platform")
    return make_mesh()


def test_sharded_infonce_matches_single(mesh):
    rng = np.random.default_rng(0)
    src = rng.normal(size=(19, 6)).astype(np.float32)  # non-divisible B
    tgt = rng.normal(size=(11, 6)).astype(np.float32)
    single = np.asarray(hessian_infonce(src, tgt, 0.9))
    sharded = np.asarray(sharded_hessian_infonce(src, tgt, 0.9, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_sharded_siglip_matches_single(mesh):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(13, 5)).astype(np.float32)
    y = rng.normal(size=(9, 5)).astype(np.float32)
    idx = rng.integers(0, 9, size=13)
    single = np.asarray(hessian_siglip(x, idx, y, 0.6, -0.5))
    sharded = np.asarray(sharded_hessian_siglip(x, idx, y, 0.6, -0.5, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bias", [False, True])
def test_sharded_gram_matches_single(mesh, bias):
    rng = np.random.default_rng(2)
    a = rng.normal(size=(21, 4)).astype(np.float32)
    single = np.asarray(activation_gram(a, append_bias_column=bias))
    sharded = np.asarray(sharded_activation_gram(a, mesh, append_bias_column=bias))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)
