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


def test_allreduce_factors_global_normalization():
    """Multi-host factor reduction math: sum_h (A_h * sqrt(n_h)) /
    sqrt(sum n_h), with a fake allgather standing in for DCN."""
    import numpy as np

    from bayesvlm_tpu.dist.init import allreduce_factors

    rng = np.random.default_rng(0)
    D = 6
    # per-host RAW sums (before any sqrt(n) division)
    raw = [rng.normal(size=(2, D, D)).astype(np.float32) for _ in range(3)]
    ns = [32.0, 48.0, 16.0]
    # what kfac_ggn hands each host: raw / sqrt(n_local)
    per_host = [(r[0] / np.sqrt(n), r[1] / np.sqrt(n)) for r, n in zip(raw, ns)]

    host_payloads = []

    def fake_allgather(tree):
        host_payloads.append(tree)
        # emulate: every host contributes its own payload
        import jax.numpy as jnp

        stacked = []
        for i in range(len(tree)):
            stacked.append(jnp.stack([jnp.asarray(p[i]) for p in all_payloads]))
        return tuple(stacked)

    # build each host's payload the way allreduce_factors does internally
    all_payloads = []
    for (A_h, B_h), n in zip(per_host, ns):
        root = np.sqrt(np.float64(n)).astype(np.float32)
        all_payloads.append((A_h * root, B_h * root, np.float32(root**2)))

    A0, B0 = per_host[0]
    A_g, B_g = allreduce_factors(A0, B0, ns[0], num_hosts=3,
                                 _allgather=fake_allgather)

    n_total = sum(ns)
    exp_A = sum(r[0] for r in raw) / np.sqrt(n_total)
    exp_B = sum(r[1] for r in raw) / np.sqrt(n_total)
    np.testing.assert_allclose(A_g, exp_A, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(B_g, exp_B, rtol=1e-5, atol=1e-6)

    # single host: exact no-op
    A1, B1 = allreduce_factors(A0, B0, ns[0], num_hosts=1)
    np.testing.assert_array_equal(A1, A0)


def test_sharded_infonce_block_and_precision_options(mesh):
    """block_size / precision are honored by the sharded path (they used to
    be silently dropped): blocked 'high' agrees with the dense fp32 single-
    device factor to the bf16x3 error band."""
    rng = np.random.default_rng(4)
    src = rng.normal(size=(19, 6)).astype(np.float32)
    tgt = rng.normal(size=(11, 6)).astype(np.float32)
    single = np.asarray(hessian_infonce(src, tgt, 0.9))
    sharded = np.asarray(
        sharded_hessian_infonce(src, tgt, 0.9, mesh, block_size=2,
                                precision="high")
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=1e-4)
    # exact blocking invariance at fixed precision
    blocked = np.asarray(
        sharded_hessian_infonce(src, tgt, 0.9, mesh, block_size=2)
    )
    np.testing.assert_allclose(blocked, single, rtol=1e-4, atol=1e-5)


def test_sharded_siglip_block_and_chunk_options(mesh):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(13, 5)).astype(np.float32)
    y = rng.normal(size=(9, 5)).astype(np.float32)
    idx = rng.integers(0, 9, size=13)
    single = np.asarray(hessian_siglip(x, idx, y, 0.6, -0.5))
    sharded = np.asarray(
        sharded_hessian_siglip(x, idx, y, 0.6, -0.5, mesh,
                               block_size=2, chunk_j=4)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_sharded_programs_are_cached(mesh):
    """kfac_ggn calls the sharded helpers once per class batch; the jitted
    SPMD program must be built once per (mesh, options) key, not per call."""
    from bayesvlm_tpu.dist.hessian_allreduce import _infonce_program

    rng = np.random.default_rng(6)
    src = rng.normal(size=(16, 4)).astype(np.float32)
    tgt = rng.normal(size=(8, 4)).astype(np.float32)
    _ = sharded_hessian_infonce(src, tgt, 0.7, mesh)
    hits0 = _infonce_program.cache_info().hits
    _ = sharded_hessian_infonce(src, tgt, 0.7, mesh)
    assert _infonce_program.cache_info().hits == hits0 + 1
