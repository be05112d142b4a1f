"""Train-sharded kNN retrieval: _sims_topk_sharded must match the dense
path exactly (values, global ids, tie order) on the virtual 8-device
mesh, and the find_similar_samples_* wrappers must produce identical
OrderedDict structures with and without a mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.select.knn import (
    find_similar_samples_cosine,
    find_similar_samples_wasserstein,
)
from bayesvlm_tpu.types import EncoderResult


def _setup(rng, n_train, n_test=6, D=8, P=6):
    mk = lambda n: EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32),
    )
    M = rng.normal(size=(P, P)).astype(np.float32)
    A_inv = jnp.asarray(M @ M.T / P + np.eye(P, dtype=np.float32))
    B_inv = jnp.diag(jnp.asarray(
        np.abs(rng.normal(size=D)).astype(np.float32) + 0.1))
    cov = KroneckerFactorizedCovariance(A_inv=A_inv, B_inv=B_inv)
    return mk(n_train), mk(n_test), cov


@pytest.mark.parametrize("fn", [find_similar_samples_cosine,
                                find_similar_samples_wasserstein])
@pytest.mark.parametrize("n_train", [64, 67])  # divisible and padded
def test_sharded_matches_dense(fn, n_train):
    rng = np.random.default_rng(0)
    train, test, cov = _setup(rng, n_train)
    idx = np.arange(test.embeds.shape[0])
    vals = np.zeros(len(idx), np.float32)
    kwargs = dict(k_nearest=3, source_covariance=cov, buffersize=4)
    ref = fn(train, test, idx, vals, mesh=None, **kwargs)
    out = fn(train, test, idx, vals, mesh=make_mesh(), **kwargs)
    assert list(ref.keys()) == list(out.keys())
    for t in ref:
        assert ref[t]["indices"] == out[t]["indices"], t
        # per-row math is identical, but XLA may reassociate the D-dim
        # matmul reduction differently at local vs global shapes
        np.testing.assert_allclose(ref[t]["similarities"],
                                   out[t]["similarities"], rtol=1e-5)


def test_narrow_pool_falls_back():
    # width < k_cap: sharded wrapper must silently fall back to the
    # dense path and still match
    rng = np.random.default_rng(1)
    train, test, cov = _setup(rng, 20)
    idx = np.arange(test.embeds.shape[0])
    vals = np.zeros(len(idx), np.float32)
    kwargs = dict(k_nearest=3, source_covariance=cov, buffersize=4)
    ref = find_similar_samples_cosine(train, test, idx, vals, mesh=None,
                                      **kwargs)
    out = find_similar_samples_cosine(train, test, idx, vals,
                                      mesh=make_mesh(), **kwargs)
    assert list(ref.keys()) == list(out.keys())
    for t in ref:
        assert ref[t]["indices"] == out[t]["indices"]


@pytest.mark.parametrize("n_train", [64, 67])  # divisible and padded
def test_neg_inf_similarities_no_pad_ids(n_train):
    # pathological: rows where >= k_cap similarities are -inf (all of
    # them, and all-but-one). Zero-row pad columns (global id >=
    # n_train) must never surface, and the result must still match the
    # dense lax.top_k exactly (tie order included).
    import jax

    from bayesvlm_tpu.select.knn import _sims_topk_sharded

    k_cap = 5
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    train = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(n_train, 4)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(n_train, 4)), jnp.float32),
    )

    def sims_fn(tr):
        n_local = tr.embeds.shape[0]
        row0 = jnp.full((1, n_local), -jnp.inf)           # all -inf
        # row 1: -inf except global column 3 (only present on one
        # shard; the rest see all--inf). Identify it by embed value so
        # the same sims_fn works on shards and on the dense pool.
        marker = jnp.isclose(tr.embeds[:, 0], train.embeds[3, 0])
        row1 = jnp.where(marker[None, :], 1.0, -jnp.inf)
        return jnp.concatenate([row0, row1], axis=0)

    v, ids = _sims_topk_sharded(sims_fn, train, k_cap, mesh)
    dense_v, dense_i = jax.lax.top_k(sims_fn(train), k_cap)
    np.testing.assert_array_equal(np.asarray(dense_v), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(dense_i), np.asarray(ids))
    assert (np.asarray(ids) < n_train).all()
