"""Direct select_epig_online coverage: both kNN pool subsamplings, the
already-selected skip, and Hessian/lambda evolution."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance, compute_covariances
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.select.epig import select_epig_online, update_embeddings
from bayesvlm_tpu.types import EncoderResult


def _setup(rng, n_pool=40, n_target=16, C=4, D=8, P=6):
    kernel = jnp.asarray(rng.normal(size=(P, D)) * 0.2, jnp.float32)
    pool_act = jnp.asarray(rng.normal(size=(n_pool, P)), jnp.float32)
    targ_act = jnp.asarray(rng.normal(size=(n_target, P)), jnp.float32)
    lbl_act = jnp.asarray(rng.normal(size=(C, P)), jnp.float32)
    mk = lambda a: EncoderResult.create(embeds=a @ kernel, activations=a)
    pool, targ, lbl = mk(pool_act), mk(targ_act), mk(lbl_act)

    def spd(d, s=0.1):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return (M @ M.T / d * s + np.eye(d, dtype=np.float32) * 0.2)

    A_img, B_img = spd(P), spd(D)
    A_txt, B_txt = spd(P), spd(D)
    info = dict(lambda_img=5.0, lambda_txt=5.0, n_img=10.0, n_txt=10.0)
    head = ProbabilisticHead.create(logit_scale=1.0)
    return kernel, pool, targ, lbl, A_img, B_img, A_txt, B_txt, info, head


@pytest.mark.parametrize("subsampling", ["random", "knn_cosine", "knn_wasserstein"])
def test_epig_online_subsampling_modes(subsampling):
    rng = np.random.default_rng(0)
    kernel, pool, targ, lbl, A_i, B_i, A_t, B_t, info, head = _setup(rng)
    class_ids = jnp.asarray(rng.integers(0, 4, size=40))

    selected, scores = select_epig_online(
        label_features=lbl, pool_features=pool, target_features=targ,
        pool_class_ids=class_ids,
        projection_kernel=kernel, projection_bias=None,
        head=head, A_img=A_i, A_txt=A_t, B_img=B_i, B_txt=B_t,
        cov_info=info, budget=3, lr=1e-3, hessian_update_scale=10.0,
        num_samples=8, seed=0,
        projection_l2=float(jnp.sum(kernel**2)),
        projection_num_params=kernel.size,
        pool_max_size=30, target_max_size=12,
        pool_subsampling=subsampling,
        k_nearest_neighbors=8,
        hessian_n0=100,
    )
    assert len(selected) == 3
    assert len(set(selected)) == 3  # no repeats (skip-already-selected)
    assert all(0 <= i < 40 for i in selected)
    assert all(np.isfinite(s) for s in scores)


def test_epig_online_raises_when_pool_too_small():
    rng = np.random.default_rng(1)
    kernel, pool, targ, lbl, A_i, B_i, A_t, B_t, info, head = _setup(rng)
    with pytest.raises(ValueError, match="Could not find enough samples"):
        select_epig_online(
            label_features=lbl, pool_features=pool, target_features=targ,
            pool_class_ids=jnp.zeros(40, jnp.int32),
            projection_kernel=kernel, projection_bias=None,
            head=head, A_img=A_i, A_txt=A_t, B_img=B_i, B_txt=B_t,
            cov_info=info, budget=30, lr=1e-3, hessian_update_scale=10.0,
            num_samples=4, seed=0,
            projection_l2=float(jnp.sum(kernel**2)),
            projection_num_params=kernel.size,
            pool_subsampling="knn_cosine",
            k_nearest_neighbors=1,  # 16 targets x 1 < budget 30
        )


def test_update_embeddings_formula():
    rng = np.random.default_rng(2)
    kernel = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    feats = EncoderResult(
        embeds=jnp.zeros((3, 4)),
        activations=jnp.asarray(rng.normal(size=(3, 5)), jnp.float32),
        residuals=jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
    )
    out = update_embeddings(kernel, bias, feats)
    expected = (
        np.asarray(feats.activations) @ np.asarray(kernel)
        + np.asarray(bias) + np.asarray(feats.residuals)
    )
    np.testing.assert_allclose(np.asarray(out.embeds), expected, rtol=1e-5)


def test_epig_online_pool_exhaustion_raises_cleanly():
    """When every subsampled candidate is already selected mid-budget, the
    loop must raise an intelligible ValueError instead of a TypeError on
    best=None (round-1 VERDICT weak #6)."""
    rng = np.random.default_rng(3)
    kernel, pool, targ, lbl, A_i, B_i, A_t, B_t, info, head = _setup(
        rng, n_pool=5
    )
    with pytest.raises(ValueError, match="EPIG pool exhausted"):
        select_epig_online(
            label_features=lbl, pool_features=pool, target_features=targ,
            pool_class_ids=jnp.zeros(5, jnp.int32),
            projection_kernel=kernel, projection_bias=None,
            head=head, A_img=A_i, A_txt=A_t, B_img=B_i, B_txt=B_t,
            cov_info=info, budget=8, lr=1e-3, hessian_update_scale=10.0,
            num_samples=4, seed=0,
            projection_l2=float(jnp.sum(kernel**2)),
            projection_num_params=kernel.size,
            pool_subsampling="random", pool_max_size=5,
            hessian_n0=100,
        )


def test_epig_online_with_biased_projection():
    """SigLIP-style run (proj_has_bias=True): the A factors carry the bias
    column ([P+1, P+1]) and the online Hessian update must extend the
    activation with the bias-column 1 — it used to crash with a [P,P] vs
    [P+1,P+1] broadcast TypeError at budget step 0."""
    rng = np.random.default_rng(7)
    n_pool, n_target, C, D, P = 30, 12, 4, 8, 6
    kernel = jnp.asarray(rng.normal(size=(P, D)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    mk = lambda a: EncoderResult.create(embeds=a @ kernel + bias, activations=a)
    pool = mk(jnp.asarray(rng.normal(size=(n_pool, P)), jnp.float32))
    targ = mk(jnp.asarray(rng.normal(size=(n_target, P)), jnp.float32))
    lbl = mk(jnp.asarray(rng.normal(size=(C, P)), jnp.float32))

    def spd(d, s=0.1):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return M @ M.T / d * s + np.eye(d, dtype=np.float32) * 0.2

    A_img, A_txt = spd(P + 1), spd(P + 1)  # bias column included
    B_img, B_txt = spd(D), spd(D)
    info = dict(lambda_img=5.0, lambda_txt=5.0, n_img=10.0, n_txt=10.0)
    head = ProbabilisticHead.create(logit_scale=1.0, logit_bias=-0.5,
                                    has_bias=True)

    selected, scores = select_epig_online(
        label_features=lbl, pool_features=pool, target_features=targ,
        pool_class_ids=jnp.asarray(rng.integers(0, C, size=n_pool)),
        projection_kernel=kernel, projection_bias=bias,
        head=head, A_img=A_img, A_txt=A_txt, B_img=B_img, B_txt=B_txt,
        cov_info=info, budget=3, lr=1e-3, hessian_update_scale=10.0,
        num_samples=8, seed=0,
        projection_l2=float(jnp.sum(kernel**2)),
        projection_num_params=kernel.size,
        pool_max_size=20, target_max_size=10,
        pool_subsampling="random",
        proj_has_bias=True,
        hessian_n0=100,
    )
    assert len(selected) == 3
    assert len(set(selected)) == 3
    assert all(np.isfinite(s) for s in scores)
