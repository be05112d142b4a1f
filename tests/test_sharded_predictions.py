"""SPMD make_predictions over the virtual 8-device mesh must equal the
single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.inference.predictions import (
    make_predictions,
    make_predictions_sharded,
)
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.types import EncoderResult


def test_sharded_predictions_match():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    B, C, D, P = 37, 5, 8, 6  # non-divisible batch

    src = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(B, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(B, P)), jnp.float32),
    )
    tgt = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(C, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(C, P)), jnp.float32),
    )

    def spd(d):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return jnp.asarray(M @ M.T / d + np.eye(d, dtype=np.float32))

    head = ProbabilisticHead.create(
        logit_scale=1.0,
        source_covariance=KroneckerFactorizedCovariance(spd(P), spd(D)),
        target_covariance=KroneckerFactorizedCovariance(spd(P), spd(D)),
    )

    single = make_predictions(head, src, tgt, batch_size=64)
    sharded = make_predictions_sharded(head, src, tgt, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.mean), np.asarray(single.mean), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sharded.var), np.asarray(single.var), rtol=1e-5, atol=1e-6
    )
