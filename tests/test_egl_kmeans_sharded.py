"""Row-sharded EGL scoring and GSPMD k-means: equivalence with the
single-device paths on the virtual 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.select.egl import expected_gradient_length
from bayesvlm_tpu.select.kmeans import cluster_and_select_representatives
from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits


@pytest.mark.parametrize("n", [32, 37])  # divisible and padded
def test_egl_sharded_matches_dense(n):
    rng = np.random.default_rng(0)
    C, D, P = 5, 8, 6
    img = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32),
    )
    txt = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(C, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(C, P)), jnp.float32),
    )
    pl = ProbabilisticLogits(
        mean=jnp.asarray(rng.normal(size=(n, C)), jnp.float32),
        var=jnp.asarray(np.abs(rng.normal(size=(n, C))) * 0.1, jnp.float32),
    )
    ref = np.asarray(expected_gradient_length(img, txt, pl, 2.0, mesh=None))
    out = np.asarray(expected_gradient_length(img, txt, pl, 2.0,
                                              mesh=make_mesh()))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_kmeans_sharded_matches_dense():
    # well-separated clusters so Lloyd's outcome is reassociation-stable
    rng = np.random.default_rng(1)
    k, per, D = 4, 20, 8
    centers = rng.normal(size=(k, D)) * 20.0
    pts = np.concatenate(
        [centers[i] + rng.normal(size=(per, D)) * 0.1 for i in range(k)]
    ).astype(np.float32)
    tr = EncoderResult.create(
        embeds=jnp.asarray(pts),
        activations=jnp.asarray(rng.normal(size=(k * per, 6)), jnp.float32),
    )
    idx_ref, _ = cluster_and_select_representatives(tr, k, mesh=None)
    idx_out, _ = cluster_and_select_representatives(tr, k, mesh=make_mesh())
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_out))
