"""SPMD make_predictions over the virtual 8-device mesh must equal the
single-device path."""

from pathlib import Path

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


def test_encoder_with_mesh_matches_unsharded():
    """ImageEncoder.with_mesh: batch-sharded GSPMD forward equals the
    single-device forward, including a batch NOT divisible by the mesh."""
    import jax
    import jax.numpy as jnp

    from bayesvlm_tpu.dist.mesh import make_mesh
    from bayesvlm_tpu.models import load_model

    img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    mesh = make_mesh(jax.devices()[:8], axis_names=("data",))
    img_m = img.with_mesh(mesh)

    rng = np.random.default_rng(0)
    for B in (16, 13):  # divisible and uneven
        x = jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32)
        ref = img(x)
        out = img_m(x)
        np.testing.assert_allclose(np.asarray(out.embeds),
                                   np.asarray(ref.embeds),
                                   rtol=1e-6, atol=1e-6)


def test_zeroshot_cli_mesh_equals_no_mesh(tmp_path):
    """Stage-2 CLI with the data mesh (sharded encoder + sharded
    predictions) reproduces the single-device metrics."""
    import sys

    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision

    rng = np.random.default_rng(7)

    def spd(d, s):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return (M @ M.T / d + np.eye(d, dtype=np.float32)) * s

    hdir = tmp_path / "hessians"
    save_hessians(hdir, spd(32, 50.0), spd(16, 30.0), "img")
    save_hessians(hdir, spd(24, 40.0), spd(16, 20.0), "txt")
    save_prior_precision(hdir, 300.0, 1.0, 300.0, 1.0)

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import zeroshot as zs

    kw = dict(dataset="synthetic", hessian_dir=str(hdir),
              model_str="tiny-clip", pseudo_data_count=10, batch_size=32,
              num_workers=2, dtype="fp32")
    acc_m, nlpd_m, ece_m = zs.main(use_mesh=True, **kw)
    acc_s, nlpd_s, ece_s = zs.main(use_mesh=False, **kw)
    assert acc_m == acc_s
    assert nlpd_m == pytest.approx(nlpd_s, rel=1e-5)
    assert ece_m == pytest.approx(ece_s, rel=1e-4, abs=1e-5)
