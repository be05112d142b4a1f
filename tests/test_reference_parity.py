"""Head-to-head numerical parity against the actual reference
implementation (imported from /root/reference, executed in torch on CPU).

These tests run the reference's own functions on random inputs and require
our JAX implementations to match: the probabilistic Smith forward (CLIP
and SigLIP bias conventions), both analytic GGN Hessians, covariance
regularization+inversion, and the prior-precision optimization loop."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REFERENCE))

try:
    from bayesvlm.hessians import (
        KroneckerFactorizedCovariance as RefCov,
        compute_covariances as ref_compute_covariances,
        compute_hessian_analytic_InfoNCE as ref_hessian_infonce,
        compute_hessian_analytic_SigLIP as ref_hessian_siglip,
        optimize_prior_precision as ref_optimize_prior,
    )
    from bayesvlm.vlm import CLIP as RefCLIP, SIGLIP as RefSIGLIP, EncoderResult as RefER
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import jax.numpy as jnp

from bayesvlm_tpu.bayes.hessians import hessian_infonce, hessian_siglip
from bayesvlm_tpu.bayes.kfac import (
    KroneckerFactorizedCovariance,
    compute_covariances,
)
from bayesvlm_tpu.bayes.prior import optimize_prior_precision
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.types import EncoderResult


def _spd(rng, d, scale=1.0):
    M = rng.normal(size=(d, d)).astype(np.float32)
    return M @ M.T / d * scale + np.eye(d, dtype=np.float32) * 0.5


@pytest.mark.parametrize("family", ["clip", "siglip"])
def test_smith_forward_parity(family):
    rng = np.random.default_rng(0)
    B, C, D, P = 17, 9, 12, 10
    has_bias = family == "siglip"
    Pb = P + 1 if has_bias else P

    src_e = rng.normal(size=(B, D)).astype(np.float32)
    src_a = rng.normal(size=(B, P)).astype(np.float32)
    tgt_e = rng.normal(size=(C, D)).astype(np.float32)
    tgt_a = rng.normal(size=(C, P)).astype(np.float32)
    A_inv_s, B_inv_s = _spd(rng, Pb), _spd(rng, D)
    A_inv_t, B_inv_t = _spd(rng, Pb), _spd(rng, D)
    scale, bias = 1.7, -0.4

    ref_cls = RefSIGLIP if has_bias else RefCLIP
    ref = ref_cls(logit_scale=scale, logit_bias=bias)
    ref.source_covariance = RefCov(torch.tensor(A_inv_s), torch.tensor(B_inv_s))
    ref.target_covariance = RefCov(torch.tensor(A_inv_t), torch.tensor(B_inv_t))
    with torch.no_grad():
        ref_out = ref._compute_probabilistic_logits_smith(
            RefER(torch.tensor(src_e), torch.tensor(src_a)),
            RefER(torch.tensor(tgt_e), torch.tensor(tgt_a)),
        )

    head = ProbabilisticHead.create(
        logit_scale=scale, logit_bias=bias,
        source_covariance=KroneckerFactorizedCovariance(
            jnp.asarray(A_inv_s), jnp.asarray(B_inv_s)
        ),
        target_covariance=KroneckerFactorizedCovariance(
            jnp.asarray(A_inv_t), jnp.asarray(B_inv_t)
        ),
        has_bias=has_bias,
    )
    ours = head(
        EncoderResult.create(jnp.asarray(src_e), jnp.asarray(src_a)),
        EncoderResult.create(jnp.asarray(tgt_e), jnp.asarray(tgt_a)),
    )
    np.testing.assert_allclose(
        np.asarray(ours.mean), ref_out.mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.var), ref_out.var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_infonce_hessian_parity():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(11, 8)).astype(np.float32)
    tgt = rng.normal(size=(13, 8)).astype(np.float32)
    scale = 1.2
    with torch.no_grad():
        ref = ref_hessian_infonce(
            torch.tensor(src), torch.tensor(tgt), torch.tensor(scale)
        ).numpy()
    ours = np.asarray(hessian_infonce(src, tgt, scale))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_siglip_hessian_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(7, 6)).astype(np.float32)
    y = rng.normal(size=(10, 6)).astype(np.float32)
    idx = np.arange(3, 10)  # reference indexes the [N,N] label matrix
    with torch.no_grad():
        ref = ref_hessian_siglip(
            torch.tensor(x), torch.tensor(idx), torch.tensor(y),
            torch.tensor(0.8), torch.tensor(-1.1), chunk_size_j=4,
        ).numpy()
    ours = np.asarray(hessian_siglip(x, idx, y, 0.8, -1.1))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_covariance_parity():
    rng = np.random.default_rng(3)
    A_i, B_i, A_t, B_t = _spd(rng, 10), _spd(rng, 6), _spd(rng, 8), _spd(rng, 6)
    info = dict(lambda_img=12.0, lambda_txt=7.0, n_img=100.0, n_txt=100.0)
    ref_ci, ref_ct = ref_compute_covariances(
        torch.tensor(A_i), torch.tensor(B_i), torch.tensor(A_t),
        torch.tensor(B_t), info,
    )
    ci, ct = compute_covariances(A_i, B_i, A_t, B_t, info)
    np.testing.assert_allclose(np.asarray(ci.A_inv), ref_ci.A_inv.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ct.B_inv), ref_ct.B_inv.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_prior_precision_parity():
    rng = np.random.default_rng(4)
    A, B = _spd(rng, 9), _spd(rng, 5)
    W = rng.normal(size=(5, 9)).astype(np.float32) * 0.1
    proj = torch.nn.Linear(9, 5, bias=False)
    with torch.no_grad():
        proj.weight.copy_(torch.tensor(W))

    ref_lam = float(
        ref_optimize_prior(
            projection=proj, A=torch.tensor(A), B=torch.tensor(B),
            lmbda_init=20.0, n=10.0, lr=1e-2, num_steps=150, device="cpu",
        )
    )
    our_lam = float(
        optimize_prior_precision(
            projection_l2_norm=float((W**2).sum()),
            projection_num_params=W.size,
            A=A, B=B, lmbda_init=20.0, n=10.0, lr=1e-2, num_steps=150,
        )
    )
    assert our_lam == pytest.approx(ref_lam, rel=1e-3)
