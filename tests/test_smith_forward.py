"""Probabilistic (Smith) forward: compare against a NumPy re-derivation of
ref:bayesvlm/vlm.py:630-684, plus probit/metrics parity checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.inference.metrics import (
    accuracy,
    expected_calibration_error,
    nlpd,
)
from bayesvlm_tpu.probforward.smith import (
    ProbabilisticHead,
    deterministic_logits,
)
from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits


def _random_cov(rng, dim):
    M = rng.normal(size=(dim, dim))
    return (M @ M.T / dim + np.eye(dim)).astype(np.float32)


def numpy_smith(src_e, src_a, tgt_e, tgt_a, cov_s, cov_t, scale, has_bias):
    if has_bias:
        src_a = np.concatenate([src_a, np.ones_like(src_a[:, :1])], axis=1)
        tgt_a = np.concatenate([tgt_a, np.ones_like(tgt_a[:, :1])], axis=1)
    sB = np.diagonal(cov_s["B_inv"])
    tB = np.diagonal(cov_t["B_inv"])
    s_diag = np.einsum("ij,jk,ik->i", src_a, cov_s["A_inv"], src_a)[:, None] * sB
    t_diag = np.einsum("ij,jk,ik->i", tgt_a, cov_t["A_inv"], tgt_a)[:, None] * tB
    n_s = src_e**2 + s_diag
    E_s = n_s.sum(-1, keepdims=True)
    n_t = tgt_e**2 + t_diag
    E_t = n_t.sum(-1, keepdims=True)
    mean = (src_e / np.sqrt(E_s)) @ (tgt_e / np.sqrt(E_t)).T
    var = (n_s @ t_diag.T + s_diag @ (tgt_e**2).T) / (E_s * E_t.T)
    e = np.exp(scale)
    return mean * e, var * e**2


@pytest.mark.parametrize("has_bias", [False, True])
def test_smith_matches_numpy(has_bias):
    rng = np.random.default_rng(0)
    B, C, D, P = 9, 5, 8, 6
    Pb = P + 1 if has_bias else P
    src = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(B, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(B, P)), jnp.float32),
    )
    tgt = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(C, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(C, P)), jnp.float32),
    )
    cov_s = {"A_inv": _random_cov(rng, Pb), "B_inv": _random_cov(rng, D)}
    cov_t = {"A_inv": _random_cov(rng, Pb), "B_inv": _random_cov(rng, D)}
    scale = 1.1

    head = ProbabilisticHead.create(
        logit_scale=scale,
        source_covariance=KroneckerFactorizedCovariance(
            A_inv=jnp.asarray(cov_s["A_inv"]), B_inv=jnp.asarray(cov_s["B_inv"])
        ),
        target_covariance=KroneckerFactorizedCovariance(
            A_inv=jnp.asarray(cov_t["A_inv"]), B_inv=jnp.asarray(cov_t["B_inv"])
        ),
        has_bias=has_bias,
    )
    out = head(src, tgt)

    exp_mean, exp_var = numpy_smith(
        np.asarray(src.embeds), np.asarray(src.activations),
        np.asarray(tgt.embeds), np.asarray(tgt.activations),
        cov_s, cov_t, scale, has_bias,
    )
    np.testing.assert_allclose(np.asarray(out.mean), exp_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.var), exp_var, rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(out.var) >= 0)


def test_map_estimate_path():
    rng = np.random.default_rng(1)
    B, C, D = 4, 3, 6
    src = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(B, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(B, D)), jnp.float32),
    )
    tgt = EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(C, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(C, D)), jnp.float32),
    )
    head = ProbabilisticHead.create(logit_scale=0.5, logit_bias=0.25)
    out = head(src, tgt, map_estimate=True)
    assert np.all(np.asarray(out.var) == 0)

    s = np.asarray(src.embeds)
    t = np.asarray(tgt.embeds)
    s = s / np.linalg.norm(s, axis=-1, keepdims=True)
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    expected = s @ t.T * np.exp(0.5) + 0.25
    np.testing.assert_allclose(np.asarray(out.mean), expected, rtol=1e-5, atol=1e-5)


def test_probit_softmax_matches_reference_formula():
    rng = np.random.default_rng(2)
    mean = rng.normal(size=(10, 4)).astype(np.float32)
    var = rng.uniform(0.1, 2.0, size=(10, 4)).astype(np.float32)
    pl = ProbabilisticLogits(mean=jnp.asarray(mean), var=jnp.asarray(var))
    got = np.asarray(pl.softmax(num_samples=0))
    scaled = mean / np.sqrt(1 + np.pi / 8 * var)
    e = np.exp(scaled - scaled.max(-1, keepdims=True))
    expected = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_mc_softmax_converges_to_probit():
    rng = np.random.default_rng(3)
    mean = rng.normal(size=(6, 5)).astype(np.float32)
    var = rng.uniform(0.05, 0.3, size=(6, 5)).astype(np.float32)
    pl = ProbabilisticLogits(mean=jnp.asarray(mean), var=jnp.asarray(var))
    mc = np.asarray(pl.softmax(num_samples=4000, seed=0))
    probit = np.asarray(pl.softmax(num_samples=0))
    np.testing.assert_allclose(mc, probit, atol=0.03)


def test_sample_probas_shape_and_simplex():
    rng = np.random.default_rng(4)
    pl = ProbabilisticLogits(
        mean=jnp.asarray(rng.normal(size=(7, 3)), jnp.float32),
        var=jnp.asarray(rng.uniform(0.1, 1.0, size=(7, 3)), jnp.float32),
    )
    s = np.asarray(pl.sample_probas(11, seed=1))
    assert s.shape == (7, 11, 3)
    np.testing.assert_allclose(s.sum(-1), np.ones((7, 11)), rtol=1e-5)


def test_metrics_against_torchmetrics():
    torch = pytest.importorskip("torch")
    torchmetrics = pytest.importorskip("torchmetrics")
    rng = np.random.default_rng(5)
    N, C = 257, 10
    logits = rng.normal(size=(N, C)).astype(np.float32) * 2
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    labels = rng.integers(0, C, size=N)

    ece_ref = torchmetrics.classification.MulticlassCalibrationError(
        num_classes=C, n_bins=20, norm="l1"
    )(torch.tensor(probs), torch.tensor(labels)).item()
    ece = float(expected_calibration_error(jnp.asarray(probs), jnp.asarray(labels)))
    assert ece == pytest.approx(ece_ref, abs=1e-5)

    import torch.distributions as dists

    nlpd_ref = -dists.Categorical(torch.tensor(probs)).log_prob(
        torch.tensor(labels)
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(nlpd(jnp.asarray(probs), jnp.asarray(labels))),
        nlpd_ref,
        rtol=1e-4, atol=1e-5,
    )

    acc_ref = (probs.argmax(-1) == labels).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(accuracy(jnp.asarray(probs), jnp.asarray(labels))), acc_ref
    )
