"""Golden-file tests: load the shipped reference hessian artifacts,
regularize + invert, and compare against an independent NumPy computation
of the reference formulas (ref:bayesvlm/hessians.py:137-201)."""

import json

import numpy as np
import pytest

from bayesvlm_tpu.bayes.kfac import compute_covariance, regularize_kfac_factor
from bayesvlm_tpu.io.artifacts import load_covariances, load_hessians, save_hessians
from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array


def test_load_clip_b32_factors(clip_b32_hessian_dir):
    A, B, info = load_hessians(clip_b32_hessian_dir, "img", return_info=True)
    assert A.shape == (768, 768)
    assert B.shape == (512, 512)
    assert set(info) >= {"lambda_img", "n_img", "lambda_txt", "n_txt"}
    # A is a scaled Gram matrix -> symmetric PSD
    np.testing.assert_allclose(np.asarray(A), np.asarray(A).T, rtol=0, atol=1e-4)


def test_siglip_bias_column_shape(siglip_hessian_dir):
    A_txt, B_txt = load_hessians(siglip_hessian_dir, "txt")
    # SigLIP text projection has a bias -> A gets an extra ones column/row
    # (ref:scripts/hessian_estimation.py:103-104)
    assert A_txt.shape == (769, 769)
    assert B_txt.shape == (768, 768)


def test_regularize_matches_reference_formula(clip_b32_hessian_dir):
    A, _, info = load_hessians(clip_b32_hessian_dir, "img", return_info=True)
    A = np.asarray(A, np.float64)
    n, lam = info["n_img"], info["lambda_img"]
    expected = A * np.sqrt(n) + np.sqrt(lam) * np.eye(A.shape[0])
    got = np.asarray(regularize_kfac_factor(A.astype(np.float32), n, lam))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_covariance_inverse_roundtrip(clip_b32_hessian_dir):
    A, B, info = load_hessians(clip_b32_hessian_dir, "img", return_info=True)
    cov = compute_covariance(A, B, info["n_img"], info["lambda_img"])
    A_reg = np.asarray(regularize_kfac_factor(A, info["n_img"], info["lambda_img"]))
    # A_inv @ A_reg ~ I
    prod = np.asarray(cov.A_inv) @ A_reg
    np.testing.assert_allclose(prod, np.eye(A.shape[0]), atol=5e-3)


def test_load_covariances_full_dir(clip_b32_hessian_dir):
    cov_img, cov_txt, info = load_covariances(clip_b32_hessian_dir, return_info=True)
    assert cov_img.A_inv.shape == (768, 768)
    assert cov_img.B_inv.shape == (512, 512)
    assert cov_txt.A_inv.shape == (512, 512)
    assert info["lambda_img"] == pytest.approx(1708.945, abs=0.01)
    assert info["lambda_txt"] == pytest.approx(1255.334, abs=0.01)


def test_pt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(17, 33)).astype(np.float32)
    path = tmp_path / "x.pt"
    save_pt_array(arr, path)
    back = load_pt_array(path)
    np.testing.assert_array_equal(arr, back)


def test_pt_torch_interop(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(8, 5)).astype(np.float32)
    save_pt_array(arr, tmp_path / "ours.pt")
    t = torch.load(tmp_path / "ours.pt", map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(t.numpy(), arr)

    torch.save(torch.from_numpy(arr), tmp_path / "theirs.pt")
    back = load_pt_array(tmp_path / "theirs.pt")
    np.testing.assert_array_equal(back, arr)


def test_save_hessians_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    A = rng.normal(size=(16, 16)).astype(np.float32)
    B = rng.normal(size=(8, 8)).astype(np.float32)
    save_hessians(tmp_path, A, B, "img")
    A2, B2 = load_hessians(tmp_path, "img")
    np.testing.assert_allclose(np.asarray(A2), A, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B2), B, rtol=1e-6)
