"""Partial golden artifacts: the shipped SigLIP dir lacks A_img
(.MISSING_LARGE_BLOBS, SURVEY §6) — txt loads fine, img raises a clear
error; dist init context works single-host."""

import numpy as np
import pytest

from bayesvlm_tpu.dist.init import initialize_distributed
from bayesvlm_tpu.io.artifacts import load_hessians


def test_siglip_txt_factors_load(siglip_hessian_dir):
    A_txt, B_txt, info = load_hessians(siglip_hessian_dir, "txt", return_info=True)
    assert A_txt.shape == (769, 769)  # bias column
    assert B_txt.shape == (768, 768)
    assert info["lambda_txt"] == pytest.approx(228.643, abs=0.01)
    # A is a Gram matrix: symmetric with nonnegative diagonal
    np.testing.assert_allclose(np.asarray(A_txt), np.asarray(A_txt).T, atol=1e-3)
    assert (np.diagonal(np.asarray(A_txt)) >= -1e-5).all()


def test_siglip_img_factor_missing_is_clear(siglip_hessian_dir):
    with pytest.raises(FileNotFoundError):
        load_hessians(siglip_hessian_dir, "img")


def test_vitl_partial_dir():
    from pathlib import Path

    d = Path("/root/reference/hessians/hessian_CLIP-ViT-L-14-laion2B-s32B-b82K")
    if not d.exists():
        pytest.skip("fixture missing")
    A_txt, B_txt = load_hessians(d, "txt")
    assert A_txt.shape == (768, 768)
    assert B_txt.shape == (768, 768)


def test_dist_context_single_host():
    ctx = initialize_distributed()
    assert ctx.num_hosts == 1
    assert ctx.is_primary
    assert ctx.mesh.shape["data"] == ctx.num_devices
