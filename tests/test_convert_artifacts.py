"""scripts/convert_artifacts.py — the .pt <-> orbax artifact-directory
converter CLI (both directions lossless; either layout readable by
artifacts.load_hessians afterwards)."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))

import convert_artifacts  # noqa: E402

from bayesvlm_tpu.io.artifacts import (  # noqa: E402
    load_hessians,
    load_info,
    save_hessians,
    save_prior_precision,
)


def _make_pt_dir(d, rng):
    A_i = rng.standard_normal((6, 6)).astype(np.float32)
    B_i = rng.standard_normal((4, 4)).astype(np.float32)
    A_t = rng.standard_normal((6, 6)).astype(np.float32)
    B_t = rng.standard_normal((4, 4)).astype(np.float32)
    save_hessians(d, A_i, B_i, "img")
    save_hessians(d, A_t, B_t, "txt")
    save_prior_precision(d, 12.5, 3.0, 7.25, 2.0)
    return A_i, B_i, A_t, B_t


def test_pt_to_orbax_in_place_then_back(tmp_path):
    d = tmp_path / "hessian_X"
    d.mkdir()
    A_i, B_i, A_t, B_t = _make_pt_dir(d, np.random.default_rng(0))

    out = convert_artifacts.main(str(d), "orbax")
    assert out == d / "factors_orbax"

    # orbax lane readable on its own: remove the .pt files, the
    # load_hessians fallback serves the same factors
    for f in d.glob("*_analytic.pt"):
        f.unlink()
    A2, B2 = load_hessians(d, "img")
    np.testing.assert_array_equal(np.asarray(A2), A_i)
    np.testing.assert_array_equal(np.asarray(B2), B_i)

    # and back: regenerate the reference .pt interchange files in place
    convert_artifacts.main(str(d), "pt")
    assert (d / "A_txt_analytic.pt").exists()
    A3, B3 = load_hessians(d, "txt")
    np.testing.assert_array_equal(np.asarray(A3), A_t)
    np.testing.assert_array_equal(np.asarray(B3), B_t)


def test_out_dir_copies_prior_precision(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    A_i, _, _, _ = _make_pt_dir(src, np.random.default_rng(1))
    dst = tmp_path / "dst"

    convert_artifacts.main(str(src), "orbax", str(dst))
    info = load_info(dst)
    assert info["lambda_img"] == 12.5 and info["n_txt"] == 2.0

    back = tmp_path / "back"
    convert_artifacts.main(str(dst), "pt", str(back))
    A2, _, info2 = load_hessians(back, "img", return_info=True)
    np.testing.assert_array_equal(np.asarray(A2), A_i)
    assert info2["lambda_txt"] == 7.25
