"""Hessian artifact directory format — bit-compatible with the reference.

Directory layout (ref:bayesvlm/hessians.py:137-167,203-217):

    <la_dir>/A_{img,txt}_analytic.pt     raw K-FAC A factors (already / sqrt(n))
    <la_dir>/B_{img,txt}_analytic.pt     raw K-FAC B factors
    <la_dir>/prior_precision_analytic.json
        {"lambda_img": ..., "n_img": ..., "lambda_txt": ..., "n_txt": ...}
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.kfac import (
    KroneckerFactorizedCovariance,
    compute_covariances,
)
from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array

PathLike = Union[str, Path]


@dataclass
class HessianArtifacts:
    A_img: np.ndarray
    B_img: np.ndarray
    A_txt: np.ndarray
    B_txt: np.ndarray
    info: dict


def load_hessians(
    la_dir: PathLike,
    tag: Literal["img", "txt"],
    return_info: bool = False,
):
    """Raw A, B factors (+ info) for one direction
    (ref:bayesvlm/hessians.py:203-217).

    Falls back to the orbax lane (``io/orbax_ckpt.py``,
    ``<la_dir>/factors_orbax``) when the ``.pt`` files are absent, so
    consumers read either artifact format transparently."""
    la_dir = Path(la_dir)
    A_path = la_dir / f"A_{tag}_analytic.pt"
    B_path = la_dir / f"B_{tag}_analytic.pt"
    if not (A_path.exists() and B_path.exists()) \
            and (la_dir / "factors_orbax").exists():
        from bayesvlm_tpu.io.orbax_ckpt import load_hessians_orbax

        A, B = load_hessians_orbax(la_dir, tag)
        A = jnp.asarray(A, jnp.float32)
        B = jnp.asarray(B, jnp.float32)
        if not return_info:
            return A, B
        with open(la_dir / "prior_precision_analytic.json") as f:
            return A, B, json.load(f)
    A = jnp.asarray(load_pt_array(A_path), jnp.float32)
    B = jnp.asarray(load_pt_array(B_path), jnp.float32)
    if not return_info:
        return A, B
    with open(la_dir / "prior_precision_analytic.json") as f:
        info = json.load(f)
    return A, B, info


def load_info(la_dir: PathLike) -> dict:
    with open(Path(la_dir) / "prior_precision_analytic.json") as f:
        return json.load(f)


def load_covariances(
    la_dir: PathLike,
    return_info: bool = False,
):
    """Load all four factors, regularize with the stored (n, lambda) and
    invert (ref:bayesvlm/hessians.py:137-167)."""
    la_dir = Path(la_dir)
    A_img, B_img = load_hessians(la_dir, "img")
    A_txt, B_txt = load_hessians(la_dir, "txt")
    info = load_info(la_dir)
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    if return_info:
        return cov_img, cov_txt, info
    return cov_img, cov_txt


def save_hessians(
    la_dir: PathLike,
    A: np.ndarray,
    B: np.ndarray,
    tag: Literal["img", "txt"],
) -> None:
    la_dir = Path(la_dir)
    la_dir.mkdir(parents=True, exist_ok=True)
    save_pt_array(np.asarray(A, np.float32), la_dir / f"A_{tag}_analytic.pt")
    save_pt_array(np.asarray(B, np.float32), la_dir / f"B_{tag}_analytic.pt")


def save_prior_precision(
    la_dir: PathLike,
    lambda_img: float,
    n_img: float,
    lambda_txt: float,
    n_txt: float,
) -> None:
    """ref:scripts/hessian_estimation.py:259-266 (same key order)."""
    la_dir = Path(la_dir)
    la_dir.mkdir(parents=True, exist_ok=True)
    result = {
        "lambda_img": float(lambda_img),
        "n_img": float(n_img),
        "lambda_txt": float(lambda_txt),
        "n_txt": float(n_txt),
    }
    with open(la_dir / "prior_precision_analytic.json", "w") as f:
        json.dump(result, f, indent=4)
