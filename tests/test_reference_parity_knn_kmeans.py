"""Head-to-head parity with the reference kmeans-kNN variant
(ref:bayesvlm/knn_kmeans.py:80-224 cosine, :226-352 wasserstein) — the
FULL retrieval structure, mirroring test_reference_parity_selection.py's
knn.py structure match (VERDICT round-2 item 4).

Inputs are sized to exercise the two behaviors unique to this variant:
  - the dynamic buffer re-fetch (ref :183-186): test rows are clustered
    so every row ranks the same representatives on top — unique-neighbor
    growth is ~1 per k', forcing k' past the initial k_nearest+buffersize
    fetch width several times;
  - the per-test-sample cap of k_nearest kept neighbors (ref :205-211):
    the final k' is far above k_nearest, so the collect loop's early
    break is load-bearing for every row.
"""

import sys
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REFERENCE))

try:
    from bayesvlm.knn_kmeans import (
        find_similar_samples_cosine as ref_kmeans_cosine,
        find_similar_samples_wasserstein as ref_kmeans_wasserstein,
    )
    from bayesvlm.hessians import KroneckerFactorizedCovariance as RefCov
    from bayesvlm.vlm import EncoderResult as RefER
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import jax.numpy as jnp

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.select.knn_kmeans import (
    find_similar_samples_cosine,
    find_similar_samples_wasserstein,
)
from bayesvlm_tpu.types import EncoderResult


def _make_case(seed=0, n_reps=40, n_test_total=20, D=8, P=6):
    """Clustered test rows: every test row is a tiny perturbation of one
    anchor, so all rows agree on the neighbor ranking. Perturbations are
    large enough (1e-2) that within-row similarity gaps dominate fp32
    noise — the torch and jax orderings cannot diverge on numerics."""
    rng = np.random.default_rng(seed)
    train_e = rng.normal(size=(n_reps, D)).astype(np.float32)
    train_a = rng.normal(size=(n_reps, P)).astype(np.float32)
    anchor_e = rng.normal(size=(1, D)).astype(np.float32)
    anchor_a = rng.normal(size=(1, P)).astype(np.float32)
    test_e = (anchor_e + 1e-2 * rng.normal(size=(n_test_total, D))).astype(
        np.float32)
    test_a = (anchor_a + 1e-2 * rng.normal(size=(n_test_total, P))).astype(
        np.float32)
    M = rng.normal(size=(P, P)).astype(np.float32)
    A_inv = M @ M.T / P + np.eye(P, dtype=np.float32)
    M2 = rng.normal(size=(D, D)).astype(np.float32)
    B_inv = M2 @ M2.T / D + np.eye(D, dtype=np.float32)
    # a non-trivial local->original remap (representatives scattered in a
    # fictitious full train set of 1000)
    orig = rng.choice(1000, size=n_reps, replace=False).astype(np.int64)
    idx_test = np.array([1, 4, 9, 11, 14, 17])
    vals_test = rng.uniform(0, 1, size=len(idx_test)).astype(np.float32)
    return (train_e, train_a, test_e, test_a, A_inv, B_inv, orig,
            idx_test, vals_test)


def _assert_structure_match(our_out: OrderedDict, ref_out: OrderedDict,
                            k_nearest: int):
    assert list(our_out.keys()) == [int(k) for k in ref_out.keys()]
    for k in our_out:
        assert our_out[k]["indices"] == [int(x) for x in ref_out[k]["indices"]]
        np.testing.assert_allclose(
            our_out[k]["similarities"], ref_out[k]["similarities"],
            rtol=2e-3, atol=2e-4)
        assert np.isclose(our_out[k]["score"], ref_out[k]["score"])
        # the per-test cap must have engaged (k' >> k_nearest here)
        assert len(our_out[k]["indices"]) <= k_nearest


@pytest.mark.parametrize("variant", ["cosine", "wasserstein"])
def test_kmeans_knn_full_structure_parity_with_refetch(variant, capsys):
    """k_nearest=4, buffersize=5, 6 clustered test rows -> goal=24 unique
    neighbors while the initial fetch width is only 9: the reference
    re-fetches (prints 'fetching more neighbors') and k' grows to ~24.
    Both the kept-id structure (original-index remapped) and the
    similarity values must match the reference exactly."""
    (train_e, train_a, test_e, test_a, A_inv, B_inv, orig,
     idx_test, vals_test) = _make_case()
    k_nearest, buffersize = 4, 5

    ref_fn = ref_kmeans_cosine if variant == "cosine" else ref_kmeans_wasserstein
    our_fn = (find_similar_samples_cosine if variant == "cosine"
              else find_similar_samples_wasserstein)

    ref_out = ref_fn(
        RefER(torch.tensor(train_e), torch.tensor(train_a)),
        RefER(torch.tensor(test_e), torch.tensor(test_a)),
        torch.tensor(idx_test), torch.tensor(vals_test),
        original_train_indices=torch.tensor(orig),
        k_nearest=k_nearest,
        source_covariance=RefCov(torch.tensor(A_inv), torch.tensor(B_inv)),
        device="cpu", buffersize=buffersize,
    )
    # the reference narrates the re-fetch; assert the case really hit it
    assert "fetching more neighbors" in capsys.readouterr().out

    our_out = our_fn(
        EncoderResult.create(jnp.asarray(train_e), jnp.asarray(train_a)),
        EncoderResult.create(jnp.asarray(test_e), jnp.asarray(test_a)),
        idx_test, vals_test,
        original_train_indices=orig,
        k_nearest=k_nearest,
        source_covariance=KroneckerFactorizedCovariance(
            jnp.asarray(A_inv), jnp.asarray(B_inv)),
        buffersize=buffersize,
    )
    _assert_structure_match(our_out, ref_out, k_nearest)
    # remapping engaged: returned ids live in the original-train space
    all_ids = {i for d in our_out.values() for i in d["indices"]}
    assert all_ids <= set(orig.tolist())


@pytest.mark.parametrize("variant", ["cosine", "wasserstein"])
def test_kmeans_knn_parity_no_refetch(variant):
    """Easy regime (spread-out test rows, wide buffer): no re-fetch,
    matches the reference structure too — guards the common path."""
    rng = np.random.default_rng(7)
    n_reps, D, P = 30, 8, 6
    train_e = rng.normal(size=(n_reps, D)).astype(np.float32)
    train_a = rng.normal(size=(n_reps, P)).astype(np.float32)
    test_e = rng.normal(size=(12, D)).astype(np.float32)
    test_a = rng.normal(size=(12, P)).astype(np.float32)
    M = rng.normal(size=(P, P)).astype(np.float32)
    A_inv = M @ M.T / P + np.eye(P, dtype=np.float32)
    M2 = rng.normal(size=(D, D)).astype(np.float32)
    B_inv = M2 @ M2.T / D + np.eye(D, dtype=np.float32)
    orig = np.arange(100, 100 + n_reps, dtype=np.int64)
    idx_test = np.array([0, 3, 7])
    vals_test = np.array([0.5, 0.2, 0.9], np.float32)

    ref_fn = ref_kmeans_cosine if variant == "cosine" else ref_kmeans_wasserstein
    our_fn = (find_similar_samples_cosine if variant == "cosine"
              else find_similar_samples_wasserstein)

    ref_out = ref_fn(
        RefER(torch.tensor(train_e), torch.tensor(train_a)),
        RefER(torch.tensor(test_e), torch.tensor(test_a)),
        torch.tensor(idx_test), torch.tensor(vals_test),
        original_train_indices=torch.tensor(orig),
        k_nearest=2,
        source_covariance=RefCov(torch.tensor(A_inv), torch.tensor(B_inv)),
        device="cpu", buffersize=10,
    )
    our_out = our_fn(
        EncoderResult.create(jnp.asarray(train_e), jnp.asarray(train_a)),
        EncoderResult.create(jnp.asarray(test_e), jnp.asarray(test_a)),
        idx_test, vals_test,
        original_train_indices=orig,
        k_nearest=2,
        source_covariance=KroneckerFactorizedCovariance(
            jnp.asarray(A_inv), jnp.asarray(B_inv)),
        buffersize=10,
    )
    _assert_structure_match(our_out, ref_out, k_nearest=2)
