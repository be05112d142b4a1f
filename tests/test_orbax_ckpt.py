"""Orbax checkpoint lane: roundtrips, sharded restore, retention, and
.pt <-> orbax artifact-directory conversion (io/orbax_ckpt.py).

The .pt side of the conversion tests reuses the byte-compatible reference
contract (ref:bayesvlm/hessians.py:137-167,203-217) via io/artifacts.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayesvlm_tpu.io import artifacts
from bayesvlm_tpu.io.orbax_ckpt import (
    StepCheckpoints,
    async_save_pytree,
    checkpoint_metadata,
    has_orbax_factors,
    hessians_to_orbax,
    load_hessians_orbax,
    load_pytree,
    orbax_to_hessians,
    save_hessians_orbax,
    save_pytree,
)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "params": {
            "kernel": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(8,)), jnp.bfloat16),
        },
        "step": np.int64(7),
        "ints": jnp.arange(5, dtype=jnp.int32),
    }


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [k for k, _ in la] == [k for k, _ in lb]
    for (ka, va), (_, vb) in zip(la, lb):
        va, vb = np.asarray(va), np.asarray(vb)
        assert va.dtype == vb.dtype, ka
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))


def test_roundtrip_pytree(tmp_path):
    tree = _tree()
    save_pytree(tmp_path / "ck", tree)
    out = load_pytree(tmp_path / "ck")
    _assert_tree_equal(tree, out)


def test_overwrite(tmp_path):
    save_pytree(tmp_path / "ck", _tree(0))
    tree2 = _tree(1)
    save_pytree(tmp_path / "ck", tree2)
    _assert_tree_equal(tree2, load_pytree(tmp_path / "ck"))


def test_async_save(tmp_path):
    tree = _tree()
    with async_save_pytree(tmp_path / "ck", tree):
        pass  # context exit waits
    _assert_tree_equal(tree, load_pytree(tmp_path / "ck"))


def test_metadata_no_data_read(tmp_path):
    tree = _tree()
    save_pytree(tmp_path / "ck", tree)
    meta = checkpoint_metadata(tmp_path / "ck")
    assert tuple(meta["params"]["kernel"].shape) == (16, 8)
    assert meta["params"]["bias"].dtype == jnp.bfloat16


def test_restore_with_single_sharding(tmp_path):
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    tree = {"x": jnp.arange(64, dtype=jnp.float32).reshape(8, 8)}
    save_pytree(tmp_path / "ck", tree)
    sh = NamedSharding(mesh, P("data", None))
    out = load_pytree(tmp_path / "ck", shardings=sh)
    assert out["x"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(tree["x"]))


def test_restore_with_sharding_tree_and_like(tmp_path):
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    tree = {
        "a": jnp.arange(32, dtype=jnp.float32).reshape(8, 4),
        "b": jnp.arange(16, dtype=jnp.float32).reshape(4, 4),
    }
    save_pytree(tmp_path / "ck", tree)

    shardings = {
        "a": NamedSharding(mesh, P("data", None)),
        "b": NamedSharding(mesh, P(None, "model")),
    }
    out = load_pytree(tmp_path / "ck", shardings=shardings)
    assert out["a"].sharding == shardings["a"]
    assert out["b"].sharding == shardings["b"]
    _assert_tree_equal(tree, out)

    # `like=` path: target tree carrying shardings restores identically laid out
    like = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)
    out2 = load_pytree(tmp_path / "ck", like=like)
    assert out2["a"].sharding == shardings["a"]
    _assert_tree_equal(tree, out2)


def test_step_checkpoints_retention(tmp_path):
    with StepCheckpoints(tmp_path / "steps", max_to_keep=2) as mgr:
        for step in range(3):
            mgr.save(step, {"w": jnp.full((4,), float(step))}, wait=True)
        assert mgr.latest_step() == 2
        steps = list(mgr.all_steps())
        assert steps == [1, 2], steps  # step 0 evicted
        out = mgr.restore()
        np.testing.assert_array_equal(np.asarray(out["w"]), np.full((4,), 2.0))
        out1 = mgr.restore(1)
        np.testing.assert_array_equal(np.asarray(out1["w"]), np.full((4,), 1.0))


def test_step_checkpoints_restore_sharded(tmp_path):
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    with StepCheckpoints(tmp_path / "steps", max_to_keep=None) as mgr:
        mgr.save(0, {"w": jnp.arange(16, dtype=jnp.float32)}, wait=True)
        out = mgr.restore(0, shardings=sh)
        assert out["w"].sharding == sh
        np.testing.assert_array_equal(
            np.asarray(out["w"]), np.arange(16, dtype=np.float32))


def _write_pt_artifacts(la_dir, d_in=6, d_out=4, seed=0):
    rng = np.random.default_rng(seed)
    A_img = rng.normal(size=(d_in, d_in)).astype(np.float32)
    B_img = rng.normal(size=(d_out, d_out)).astype(np.float32)
    A_txt = rng.normal(size=(d_in, d_in)).astype(np.float32)
    B_txt = rng.normal(size=(d_out, d_out)).astype(np.float32)
    artifacts.save_hessians(la_dir, A_img, B_img, "img")
    artifacts.save_hessians(la_dir, A_txt, B_txt, "txt")
    artifacts.save_prior_precision(la_dir, 12.5, 100.0, 7.25, 80.0)
    return A_img, B_img, A_txt, B_txt


def test_hessian_dir_conversion_roundtrip(tmp_path):
    pt_dir = tmp_path / "pt_art"
    A_img, B_img, A_txt, B_txt = _write_pt_artifacts(pt_dir)

    # .pt -> orbax (in place: both lanes readable from the same directory)
    assert not has_orbax_factors(pt_dir)
    hessians_to_orbax(pt_dir)
    assert has_orbax_factors(pt_dir)
    A2, B2 = load_hessians_orbax(pt_dir, "img")
    np.testing.assert_array_equal(np.asarray(A2), A_img)
    np.testing.assert_array_equal(np.asarray(B2), B_img)
    # the shared JSON sidecar still serves artifacts.load_info
    info = artifacts.load_info(pt_dir)
    assert info["lambda_img"] == 12.5 and info["n_txt"] == 80.0

    # orbax -> .pt into a fresh directory; byte-compatible reference layout
    out_dir = tmp_path / "back_to_pt"
    orbax_to_hessians(pt_dir, out_dir)
    A3, B3, info3 = artifacts.load_hessians(out_dir, "txt", return_info=True)
    np.testing.assert_array_equal(np.asarray(A3), A_txt)
    np.testing.assert_array_equal(np.asarray(B3), B_txt)
    assert info3 == info


def test_orbax_factors_sharded_load(tmp_path):
    """Factors restore directly onto the mesh — the multi-chip Stage-2 path
    loads D x D factors already distributed."""
    la_dir = tmp_path / "art"
    A_img, *_ = _write_pt_artifacts(la_dir, d_in=8, d_out=8)
    hessians_to_orbax(la_dir)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data", None))
    A, B = load_hessians_orbax(la_dir, "img", shardings=sh)
    assert A.sharding == sh and B.sharding == sh
    np.testing.assert_array_equal(np.asarray(A), A_img)


def test_load_hessians_orbax_bad_tag(tmp_path):
    with pytest.raises(ValueError):
        load_hessians_orbax(tmp_path, "imgg")


def test_cross_topology_fallback_gate(tmp_path):
    """ADVICE r3: the cross-topology fallback must be narrow — a
    non-sharding ValueError re-raises unchanged; a sharding-population
    error warns (so the single-device landing is visible in logs)."""
    from bayesvlm_tpu.io.orbax_ckpt import _maybe_cross_topology_fallback

    # genuine metadata/dtype mismatch: propagate, no silent retry
    with pytest.raises(ValueError, match="dtype"):
        _maybe_cross_topology_fallback(
            ValueError("unexpected dtype in checkpoint"), tmp_path)

    # sharding-population failure: emit a RuntimeWarning and return
    with pytest.warns(RuntimeWarning, match="single-device restore"):
        _maybe_cross_topology_fallback(
            ValueError("sharding passed to deserialization should be "
                       "specified"), tmp_path)
