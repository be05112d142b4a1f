"""Projection checkpoints must carry the SigLIP bias — the reference's
torch.save(projection.state_dict()) contract
(ref:scripts/activelearning.py:657-660): {'weight': [out, in]} plus
'bias' for biased projections. Covers the torch writer, the pure-NumPy
dict writer, and the torch loader reading the NumPy-written file."""

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.io import torch_compat as tc
from bayesvlm_tpu.models import load_model


def test_siglip_projection_roundtrip_keeps_bias(tmp_path):
    img_enc, _, _ = load_model("tiny-siglip", dtype=jnp.float32, seed=0)
    tree = img_enc.projection_tree()
    assert "bias" in tree, "siglip fc2 projection must be biased"

    path = tmp_path / "proj.pt"
    img_enc.save_projection_weights(path)
    loaded = tc.load_pt_array(path)
    assert isinstance(loaded, dict) and set(loaded) == {"weight", "bias"}
    np.testing.assert_allclose(loaded["weight"],
                               np.asarray(tree["kernel"]).T, rtol=1e-6)
    np.testing.assert_allclose(loaded["bias"], np.asarray(tree["bias"]),
                               rtol=1e-6)

    zeroed = img_enc.with_projection({
        "kernel": jnp.zeros_like(tree["kernel"]),
        "bias": jnp.zeros_like(tree["bias"]),
    })
    restored = zeroed.load_projection_weights(path)
    np.testing.assert_allclose(
        np.asarray(restored.projection_tree()["bias"]),
        np.asarray(tree["bias"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored.projection_tree()["kernel"]),
        np.asarray(tree["kernel"]), rtol=1e-6)


def test_mismatched_checkpoint_keys_raise(tmp_path):
    # strict load_state_dict semantics: a checkpoint whose keys disagree
    # with the projection's architecture must raise, never silently
    # intersect (previously a biasless checkpoint kept the stale bias)
    import pytest

    siglip_img, _, _ = load_model("tiny-siglip", dtype=jnp.float32, seed=0)
    clip_img, _, _ = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    tree = siglip_img.projection_tree()

    no_bias = tmp_path / "no_bias.pt"
    tc.save_pt_state_dict(
        {"weight": np.asarray(tree["kernel"]).T.copy()}, no_bias)
    with pytest.raises(ValueError, match="missing.*bias"):
        siglip_img.load_projection_weights(no_bias)

    extra_bias = tmp_path / "extra_bias.pt"
    d = clip_img.projection_tree()["kernel"]
    tc.save_pt_state_dict(
        {"weight": np.asarray(d).T.copy(),
         "bias": np.zeros(d.shape[1], np.float32)}, extra_bias)
    with pytest.raises(ValueError, match="unexpected.*bias"):
        clip_img.load_projection_weights(extra_bias)

    bare = tmp_path / "bare.pt"
    tc.save_pt_array(np.asarray(tree["kernel"]).T.copy(), bare)
    with pytest.raises(ValueError, match="bare kernel"):
        siglip_img.load_projection_weights(bare)


def test_numpy_dict_writer_torch_readable(tmp_path):
    rng = np.random.default_rng(0)
    state = {
        "weight": rng.normal(size=(8, 6)).astype(np.float32),
        "bias": rng.normal(size=(8,)).astype(np.float32),
    }
    path = tmp_path / "sd.pt"
    tc._save_pt_numpy_dict(state, path)

    # pure-NumPy reader
    got = tc._load_pt_numpy(path)
    assert set(got) == {"weight", "bias"}
    np.testing.assert_array_equal(got["weight"], state["weight"])
    np.testing.assert_array_equal(got["bias"], state["bias"])

    # real torch must read the hand-rolled zipfile too
    try:
        import torch
    except ImportError:
        return
    t = torch.load(path, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(t["weight"].numpy(), state["weight"])
    np.testing.assert_array_equal(t["bias"].numpy(), state["bias"])
