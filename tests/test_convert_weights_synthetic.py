"""Converter H2H on a hand-built safetensors checkpoint (VERDICT r3 #5).

Real pretrained weights cannot be downloaded in this environment, but the
checkpoint-LOADING contract (ref:bayesvlm/vlm.py:226-253 wraps HF
`from_pretrained`) is testable offline: build a tiny HF `CLIPModel` from a
config object, serialize its state dict as real `*.safetensors` files in
the exact on-disk shapes laion snapshots use (fp16/bf16 dtypes, sharded
files, stale `position_ids` buffers), run `scripts/convert_weights.py` on
the snapshot, and require the loaded Flax towers to reproduce the HF
model's features head-to-head.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

RTOL, ATOL = 2e-3, 2e-4


def _tiny_hf_clip():
    """HF CLIPModel matching CONFIGS_BY_NAME['tiny-clip'] dims."""
    cfg = transformers.CLIPConfig(
        text_config={
            "vocab_size": 64, "hidden_size": 24, "intermediate_size": 48,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "hidden_act": "gelu",
            "eos_token_id": 63, "bos_token_id": 0, "pad_token_id": 1,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8, "hidden_act": "gelu",
        },
        projection_dim=16,
    )
    return transformers.CLIPModel(cfg).eval()


def _state_dict_np(model, cast):
    """state dict as numpy in `cast` dtype (floats only), plus the stale
    int64 position_ids buffers older HF snapshots ship."""
    sd = {}
    for k, v in model.state_dict().items():
        a = v.detach().numpy()
        if a.dtype.kind == "f":
            a = a.astype(cast)
        sd[k] = a
    sd["text_model.embeddings.position_ids"] = np.arange(16, dtype=np.int64)[None]
    sd["vision_model.embeddings.position_ids"] = np.arange(17, dtype=np.int64)[None]
    return sd


def _write_sharded_safetensors(sd, snapshot_dir):
    """Split the dict over two shard files the way large HF snapshots do."""
    from safetensors.numpy import save_file

    snapshot_dir.mkdir(parents=True, exist_ok=True)
    keys = sorted(sd)
    half = len(keys) // 2
    save_file({k: sd[k] for k in keys[:half]},
              snapshot_dir / "model-00001-of-00002.safetensors")
    save_file({k: sd[k] for k in keys[half:]},
              snapshot_dir / "model-00002-of-00002.safetensors")


def _round_weights_like(hf, cast_name):
    """Round the torch model's weights through fp16/bf16 so the H2H
    comparison uses the SAME rounded weights the snapshot stored."""
    if cast_name == "float16":
        return hf.half().float()
    return hf.bfloat16().float()


def _all_float32(tree):
    leaves = []

    def rec(t):
        if isinstance(t, dict):
            for v in t.values():
                rec(v)
        else:
            leaves.append(t)

    rec(tree)
    return all(np.asarray(l).dtype == np.float32 for l in leaves)


@pytest.mark.parametrize("cast", ["float16", "bfloat16"])
def test_convert_weights_synthetic_safetensors(tmp_path, cast):
    import convert_weights as cw

    from bayesvlm_tpu.models import load_model

    hf = _tiny_hf_clip()
    if cast == "float16":
        sd = _state_dict_np(hf, np.float16)
    else:
        import ml_dtypes

        sd = _state_dict_np(hf, ml_dtypes.bfloat16)

    snapshot = tmp_path / "snapshot"
    _write_sharded_safetensors(sd, snapshot)
    out = tmp_path / "weights"
    cw.main("tiny-clip", str(snapshot), str(out))

    for f in ("vision.msgpack", "text.msgpack", "head.json"):
        assert (out / f).exists(), f

    # converted leaves are normalized to the fp32 param-store convention
    from flax import serialization

    vtree = serialization.msgpack_restore((out / "vision.msgpack").read_bytes())
    ttree = serialization.msgpack_restore((out / "text.msgpack").read_bytes())
    assert _all_float32(vtree) and _all_float32(ttree)

    img_enc, txt_enc, head = load_model(
        "tiny-clip", weights_dir=str(out), dtype=jnp.float32)

    # H2H vs the torch model with identically-rounded weights
    hf = _round_weights_like(hf, cast)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(2, 60, size=(3, 16)).astype(np.int64)
    ids[:, 0] = 0
    ids[0, 7] = 63
    ids[1, 12] = 63
    ids[2, 15] = 63

    with torch.no_grad():
        hf_img = hf.get_image_features(pixel_values=torch.tensor(x)).numpy()
        hf_txt = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()

    r_img = img_enc(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.asarray(r_img.embeds), hf_img, rtol=RTOL, atol=ATOL)

    r_txt = txt_enc(jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(r_txt.embeds), hf_txt, rtol=RTOL, atol=ATOL)

    # the similarity head picked up the stored logit_scale
    import json

    info = json.loads((out / "head.json").read_text())
    assert head.logit_scale == pytest.approx(info["logit_scale"])
    assert info["logit_scale"] == pytest.approx(
        float(hf.logit_scale.detach()), rel=1e-2)
