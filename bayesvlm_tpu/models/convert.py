"""HF checkpoint -> Flax parameter conversion (offline).

Converts torch state dicts of the HF models the reference wraps
(`CLIPVisionModelWithProjection`, `CLIPTextModelWithProjection`,
`SiglipVisionModel`, `SiglipTextModel`, ref:bayesvlm/vlm.py:8-16) into the
parameter pytrees of our Flax towers. torch is only used as a file codec;
all outputs are NumPy. Works from a local HF snapshot directory (no
network): pass the directory containing `*.safetensors` or
`pytorch_model.bin`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np


def _load_state_dict(model_dir: Path) -> Dict[str, np.ndarray]:
    model_dir = Path(model_dir)
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        out = {}
        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    t = sf.get_tensor(k)
                    # real laion/SigLIP snapshots ship fp16/bf16
                    # safetensors; normalize float-kind tensors (incl.
                    # ml_dtypes bf16, numpy kind 'V') to the fp32 param
                    # store convention (the torch .bin path does the same
                    # via .float() below; compute dtype is applied at
                    # load via cast_gemm_params)
                    if t.dtype.kind in ("f", "V"):
                        t = t.astype(np.float32)
                    out[k] = t
        return out
    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint files in {model_dir}")
    import torch

    out = {}
    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            out[k] = v.float().numpy()
    return out


def _linear(sd, prefix, bias=True):
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"ln": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _encoder_layers(sd, prefix, num_layers):
    """Per-layer HF weights -> scan-stacked [L, ...] flax layout
    (see TransformerEncoder: one nn.scan block over stacked params)."""
    per_layer = []
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        per_layer.append({
            "layer_norm1": _ln(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lp}.layer_norm2"),
            "self_attn": {
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            },
        })

    def _stack(trees):
        if isinstance(trees[0], dict):
            return {k: _stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees, axis=0)

    return {"layers": {"block": _stack(per_layer)}}


def _conv_ohwi(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_clip_vision(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    pre_ln = (
        "vision_model.pre_layrnorm"  # HF's historical typo
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    return {
        "patch_embedding": {
            "kernel": _conv_ohwi(sd["vision_model.embeddings.patch_embedding.weight"])
        },
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "position_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "pre_layernorm": _ln(sd, pre_ln),
        "encoder": _encoder_layers(sd, "vision_model.encoder", num_layers),
        "post_layernorm": _ln(sd, "vision_model.post_layernorm"),
        "visual_projection": {"kernel": np.ascontiguousarray(sd["visual_projection.weight"].T)},
    }


def convert_clip_text(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    return {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]
        },
        "position_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "encoder": _encoder_layers(sd, "text_model.encoder", num_layers),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": {"kernel": np.ascontiguousarray(sd["text_projection.weight"].T)},
    }


def convert_siglip_vision(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    # packed torch MultiheadAttention in_proj -> split q/k/v
    in_w = sd["vision_model.head.attention.in_proj_weight"]
    in_b = sd["vision_model.head.attention.in_proj_bias"]
    D = in_w.shape[1]
    qw, kw, vw = in_w[:D], in_w[D : 2 * D], in_w[2 * D :]
    qb, kb, vb = in_b[:D], in_b[D : 2 * D], in_b[2 * D :]
    return {
        "patch_embedding": {
            "kernel": _conv_ohwi(sd["vision_model.embeddings.patch_embedding.weight"]),
            "bias": sd["vision_model.embeddings.patch_embedding.bias"],
        },
        "position_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "encoder": _encoder_layers(sd, "vision_model.encoder", num_layers),
        "post_layernorm": _ln(sd, "vision_model.post_layernorm"),
        "probe": sd["vision_model.head.probe"],
        "head_attention": {
            "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
            "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
            "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
            "out_proj": _linear(sd, "vision_model.head.attention.out_proj"),
        },
        "head_layernorm": _ln(sd, "vision_model.head.layernorm"),
        "head_fc1": _linear(sd, "vision_model.head.mlp.fc1"),
        "head_fc2": _linear(sd, "vision_model.head.mlp.fc2"),
    }


def convert_siglip_text(sd: Dict[str, np.ndarray], num_layers: int) -> dict:
    return {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]
        },
        "position_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "encoder": _encoder_layers(sd, "text_model.encoder", num_layers),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        "head": _linear(sd, "text_model.head"),
    }


def load_logit_scale_bias(sd: Dict[str, np.ndarray]):
    scale = float(sd["logit_scale"]) if "logit_scale" in sd else None
    bias = float(sd["logit_bias"]) if "logit_bias" in sd else 0.0
    return scale, bias


def convert_from_snapshot(model_dir, family: str, tower: str, num_layers: int) -> dict:
    """Convert one tower from a local HF snapshot directory."""
    sd = _load_state_dict(Path(model_dir))
    fn = {
        ("clip", "vision"): convert_clip_vision,
        ("clip", "text"): convert_clip_text,
        ("siglip", "vision"): convert_siglip_vision,
        ("siglip", "text"): convert_siglip_text,
    }[(family, tower)]
    return fn(sd, num_layers)
