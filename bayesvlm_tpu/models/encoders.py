"""High-level encoder objects: tower + params + jitted forward.

Plays the role of the reference's `CLIPImageEncoder` / `CLIPTextEncoder` /
`SiglipImageEncoder` / `SiglipTextEncoder` modules (ref:bayesvlm/vlm.py),
returning `EncoderResult(embeds, activations, residuals)`.

The projection layer (the Laplace layer) is exposed via
`get_projection()` / `with_projection()` so the active-learning fine-tune
loop can update just that layer functionally.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.models.clip import CLIPTextTower, CLIPVisionTower
from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME, VLMConfig
from bayesvlm_tpu.models.siglip import SiglipTextTower, SiglipVisionTower
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.types import EncoderResult

Array = jax.Array

# default logit scales of the pretrained checkpoints (used when weights are
# random-initialized / unavailable offline): CLIP ln(100)≈4.6052 is the
# trained value of laion CLIP models; SigLIP base ships scale≈4.765,
# bias≈-16.5 (HF configs).
DEFAULT_LOGIT_SCALE = {"clip": 4.6052, "siglip": 4.7651}
DEFAULT_LOGIT_BIAS = {"clip": 0.0, "siglip": -16.5}


def _projection_path(family: str, tower: str) -> Tuple[str, ...]:
    if family == "clip":
        return ("visual_projection",) if tower == "vision" else ("text_projection",)
    return ("head_fc2",) if tower == "vision" else ("head",)


@dataclasses.dataclass
class _EncoderBase:
    config: VLMConfig
    params: Any
    module: Any
    tower: str  # "vision" | "text"
    mesh: Any = None  # optional data mesh: batch-sharded GSPMD forwards

    def _apply_fn(self):
        raise NotImplementedError

    def with_mesh(self, mesh) -> "_EncoderBase":
        """Return an encoder whose forwards run batch-sharded over the
        mesh's `data` axis (GSPMD; verified exact vs unsharded incl. the
        Pallas attention path — tests/test_pallas_attention.py). Params
        are placed replicated once."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), self.params
        )
        extra = {}
        if getattr(self, "quant_vars", None) is not None:
            extra["quant_vars"] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                self.quant_vars,
            )
            # device placement does not change the weights: re-pin the
            # int8 cache's source tree so _validate_quant_cache does not
            # see the new leaf objects as a params swap
            extra["quant_src"] = params
        return dataclasses.replace(self, mesh=mesh, params=params, **extra)

    def _shard_batch(self, x):
        """Batch-shard x over the mesh; pads uneven batches (caller slices
        the result back via the returned original length)."""
        if self.mesh is None or self.mesh.devices.size <= 1:
            return x, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self.mesh.devices.size
        B = x.shape[0]
        pad = (-B) % n
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec)), (
            B if pad else None
        )

    # ---- projection-layer (Laplace layer) access ----
    def projection_tree(self) -> Any:
        node = self.params
        for k in _projection_path(self.config.family, self.tower):
            node = node[k]
        return node

    def with_projection(self, new_projection: Any) -> "_EncoderBase":
        path = _projection_path(self.config.family, self.tower)

        def _set(tree, keys, value):
            if not keys:
                return value
            out = dict(tree)
            out[keys[0]] = _set(tree[keys[0]], keys[1:], value)
            return out

        return dataclasses.replace(self, params=_set(self.params, path, new_projection))

    def projection_l2(self) -> float:
        return float(
            sum(jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(self.projection_tree()))
        )

    def projection_num_params(self) -> int:
        return int(
            sum(p.size for p in jax.tree_util.tree_leaves(self.projection_tree()))
        )

    def save_projection_weights(self, path):
        """Serialize the projection params as a torch state_dict .pt —
        the reference's `torch.save(projection.state_dict())` contract
        (ref:bayesvlm/vlm.py:236-253): {'weight': [out, in]} plus
        'bias' when the projection has one (SigLIP fc2)."""
        from bayesvlm_tpu.io.torch_compat import save_pt_state_dict

        tree = jax.tree_util.tree_map(np.asarray, self.projection_tree())
        state = {"weight": np.ascontiguousarray(tree["kernel"].T)}
        if "bias" in tree:
            state["bias"] = tree["bias"]
        save_pt_state_dict(state, path)

    def load_projection_weights(self, path) -> "_EncoderBase":
        """Load a projection checkpoint (.pt written by us or by the
        reference's torch `state_dict` save) and return an updated
        encoder.

        Key checking is strict, mirroring torch's
        `Module.load_state_dict(strict=True)` that the reference relies
        on (ref:bayesvlm/vlm.py:236-253): a checkpoint whose keys do not
        match this projection's architecture (missing 'bias', unexpected
        'bias', unknown keys) raises instead of silently intersecting.
        """
        from bayesvlm_tpu.io.torch_compat import load_pt_array

        loaded = load_pt_array(path)
        proj = dict(self.projection_tree())
        if isinstance(loaded, dict):
            # torch state_dict: {'weight': [out,in], 'bias': [out]}
            expected = {"weight"} | ({"bias"} if "bias" in proj else set())
            got = set(loaded.keys())
            if got != expected:
                raise ValueError(
                    f"projection checkpoint {path} keys {sorted(got)} do not "
                    f"match this projection's state_dict keys {sorted(expected)} "
                    f"(missing: {sorted(expected - got)}, "
                    f"unexpected: {sorted(got - expected)})"
                )
            proj["kernel"] = jnp.asarray(np.ascontiguousarray(loaded["weight"].T))
            if "bias" in loaded:
                proj["bias"] = jnp.asarray(loaded["bias"])
        else:
            if "bias" in proj:
                raise ValueError(
                    f"projection checkpoint {path} is a bare kernel array but "
                    "this projection has a bias; a full state_dict "
                    "{'weight', 'bias'} is required (SigLIP fc2)"
                )
            proj["kernel"] = jnp.asarray(np.ascontiguousarray(np.asarray(loaded).T))
        return self.with_projection(proj)


def _image_forward_graph(module, family: str, params, quant, pixels) -> EncoderResult:
    """Pure traceable image forward (no jit, no sharding): uint8
    normalize lane + family-specific output packing. Shared by the
    jitted __call__ path and the AOT-fused serving program
    (pipeline.ProbabilisticVLM.compile_serving)."""
    if pixels.dtype == jnp.uint8:
        # uint8 ingest lane: /255 + mean/std normalize in-graph
        # (XLA fuses it into the patch conv); the host ships raw
        # uint8 crops — 4x less H2D traffic (data/transforms.py
        # *_uint8 variants, native decode_batch_u8)
        from bayesvlm_tpu.data.transforms import NORMALIZATION_BY_FAMILY

        mean, std = NORMALIZATION_BY_FAMILY[family]
        x = pixels.astype(jnp.float32) / 255.0
        pixels = (x - jnp.asarray(mean, jnp.float32)) \
            / jnp.asarray(std, jnp.float32)
    cols = {"params": params}
    if quant is not None:
        cols["int8"] = quant
    out = module.apply(cols, pixels)
    if family == "siglip":
        embeds, activations, residuals = out
        return EncoderResult(embeds=embeds, activations=activations, residuals=residuals)
    embeds, activations = out
    return EncoderResult.create(embeds=embeds, activations=activations)


# Jitted forwards are cached per (module, family) at module level: flax
# modules hash/compare structurally, and every dataclasses.replace-derived
# encoder (with_projection, with_mesh, prequantize_int8, load_projection_
# weights) keeps the same module object — a per-instance jax.jit in
# __post_init__ would discard the trace cache on each derivation and
# re-trace the whole tower (minutes per compile on a 1-vCPU host when the
# persistent cache misses).
@partial(jax.jit, static_argnames=("module", "family"))
def _image_fwd(module, family, params, quant, pixels):
    return _image_forward_graph(module, family, params, quant, pixels)


@partial(jax.jit, static_argnames=("module",))
def _text_fwd(module, params, input_ids):
    embeds, activations = module.apply({"params": params}, input_ids)
    return EncoderResult.create(embeds=embeds, activations=activations)


@dataclasses.dataclass
class ImageEncoder(_EncoderBase):
    """Vision tower wrapper. Call with NHWC float images."""

    # prequantized W8A8 weight cache ("int8" variables collection,
    # stacked per-layer like params) — see prequantize_int8()
    quant_vars: Any = None
    # the params tree the cache was derived from (identity-checked per
    # call so the cache can never silently outlive its weights)
    quant_src: Any = None

    def forward_graph(self, params, quant, pixels) -> EncoderResult:
        """Pure traceable forward — see _image_forward_graph."""
        return _image_forward_graph(
            self.module, self.config.family, params, quant, pixels
        )

    def _fwd(self, params, quant, pixels) -> EncoderResult:
        return _image_fwd(self.module, self.config.family, params, quant,
                          pixels)

    def __call__(self, images: Array) -> EncoderResult:
        if images.ndim == 4 and images.shape[1] == 3 and images.shape[-1] != 3:
            images = jnp.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
        self._validate_quant_cache()
        xs, orig = self._shard_batch(jnp.asarray(images))
        res = self._fwd(self.params, self.quant_vars, xs)
        return res if orig is None else res[:orig]

    def _non_projection_leaves(self, params) -> tuple:
        """Param leaves the int8 cache derives from: everything outside
        the projection subtree (projection updates keep the cache valid
        — the Laplace layer is outside the MLP sublayers)."""
        proj_head = _projection_path(self.config.family, self.tower)[0]
        return tuple(
            leaf
            for key in sorted(k for k in params if k != proj_head)
            for leaf in jax.tree_util.tree_leaves(params[key])
        )

    def _validate_quant_cache(self):
        """Guard against a stale W8A8 cache after a params swap (ADVICE
        round-2): fast path is one `is` check on the params tree object;
        on replacement, compare non-projection leaves by identity and
        requantize (with a warning) only when the MLP weights really
        changed. Mutates the cache fields in place — they are a cache,
        not model state."""
        if self.quant_vars is None:
            return
        if self.params is self.quant_src:
            return
        src = (self._non_projection_leaves(self.quant_src)
               if self.quant_src is not None else None)
        cur = self._non_projection_leaves(self.params)
        if src is not None and len(src) == len(cur) and all(
            a is b for a, b in zip(cur, src)
        ):
            # projection-only update (with_projection / load_projection_
            # weights): cache still valid, re-pin to the new tree
            self.quant_src = self.params
            return
        import warnings

        warnings.warn(
            "ImageEncoder params were replaced after prequantize_int8(); "
            "recomputing the W8A8 weight cache from the new params.",
            RuntimeWarning, stacklevel=3,
        )
        fresh = self.prequantize_int8()
        self.quant_vars = fresh.quant_vars
        self.quant_src = fresh.quant_src

    def prequantize_int8(self) -> "ImageEncoder":
        """Precompute the W8A8 weight cache so int8 forwards skip the
        per-call weight quantization (measured 1.06 ms/call for all
        ViT-L MLPs — ~25% of a B=1 serving forward; BASELINE.md "int8
        prequantization"). No-op unless the tower has an int8 path
        enabled (mlp_int8). Projection updates (with_projection) keep
        the cache valid — the Laplace projection is outside the MLP
        sublayers. A full params swap is detected per call
        (_validate_quant_cache) and the cache is recomputed with a
        warning, so it can never silently outlive its weights."""
        vcfg = self.config.vision
        if not getattr(vcfg, "mlp_int8", False):
            return self
        dummy = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3),
                          jnp.float32)
        _, variables = self.module.apply(
            {"params": self.params}, dummy, mutable=["int8"]
        )
        quant = variables.get("int8")
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            quant = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, NamedSharding(self.mesh, P())), quant
            )
        return dataclasses.replace(self, quant_vars=quant,
                                   quant_src=self.params)


@dataclasses.dataclass
class TextEncoder(_EncoderBase):
    """Text tower wrapper. Call with int32 token ids [B, T]."""

    tokenizer: Optional[Callable] = None

    def __call__(self, input_ids: Array) -> EncoderResult:
        xs, orig = self._shard_batch(jnp.asarray(input_ids))
        res = _text_fwd(self.module, self.params, xs)
        return res if orig is None else res[:orig]

    def encode_texts(self, texts) -> EncoderResult:
        if self.tokenizer is None:
            raise ValueError(
                "no tokenizer attached; pass token ids directly or attach one "
                "via bayesvlm_tpu.data.tokenizer"
            )
        ids = self.tokenizer(texts)
        return self(jnp.asarray(ids, jnp.int32))


_GEMM_MODULES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def cast_gemm_params(params, dtype=jnp.bfloat16):
    """Pre-cast the big GEMM weights (attention projections + MLP) to the
    compute dtype so the convert doesn't run on-device every forward
    (measured ~2.9 ms/batch of pure convert ops at ViT-L B=64 — trace in
    BASELINE.md round 2). LayerNorm/embedding/projection params stay fp32
    (the fp32-LN numerics contract is preserved: casting the GEMM weight
    produces bit-identical values to XLA's per-call convert)."""

    def _cast(path, leaf):
        names = {getattr(k, "key", None) for k in path}
        if names & set(_GEMM_MODULES):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(_cast, params)


def _make_towers(config: VLMConfig, dtype, remat: bool):
    # Production fast path: on a real TPU backend, run the vision tower's
    # attention through the fused Pallas kernel (scores stay in VMEM;
    # measured +17% ViT-L throughput, 0 argmax flips — BASELINE.md). CPU
    # backends keep the einsum path (the kernel would run interpreted).
    if not config.vision.attn_pallas and jax.default_backend() == "tpu":
        import dataclasses

        config = dataclasses.replace(
            config, vision=dataclasses.replace(config.vision, attn_pallas=True)
        )
    if config.family == "clip":
        return (
            CLIPVisionTower(config.vision, dtype=dtype, remat=remat),
            CLIPTextTower(config.text, dtype=dtype, remat=remat),
        )
    return (
        SiglipVisionTower(config.vision, dtype=dtype, remat=remat),
        SiglipTextTower(config.text, dtype=dtype, remat=remat),
    )


def init_params(config: VLMConfig, seed: int = 0, dtype=jnp.float32, remat=False,
                towers=None):
    """Random-init both towers' params. `towers=(vision, text)` reuses
    already-constructed modules instead of building fresh ones (load_model
    passes its own so flags like remat stay in sync)."""
    vision, text = towers if towers is not None else _make_towers(config, dtype, remat)
    k1, k2 = jax.random.split(jax.random.key(seed))
    img = jnp.zeros((1, config.vision.image_size, config.vision.image_size, 3), dtype)
    ids = jnp.zeros((1, config.text.max_length), jnp.int32)
    vparams = vision.init(k1, img)["params"]
    tparams = text.init(k2, ids)["params"]
    return vparams, tparams


def load_model(
    model_str: str,
    weights_dir: Optional[str] = None,
    dtype=jnp.bfloat16,
    seed: int = 0,
    remat: bool = False,
    mlp_int8: bool = False,
    attn_int8: bool = False,
    mlp_weight_bits: int = 8,
) -> Tuple[ImageEncoder, TextEncoder, ProbabilisticHead]:
    """Build (image_encoder, text_encoder, similarity head) for a model name
    (ref:bayesvlm/utils.py:28-46).

    `weights_dir`: local HF snapshot directory (offline). When None, params
    are randomly initialized — useful for tests/benchmarks; real runs must
    pass converted weights.

    `mlp_int8` / `attn_int8`: run the vision tower's MLP sublayers /
    attention projections through the fused W8A8 int8 kernels
    (models/mlp_int8.py, models/linear_int8.py) — approximate
    (calibration deltas in BASELINE.md), throughput numbers there too.
    Param trees are unchanged, so checkpoints/converters are
    unaffected.
    """
    import dataclasses as _dc

    config = CONFIGS_BY_NAME[model_str]
    if mlp_int8 or attn_int8:
        config = _dc.replace(
            config, vision=_dc.replace(
                config.vision, mlp_int8=mlp_int8, attn_int8=attn_int8,
                mlp_weight_bits=mlp_weight_bits,
            )
        )
    vision, text = _make_towers(config, dtype, remat)

    if weights_dir is not None:
        wd = Path(weights_dir)
        if (wd / "vision.msgpack").exists():
            # pre-converted cache written by scripts/convert_weights.py
            import json as _json

            from flax import serialization

            vparams = jax.tree_util.tree_map(
                jnp.asarray,
                serialization.msgpack_restore((wd / "vision.msgpack").read_bytes()),
            )
            tparams = jax.tree_util.tree_map(
                jnp.asarray,
                serialization.msgpack_restore((wd / "text.msgpack").read_bytes()),
            )
            head_info = _json.loads((wd / "head.json").read_text())
            scale = head_info.get("logit_scale")
            bias = head_info.get("logit_bias", 0.0)
            if scale is None:
                scale = DEFAULT_LOGIT_SCALE[config.family]
        else:
            from bayesvlm_tpu.models.convert import (
                _load_state_dict,
                convert_from_snapshot,
                load_logit_scale_bias,
            )

            vparams = jax.tree_util.tree_map(
                jnp.asarray,
                convert_from_snapshot(wd, config.family, "vision", config.vision.num_layers),
            )
            tparams = jax.tree_util.tree_map(
                jnp.asarray,
                convert_from_snapshot(wd, config.family, "text", config.text.num_layers),
            )
            scale, bias = load_logit_scale_bias(_load_state_dict(wd))
            if scale is None:
                scale = DEFAULT_LOGIT_SCALE[config.family]
    else:
        vparams, tparams = init_params(config, seed=seed, dtype=dtype,
                                       towers=(vision, text))
        scale = DEFAULT_LOGIT_SCALE[config.family]
        bias = DEFAULT_LOGIT_BIAS[config.family]

    image_encoder = ImageEncoder(config=config, params=vparams, module=vision, tower="vision")
    text_encoder = TextEncoder(config=config, params=tparams, module=text, tower="text")
    head = ProbabilisticHead.create(
        logit_scale=scale,
        logit_bias=bias if config.family == "siglip" else 0.0,
        has_bias=config.projection_has_bias,
    )
    return image_encoder, text_encoder, head
