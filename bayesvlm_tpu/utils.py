"""Glue helpers mirroring ref:bayesvlm/utils.py."""

from __future__ import annotations

from typing import Tuple

from bayesvlm_tpu.constants import MODEL_NAME_MAP


def get_model_type_and_size(model_str: str) -> Tuple[str, str]:
    """'clip-base' -> ('clip', 'base')  (ref:bayesvlm/utils.py:6-8)."""
    name, size = model_str.split("-", 1)
    return name, size


def get_image_size(model_str: str) -> int:
    _, _, size = MODEL_NAME_MAP[model_str]
    return size


def get_model_url(model_str: str) -> str:
    provider, model_id, _ = MODEL_NAME_MAP[model_str]
    return f"{provider}/{model_id}"


def get_likelihood(model_type: str) -> str:
    """'clip' -> info_nce, anything else -> siglip
    (ref:bayesvlm/utils.py:23-26).

    Also accepts a full model name ('tiny-siglip', 'clip-base'): names in
    the config registry resolve through their family, so the tiny test
    variants map to their family's likelihood. A bare 'tiny' is ambiguous
    (tiny-clip vs tiny-siglip) and raises.
    """
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    if model_type in CONFIGS_BY_NAME:
        return get_likelihood_for_model(model_type)
    if model_type == "tiny":
        raise ValueError(
            "'tiny' is ambiguous (tiny-clip vs tiny-siglip); pass the full "
            "model name or use get_likelihood_for_model()"
        )
    return "info_nce" if model_type == "clip" else "siglip"


def get_likelihood_for_model(model_str: str) -> str:
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    family = CONFIGS_BY_NAME[model_str].family
    return "info_nce" if family == "clip" else "siglip"


def apply_device_flag(device: str) -> None:
    """Honor the reference CLI's --device flag (ref: e.g. zeroshot.py:140).

    "cpu" forces the CPU platform (jax.config, since the JAX_PLATFORMS env
    var can be overridden by accelerator plugins); "tpu"/"cuda"/"mps" and
    anything else keep the default platform resolution (TPU when present).
    Must be called before the JAX backend initializes.
    """
    if device == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; leave platform as-is
