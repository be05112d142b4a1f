from bayesvlm_tpu.models.configs import (
    VisionConfig,
    TextConfig,
    VLMConfig,
    CLIP_B32_CONFIG,
    CLIP_L14_CONFIG,
    CLIP_H14_CONFIG,
    SIGLIP_BASE_CONFIG,
    SIGLIP_LARGE_CONFIG,
    TINY_CLIP_CONFIG,
    TINY_SIGLIP_CONFIG,
)
from bayesvlm_tpu.models.clip import CLIPVisionTower, CLIPTextTower
from bayesvlm_tpu.models.siglip import SiglipVisionTower, SiglipTextTower
from bayesvlm_tpu.models.encoders import (
    ImageEncoder,
    TextEncoder,
    cast_gemm_params,
    load_model,
)

__all__ = [
    "VisionConfig",
    "TextConfig",
    "VLMConfig",
    "CLIP_B32_CONFIG",
    "CLIP_L14_CONFIG",
    "CLIP_H14_CONFIG",
    "SIGLIP_BASE_CONFIG",
    "SIGLIP_LARGE_CONFIG",
    "TINY_CLIP_CONFIG",
    "TINY_SIGLIP_CONFIG",
    "CLIPVisionTower",
    "CLIPTextTower",
    "SiglipVisionTower",
    "SiglipTextTower",
    "ImageEncoder",
    "TextEncoder",
    "cast_gemm_params",
    "load_model",
]
