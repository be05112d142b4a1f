"""Model registry (ref:bayesvlm/constants.py:1-6).

name -> (provider, hf model id, image size). Kept identical to the
reference so CLI flags stay drop-in compatible.
"""

MODEL_NAME_MAP = {
    "clip-base": ("laion", "CLIP-ViT-B-32-laion2B-s34B-b79K", 224),
    "clip-large": ("laion", "CLIP-ViT-L-14-laion2B-s32B-b82K", 224),
    "clip-huge": ("laion", "CLIP-ViT-H-14-laion2B-s32B-b79K", 224),
    "siglip-base": ("google", "siglip-base-patch16-256", 265),
    "siglip-large": ("google", "siglip-large-patch16-256", 265),
    # test-only tiny configs (no HF counterpart)
    "tiny-clip": (None, None, 32),
    "tiny-siglip": (None, None, 32),
}
