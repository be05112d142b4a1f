from bayesvlm_tpu.data.factory import DataModuleFactory, SUPPORTED_MODULES
from bayesvlm_tpu.data.base import DataModule
from bayesvlm_tpu.data.loader import DataLoader, default_collate
from bayesvlm_tpu.data.transforms import (
    default_transform,
    siglip_transform,
    corruption_transform,
    get_transform,
)
from bayesvlm_tpu.data.tokenizer import HFTokenizer, HashTokenizer
from bayesvlm_tpu.data.synthetic import SyntheticDataModule

__all__ = [
    "DataModuleFactory",
    "SUPPORTED_MODULES",
    "DataModule",
    "DataLoader",
    "default_collate",
    "default_transform",
    "siglip_transform",
    "corruption_transform",
    "get_transform",
    "HFTokenizer",
    "HashTokenizer",
    "SyntheticDataModule",
]
