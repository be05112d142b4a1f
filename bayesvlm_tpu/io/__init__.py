from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array
from bayesvlm_tpu.io.artifacts import (
    HessianArtifacts,
    load_hessians,
    save_hessians,
    load_covariances,
)

__all__ = [
    "load_pt_array",
    "save_pt_array",
    "HessianArtifacts",
    "load_hessians",
    "save_hessians",
    "load_covariances",
]
