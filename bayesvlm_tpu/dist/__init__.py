from bayesvlm_tpu.dist.mesh import make_mesh, default_mesh, data_sharding, replicated
from bayesvlm_tpu.dist.hessian_allreduce import (
    sharded_hessian_infonce,
    sharded_activation_gram,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "data_sharding",
    "replicated",
    "sharded_hessian_infonce",
    "sharded_activation_gram",
]
