from bayesvlm_tpu.probforward.kernels.smith_pallas import (
    fused_probit_probs,
    smith_probit_probs_reference,
)

__all__ = ["fused_probit_probs", "smith_probit_probs_reference"]
