from bayesvlm_tpu.probforward.smith import (
    ProbabilisticHead,
    probabilistic_logits,
    deterministic_logits,
    activation_diag_covariance,
)

__all__ = [
    "ProbabilisticHead",
    "probabilistic_logits",
    "deterministic_logits",
    "activation_diag_covariance",
]
