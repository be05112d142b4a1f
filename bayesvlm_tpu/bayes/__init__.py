from bayesvlm_tpu.bayes.kfac import (
    KroneckerFactorizedCovariance,
    compute_covariance,
    compute_covariances,
    regularize_kfac_factor,
)
from bayesvlm_tpu.bayes.prior import optimize_prior_precision
from bayesvlm_tpu.bayes.hessians import (
    hessian_infonce,
    hessian_siglip,
    activation_gram,
)

__all__ = [
    "KroneckerFactorizedCovariance",
    "compute_covariance",
    "compute_covariances",
    "regularize_kfac_factor",
    "optimize_prior_precision",
    "hessian_infonce",
    "hessian_siglip",
    "activation_gram",
]
