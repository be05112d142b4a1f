"""BayesVLM-TPU: a TPU-native (JAX/XLA/Pallas) framework for post-hoc
probabilistic vision-language models.

Re-implements the capabilities of the BayesVLM reference (post-hoc
Kronecker-factored Laplace over the final projection layers of frozen
CLIP/SigLIP, analytic propagation of weight uncertainty into image-text
similarity logits, calibrated zero-shot prediction, uncertainty-based data
selection and probabilistic retrieval) as an idiomatic JAX framework:

- all hot math is jit-compiled XLA with static shapes,
- the contrastive GGN Hessians are reformulated from per-sample [B,D,D]
  tensor products into pure weighted-Gram GEMMs that map onto the MXU,
- multi-chip scaling is SPMD over a `jax.sharding.Mesh` (batch-sharded
  encoders, psum-reduced Hessian factors over ICI), not a port of any
  single-device loop.

Reference behavior citations use `ref:<file>:<line>` pointing into the
upstream BayesVLM repository.
"""

from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits
from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance

__version__ = "0.1.0"

__all__ = [
    "EncoderResult",
    "ProbabilisticLogits",
    "KroneckerFactorizedCovariance",
    "__version__",
]
