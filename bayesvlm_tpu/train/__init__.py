from bayesvlm_tpu.train.finetune import evaluate_projection, finetune_projection
from bayesvlm_tpu.train.logging import ExperimentLogger

__all__ = ["evaluate_projection", "finetune_projection", "ExperimentLogger"]
