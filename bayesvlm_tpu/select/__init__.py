from bayesvlm_tpu.select.scores import (
    entropy_score,
    complexity_score,
    select_topk,
    select_topk_classbalanced,
    select_topk_randomized,
    select_random,
    select_random_classbalanced,
    create_subset_json,
)

__all__ = [
    "entropy_score",
    "complexity_score",
    "select_topk",
    "select_topk_classbalanced",
    "select_topk_randomized",
    "select_random",
    "select_random_classbalanced",
    "create_subset_json",
]
