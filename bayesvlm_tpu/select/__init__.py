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
from bayesvlm_tpu.select.knn import (
    wdist2,
    diagonal_wasserstein_distance,
    expected_cosine_similarity,
    find_similar_samples_cosine,
    find_similar_samples_wasserstein,
    extract_test_train_indices,
)
from bayesvlm_tpu.select.epig import (
    epig_from_logits_using_matmul,
    epig_from_probs_using_matmul,
    entropy_from_probs,
    marginal_entropy_from_probs,
    select_epig_online,
    update_embeddings,
)
from bayesvlm_tpu.select.egl import expected_gradient_length, select_egl
from bayesvlm_tpu.select.kmeans import (
    kmeans_fit,
    cluster_and_select_representatives,
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
    "wdist2",
    "diagonal_wasserstein_distance",
    "expected_cosine_similarity",
    "find_similar_samples_cosine",
    "find_similar_samples_wasserstein",
    "extract_test_train_indices",
    "epig_from_logits_using_matmul",
    "epig_from_probs_using_matmul",
    "entropy_from_probs",
    "marginal_entropy_from_probs",
    "select_epig_online",
    "update_embeddings",
    "expected_gradient_length",
    "select_egl",
    "kmeans_fit",
    "cluster_and_select_representatives",
]
