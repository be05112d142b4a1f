#!/usr/bin/env python
"""Stage-3 variant: k-means representative pre-filter before kNN support
selection (ref:scripts/activelearning_kmeans.py).

The train pool is clustered (jitted Lloyd k-means instead of sklearn),
kNN runs over the representatives only, and hits are remapped to
original train indices (bayesvlm_tpu.select.knn_kmeans). Fine-tuning uses
early stopping with patience 15 (ref:activelearning_kmeans.py:367).
"""

import argparse
import json
import sys
from collections import OrderedDict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_knn_kmeans(
    reps, embeds_test, indices_test, values_test, original_train_indices,
    k_nearest, source_covariance, method, proj_has_bias=False,
):
    from bayesvlm_tpu.select.knn_kmeans import (
        find_similar_samples_cosine,
        find_similar_samples_wasserstein,
    )

    fn = (
        find_similar_samples_cosine
        if method == "cosine"
        else find_similar_samples_wasserstein
    )
    return fn(
        reps, embeds_test, indices_test, values_test, original_train_indices,
        k_nearest, source_covariance, has_bias=proj_has_bias,
    )


def main(
    model_str: str,
    dataset: str,
    hessian_dir: str,
    experiment_dir: str,
    project_name: str,
    hessian_scale: float,
    subset_size: int,
    k_clusters: int = 1000,
    predictions_batch_size: int = 256,
    precompute_batch_size: int = 256,
    precompute_num_workers: int = 8,
    finetune_lr: float = 1e-5,
    finetune_wd: float = 5e-2,
    finetune_epochs: int = 100,
    finetune_batch_size: int = 30,
    k_nearest: int = 1,
    knn_method: str = "wasserstein",
    early_stopping_patience: int = 15,
    weights_dir=None,
    tokenizer_dir=None,
):
    import jax.numpy as jnp

    from bayesvlm_tpu.inference.predictions import make_predictions
    from bayesvlm_tpu.select.kmeans import cluster_and_select_representatives
    from bayesvlm_tpu.select.scores import select_random, select_topk
    from bayesvlm_tpu.train.al_common import finetune_all_subsets, setup_context

    ctx = setup_context(
        model_str, dataset, hessian_dir, experiment_dir, hessian_scale,
        precompute_batch_size, precompute_num_workers, weights_dir, tokenizer_dir,
    )
    head = ctx.head

    print("[2] Making predictions ...")
    prob_logits_test = make_predictions(
        head, ctx.image_outputs_test, ctx.label_outputs,
        batch_size=predictions_batch_size,
    )
    prob_logits_test_map = make_predictions(
        head, ctx.image_outputs_test, ctx.label_outputs,
        batch_size=predictions_batch_size, map_estimate=True,
    )

    print("[2b] Clustering train pool ...")
    rep_idx, reps = cluster_and_select_representatives(
        ctx.image_outputs_train, k_clusters=min(k_clusters, len(ctx.image_outputs_train)),
    )

    subset_dir = ctx.run_dir / (
        f"kmeans_subset_{subset_size}_k_{k_nearest}_c_{k_clusters}"
        f"_n_{hessian_scale}_knn_{knn_method}"
    )
    subset_dir.mkdir(parents=True, exist_ok=True)
    json_path = subset_dir / "subset_indices_train.json"
    if json_path.exists():
        with open(json_path) as f:
            subset_indices_train = json.load(f, object_pairs_hook=OrderedDict)
    else:
        subset_indices_train = OrderedDict()

    def _save():
        with open(json_path, "w") as f:
            json.dump(subset_indices_train, f)

    print("[3] Creating training subsets (kmeans-representative kNN) ...")
    if "entropy_map" not in subset_indices_train:
        idx, vals = select_topk(
            prob_logits_test_map, k=subset_size, variant="entropy",
            entropy_variant="map_alea", return_values=True,
        )
        subset_indices_train["entropy_map"] = run_knn_kmeans(
            reps, ctx.image_outputs_test, np.asarray(idx), np.asarray(vals),
            rep_idx, k_nearest, head.source_covariance, knn_method,
            head.source_projection_has_bias,
        )
        _save()

    if "bald_test" not in subset_indices_train:
        idx, vals = select_topk(
            prob_logits_test, k=subset_size, variant="exp_mutual_info",
            return_values=True, seed=0,
        )
        subset_indices_train["bald_test"] = run_knn_kmeans(
            reps, ctx.image_outputs_test, np.asarray(idx), np.asarray(vals),
            rep_idx, k_nearest, head.source_covariance, knn_method,
            head.source_projection_has_bias,
        )
        _save()

    for i in range(5):
        if f"random_on_test_{i}" not in subset_indices_train:
            idx = select_random(prob_logits_test, k=subset_size, seed=i)
            subset_indices_train[f"random_on_test_{i}"] = run_knn_kmeans(
                reps, ctx.image_outputs_test, np.asarray(idx),
                np.ones(len(np.asarray(idx))), rep_idx, k_nearest,
                head.source_covariance, knn_method,
                head.source_projection_has_bias,
            )
            _save()
    _save()

    print("[4] Fine-tuning based on training subsets ...")
    return finetune_all_subsets(
        ctx, subset_indices_train, subset_dir, project_name, dataset,
        finetune_lr, finetune_wd, finetune_epochs, finetune_batch_size,
        config=dict(k_clusters=k_clusters, knn_method=knn_method,
                    subset_size=subset_size, hessian_scale=hessian_scale),
        early_stopping_patience=early_stopping_patience,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="clip-base")
    parser.add_argument("--dataset", type=str, default="homeoffice-da-clipart")
    parser.add_argument("--hessian_dir", type=str,
                        default="hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K")
    parser.add_argument("--experiment_dir", type=str,
                        default="experiments/active-finetuning-kmeans")
    parser.add_argument("--project_name", type=str, default="active-finetuning-kmeans")
    parser.add_argument("--subset_size", type=int, default=50)
    parser.add_argument("--hessian_scale", type=float, default=10)
    parser.add_argument("--k_clusters", type=int, default=1000)
    parser.add_argument("--predictions_batch_size", type=int, default=256)
    parser.add_argument("--precompute_batch_size", type=int, default=256)
    parser.add_argument("--precompute_num_workers", type=int, default=8)
    parser.add_argument("--finetune_lr", type=float, default=1e-5)
    parser.add_argument("--finetune_wd", type=float, default=5e-2)
    parser.add_argument("--finetune_epochs", type=int, default=100)
    parser.add_argument("--finetune_batch_size", type=int, default=30)
    parser.add_argument("--k_nearest", type=int, default=1)
    parser.add_argument("--knn_method", type=str, default="wasserstein")
    parser.add_argument("--early_stopping_patience", type=int, default=15)
    parser.add_argument("--weights_dir", type=str, default=None)
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument("--device", type=str, default="tpu")  # CLI parity
    args = parser.parse_args()

    if getattr(args, "device", None):
        from bayesvlm_tpu.utils import apply_device_flag

        apply_device_flag(args.device)

    main(
        model_str=args.model, dataset=args.dataset, hessian_dir=args.hessian_dir,
        experiment_dir=args.experiment_dir, project_name=args.project_name,
        hessian_scale=args.hessian_scale, subset_size=args.subset_size,
        k_clusters=args.k_clusters,
        predictions_batch_size=args.predictions_batch_size,
        precompute_batch_size=args.precompute_batch_size,
        precompute_num_workers=args.precompute_num_workers,
        finetune_lr=args.finetune_lr, finetune_wd=args.finetune_wd,
        finetune_epochs=args.finetune_epochs,
        finetune_batch_size=args.finetune_batch_size,
        k_nearest=args.k_nearest, knn_method=args.knn_method,
        early_stopping_patience=args.early_stopping_patience,
        weights_dir=args.weights_dir, tokenizer_dir=args.tokenizer_dir,
    )
