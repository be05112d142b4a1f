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
    buffersize=150,
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
        k_nearest, source_covariance, buffersize=buffersize,
        has_bias=proj_has_bias,
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
    precompute_num_workers: int = 4,
    finetune_lr: float = 1e-5,
    finetune_wd: float = 5e-2,
    finetune_epochs: int = 100,
    finetune_batch_size: int = 32,
    k_nearest: int = 1,
    knn_method: str = "wasserstein",
    knn_buffersize: int = 150,
    early_stopping_patience: int = 15,
    use_minibatch_kmeans: bool = False,
    kmeans_batch_size: int = 1024,
    epig_lr: float = 1e-4,
    epig_hessian_update_scale: float = 10.0,
    epig_num_samples: int = 100,
    only_deterministic_strategies: bool = False,
    only_random_strategies: bool = False,
    only_epig: bool = False,
    without_epig: bool = False,
    weights_dir=None,
    tokenizer_dir=None,
    mlp_int8: bool = False,
):
    if only_epig and without_epig:
        raise ValueError("Cannot set both only_epig and without_epig")
    # use_minibatch_kmeans / kmeans_batch_size are accepted for CLI parity
    # with the reference (which switches sklearn KMeans/MiniBatchKMeans,
    # ref:activelearning_kmeans.py:94-164); the jitted Lloyd k-means here
    # has no minibatch variant, so they are documented no-ops.
    del use_minibatch_kmeans, kmeans_batch_size

    from bayesvlm_tpu.inference.predictions import make_predictions
    from bayesvlm_tpu.select.kmeans import cluster_and_select_representatives
    from bayesvlm_tpu.select.scores import select_random, select_topk
    from bayesvlm_tpu.train.al_common import finetune_all_subsets, setup_context

    ctx = setup_context(
        model_str, dataset, hessian_dir, experiment_dir, hessian_scale,
        precompute_batch_size, precompute_num_workers, weights_dir, tokenizer_dir,
        mlp_int8=mlp_int8,
    )
    if knn_method not in ("cosine", "wasserstein"):
        raise ValueError(
            f"Unknown knn_method: {knn_method!r} (expected 'cosine' or "
            "'wasserstein')"
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
    prob_logits_train = make_predictions(
        head, ctx.image_outputs_train, ctx.label_outputs,
        batch_size=predictions_batch_size,
    )
    prob_logits_train_map = make_predictions(
        head, ctx.image_outputs_train, ctx.label_outputs,
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
    # strategy set + keys mirror ref:activelearning_kmeans.py:603-714
    if not only_random_strategies and not only_epig:
        if "entropy_map_kmeans_knn" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_test_map, k=subset_size, variant="entropy",
                entropy_variant="map_alea", return_values=True,
            )
            subset_indices_train["entropy_map_kmeans_knn"] = run_knn_kmeans(
                reps, ctx.image_outputs_test, np.asarray(idx), np.asarray(vals),
                rep_idx, k_nearest, head.source_covariance, knn_method,
                head.source_projection_has_bias, buffersize=knn_buffersize,
            )
            _save()

        if "entropy_map_trainset_direct" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_train_map, k=subset_size, variant="entropy",
                entropy_variant="map_alea", return_values=True,
            )
            subset_indices_train["entropy_map_trainset_direct"] = {
                0: dict(score=0.0, indices=np.asarray(idx).tolist(),
                        similarities=np.asarray(vals).tolist())
            }
            _save()

        if "bald_test_kmeans_knn" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_test, k=subset_size, variant="exp_mutual_info",
                return_values=True, seed=0,
            )
            subset_indices_train["bald_test_kmeans_knn"] = run_knn_kmeans(
                reps, ctx.image_outputs_test, np.asarray(idx), np.asarray(vals),
                rep_idx, k_nearest, head.source_covariance, knn_method,
                head.source_projection_has_bias, buffersize=knn_buffersize,
            )
            _save()

    if not only_random_strategies and not without_epig:
        # EPIG runs on the full pool (no k-means pre-filter), matching the
        # reference's integration note (ref:activelearning_kmeans.py:647-671)
        if "epig_direct" not in subset_indices_train:
            from bayesvlm_tpu.select.epig import select_epig_online

            proj = dict(ctx.image_encoder.projection_tree())
            pool_subsampling = (
                "knn_wasserstein" if knn_method == "wasserstein"
                else "knn_cosine"
            )
            indices_epig, epig_scores = select_epig_online(
                label_features=ctx.label_outputs,
                pool_features=ctx.image_outputs_train,
                target_features=ctx.image_outputs_test,
                pool_class_ids=ctx.class_ids_train,
                projection_kernel=proj["kernel"],
                projection_bias=proj.get("bias"),
                head=head,
                A_img=ctx.A_img, A_txt=ctx.A_txt,
                B_img=ctx.B_img, B_txt=ctx.B_txt,
                cov_info=ctx.covar_info,
                budget=subset_size,
                lr=epig_lr,
                hessian_update_scale=epig_hessian_update_scale,
                num_samples=epig_num_samples,
                seed=0,
                projection_l2=ctx.image_encoder.projection_l2(),
                projection_num_params=ctx.image_encoder.projection_num_params(),
                # ref:activelearning_kmeans.py:662-669 caps the EPIG
                # pool/target subsamples and uses the default k=1
                # neighbors (NOT the script-level --k_nearest)
                pool_max_size=40_000,
                target_max_size=20_000,
                pool_subsampling=pool_subsampling,
                proj_has_bias=head.source_projection_has_bias,
            )
            subset_indices_train["epig_direct"] = {
                0: dict(score=0.0, indices=list(map(int, indices_epig)),
                        similarities=list(map(float, epig_scores)))
            }
            _save()

    if not only_deterministic_strategies and not only_epig:
        for i in range(5):
            if f"random_on_test_kmeans_knn_{i}" not in subset_indices_train:
                idx = select_random(prob_logits_test, k=subset_size, seed=i)
                subset_indices_train[f"random_on_test_kmeans_knn_{i}"] = (
                    run_knn_kmeans(
                        reps, ctx.image_outputs_test, np.asarray(idx),
                        np.ones(len(np.asarray(idx))), rep_idx, k_nearest,
                        head.source_covariance, knn_method,
                        head.source_projection_has_bias,
                        buffersize=knn_buffersize,
                    )
                )
                _save()

        for i in range(5):
            if f"random_on_train_direct_{i}" not in subset_indices_train:
                idx = np.asarray(select_random(
                    prob_logits_train, k=k_nearest * subset_size, seed=i,
                ))
                uniq = np.unique(idx)[:subset_size]
                subset_indices_train[f"random_on_train_direct_{i}"] = {
                    0: dict(score=0.0, indices=uniq.tolist(),
                            similarities=[1.0] * len(uniq))
                }
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
    parser.add_argument("--hessian_dir", type=str, required=True,
                        help="Directory containing precomputed Hessian factors")
    parser.add_argument("--experiment_dir", type=str,
                        default="experiments/active-finetuning-kmeans")
    parser.add_argument("--project_name", type=str, default="active-finetuning-kmeans")
    parser.add_argument("--subset_size", type=int, default=50)
    parser.add_argument("--hessian_scale", type=float, default=10)
    parser.add_argument("--k_clusters", type=int, default=1000)
    parser.add_argument("--predictions_batch_size", type=int, default=256)
    parser.add_argument("--precompute_batch_size", type=int, default=256)
    parser.add_argument("--precompute_num_workers", type=int, default=4)
    parser.add_argument("--finetune_lr", type=float, default=1e-5)
    parser.add_argument("--finetune_wd", type=float, default=5e-2)
    parser.add_argument("--finetune_epochs", type=int, default=100)
    parser.add_argument("--finetune_batch_size", type=int, default=32)
    parser.add_argument("--k_nearest", type=int, default=1)
    parser.add_argument("--knn_method", type=str, default="wasserstein")
    parser.add_argument("--knn_buffersize", type=int, default=150)
    parser.add_argument("--early_stopping_patience", type=int, default=15)
    parser.add_argument("--kmeans_clusters", type=int, default=None,
                        help="reference flag name; alias of --k_clusters")
    parser.add_argument("--use_minibatch_kmeans", action="store_true",
                        help="no-op here (jitted Lloyd k-means, no sklearn "
                        "MiniBatchKMeans); accepted for CLI parity")
    parser.add_argument("--kmeans_batch_size", type=int, default=1024,
                        help="no-op (see --use_minibatch_kmeans)")
    parser.add_argument("--epig_lr", type=float, default=1e-4)
    parser.add_argument("--epig_hessian_update_scale", type=float, default=10.0)
    parser.add_argument(
        "--epig_num_samples", type=int, default=100,
        help="EPIG MC samples (reference default 100). On TPU, 128 is "
        "measured free through the fused Pallas kernel (its contraction "
        "axis pads 100->128) and cuts MC error ~19%% — see BASELINE.md")
    parser.add_argument("--only_deterministic_strategies", action="store_true")
    parser.add_argument("--only_random_strategies", action="store_true")
    parser.add_argument("--only_epig", action="store_true")
    parser.add_argument("--without_epig", action="store_true")
    parser.add_argument("--weights_dir", type=str, default=None)
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument(
        "--mlp_int8", action="store_true",
        help="W8A8 int8 vision-tower MLPs for feature precompute (~x1.2; calibration deltas in BASELINE.md). Off = parity default")
    parser.add_argument("--device", type=str, default="tpu")  # CLI parity
    args = parser.parse_args()

    if getattr(args, "device", None):
        from bayesvlm_tpu.utils import apply_device_flag

        apply_device_flag(args.device)

    main(
        model_str=args.model, dataset=args.dataset, hessian_dir=args.hessian_dir,
        experiment_dir=args.experiment_dir, project_name=args.project_name,
        hessian_scale=args.hessian_scale, subset_size=args.subset_size,
        k_clusters=args.kmeans_clusters or args.k_clusters,
        predictions_batch_size=args.predictions_batch_size,
        precompute_batch_size=args.precompute_batch_size,
        precompute_num_workers=args.precompute_num_workers,
        finetune_lr=args.finetune_lr, finetune_wd=args.finetune_wd,
        finetune_epochs=args.finetune_epochs,
        finetune_batch_size=args.finetune_batch_size,
        k_nearest=args.k_nearest, knn_method=args.knn_method,
        knn_buffersize=args.knn_buffersize,
        early_stopping_patience=args.early_stopping_patience,
        use_minibatch_kmeans=args.use_minibatch_kmeans,
        kmeans_batch_size=args.kmeans_batch_size,
        epig_lr=args.epig_lr,
        epig_hessian_update_scale=args.epig_hessian_update_scale,
        epig_num_samples=args.epig_num_samples,
        only_deterministic_strategies=args.only_deterministic_strategies,
        only_random_strategies=args.only_random_strategies,
        only_epig=args.only_epig,
        without_epig=args.without_epig,
        weights_dir=args.weights_dir, tokenizer_dir=args.tokenizer_dir,
        mlp_int8=args.mlp_int8,
    )
