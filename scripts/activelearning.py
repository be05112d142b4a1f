#!/usr/bin/env python
"""Stage 3: uncertainty-based active fine-tuning.

Drop-in CLI for ref:scripts/activelearning.py — same flags/defaults, same
JSON-resumable strategy checkpoints (`subset_indices_train.json`, saved
after strategy construction; per-subset `img_projection.pt` checkpoints).

Strategies: entropy_map (+kNN support), entropy_map_train, bald_test
(+kNN), epig_knn (online EPIG), random_on_test_{0..4} (+kNN),
random_on_train_{0..4}.
"""

import argparse

import json
import sys
from collections import OrderedDict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_knn(
    embeds_train, embeds_test, indices_test, values_test, k_nearest,
    source_covariance, method, proj_has_bias=False,
):
    """ref:scripts/activelearning.py:228-250."""
    from bayesvlm_tpu.select.knn import (
        find_similar_samples_cosine,
        find_similar_samples_wasserstein,
    )

    if method == "cosine":
        return find_similar_samples_cosine(
            embeds_train, embeds_test, indices_test, values_test, k_nearest,
            source_covariance, has_bias=proj_has_bias,
        )
    if method == "wasserstein":
        return find_similar_samples_wasserstein(
            embeds_train, embeds_test, indices_test, values_test, k_nearest,
            source_covariance, has_bias=proj_has_bias,
        )
    raise ValueError(f"Unknown method {method}")


def main(
    model_str: str,
    dataset: str,
    hessian_dir: str,
    experiment_dir: str,
    project_name: str,
    hessian_scale: float,
    subset_size: int,
    predictions_batch_size: int = 256,
    precompute_batch_size: int = 256,
    precompute_num_workers: int = 8,
    finetune_lr: float = 1e-5,
    finetune_wd: float = 5e-2,
    finetune_epochs: int = 100,
    finetune_batch_size: int = 30,
    only_deterministic_strategies: bool = False,
    only_random_strategies: bool = False,
    only_epig: bool = False,
    without_epig: bool = False,
    epig_lr: float = 1e-4,
    epig_hessian_update_scale: float = 10.0,
    epig_num_samples: int = 100,
    k_nearest: int = 1,
    knn_method: str = "wasserstein",
    weights_dir=None,
    tokenizer_dir=None,
    mlp_int8: bool = False,
    epig_pool_max_size: int = 40_000,
    epig_target_max_size: int = 20_000,
):
    if only_epig and without_epig:
        # would otherwise select ZERO strategies and burn the full feature
        # precompute before writing an empty subset JSON (the kmeans
        # variant guards this identically)
        raise ValueError("Cannot set both only_epig and without_epig")

    from bayesvlm_tpu.dist.init import initialize_distributed
    from bayesvlm_tpu.inference.predictions import make_predictions
    from bayesvlm_tpu.select.epig import select_epig_online
    from bayesvlm_tpu.select.scores import select_random, select_topk
    from bayesvlm_tpu.train.al_common import finetune_all_subsets, setup_context

    # multi-host launch (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env):
    # stripe-sharded feature precompute + replicated selection/fine-tune
    # with primary-only writes. No-op single host.
    dist_ctx = initialize_distributed()
    if dist_ctx.num_hosts <= 1:
        dist_ctx = None

    ctx = setup_context(
        model_str, dataset, hessian_dir, experiment_dir, hessian_scale,
        precompute_batch_size, precompute_num_workers, weights_dir, tokenizer_dir,
        mlp_int8=mlp_int8, dist_ctx=dist_ctx,
    )
    dm = ctx.dm
    image_encoder = ctx.image_encoder
    head = ctx.head
    run_dir = ctx.run_dir
    image_outputs_train, class_ids_train = ctx.image_outputs_train, ctx.class_ids_train
    image_outputs_test = ctx.image_outputs_test
    label_outputs = ctx.label_outputs
    A_img, B_img, A_txt, B_txt = ctx.A_img, ctx.B_img, ctx.A_txt, ctx.B_txt
    covar_info = ctx.covar_info

    print("[2] Making predictions ...")
    mk = lambda feats, map_est: make_predictions(
        head, feats, label_outputs, batch_size=predictions_batch_size,
        map_estimate=map_est,
    )
    prob_logits_train = mk(image_outputs_train, False)
    prob_logits_train_map = mk(image_outputs_train, True)
    prob_logits_test = mk(image_outputs_test, False)
    prob_logits_test_map = mk(image_outputs_test, True)

    path = (
        f"subset_{subset_size}_k_{k_nearest}_n_{hessian_scale}_epig_lr_{epig_lr}"
        f"_epig_update_{epig_hessian_update_scale}_knn_{knn_method}"
    )
    subset_dir = run_dir / path
    subset_dir.mkdir(parents=True, exist_ok=True)

    print("[3] Creating training subsets ...")
    json_path = subset_dir / "subset_indices_train.json"
    if json_path.exists():
        with open(json_path) as f:
            subset_indices_train = json.load(f, object_pairs_hook=OrderedDict)
    else:
        subset_indices_train = OrderedDict()

    def _save_subsets():
        if not ctx.is_primary:
            return  # replicas compute identical subsets; primary persists
        with open(json_path, "w") as f:
            json.dump(subset_indices_train, f)

    if not only_random_strategies and not only_epig:
        print("    - Aleatoric entropy ...", flush=True)
        if "entropy_map" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_test_map, k=subset_size, variant="entropy",
                entropy_variant="map_alea", return_values=True,
            )
            subset_indices_train["entropy_map"] = run_knn(
                image_outputs_train, image_outputs_test, np.asarray(idx),
                np.asarray(vals), k_nearest, head.source_covariance,
                knn_method, head.source_projection_has_bias,
            )
            _save_subsets()

        print("    - Aleatoric entropy on train ...", flush=True)
        if "entropy_map_train" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_train_map, k=subset_size, variant="entropy",
                entropy_variant="map_alea", return_values=True,
            )
            subset_indices_train["entropy_map_train"] = {
                0: dict(score=0.0, indices=np.asarray(idx).tolist(),
                        similarities=np.asarray(vals).tolist())
            }
            _save_subsets()

        print("    - BALD (on test) ...", flush=True)
        if "bald_test" not in subset_indices_train:
            idx, vals = select_topk(
                prob_logits_test, k=subset_size, variant="exp_mutual_info",
                return_values=True, seed=0,
            )
            subset_indices_train["bald_test"] = run_knn(
                image_outputs_train, image_outputs_test, np.asarray(idx),
                np.asarray(vals), k_nearest, head.source_covariance,
                knn_method, head.source_projection_has_bias,
            )
            _save_subsets()

    if not only_random_strategies and not without_epig:
        print("    - EPIG KNN...", flush=True)
        if "epig_knn" not in subset_indices_train:
            pool_subsampling = (
                "knn_cosine" if knn_method == "cosine" else "knn_wasserstein"
            )
            proj = image_encoder.projection_tree()
            indices_epig, epig_scores = select_epig_online(
                label_features=label_outputs,
                pool_features=image_outputs_train,
                target_features=image_outputs_test,
                pool_class_ids=class_ids_train,
                projection_kernel=proj["kernel"],
                projection_bias=proj.get("bias"),
                head=head,
                A_img=A_img, A_txt=A_txt, B_img=B_img, B_txt=B_txt,
                cov_info=covar_info,
                budget=subset_size,
                lr=epig_lr,
                hessian_update_scale=epig_hessian_update_scale,
                num_samples=epig_num_samples,
                seed=0,
                projection_l2=image_encoder.projection_l2(),
                projection_num_params=image_encoder.projection_num_params(),
                pool_max_size=epig_pool_max_size,
                target_max_size=epig_target_max_size,
                pool_subsampling=pool_subsampling,
                proj_has_bias=head.source_projection_has_bias,
            )
            subset_indices_train["epig_knn"] = {
                0: dict(score=0.0, indices=indices_epig, similarities=epig_scores)
            }
            _save_subsets()

    if not only_deterministic_strategies and not only_epig:
        for i in range(5):
            if f"random_on_test_{i}" not in subset_indices_train:
                idx = select_random(prob_logits_test, k=subset_size, seed=i)
                subset_indices_train[f"random_on_test_{i}"] = run_knn(
                    image_outputs_train, image_outputs_test, np.asarray(idx),
                    np.ones(len(np.asarray(idx))), k_nearest,
                    head.source_covariance, knn_method,
                    head.source_projection_has_bias,
                )
                _save_subsets()
        for i in range(5):
            if f"random_on_train_{i}" not in subset_indices_train:
                idx = select_random(prob_logits_train, k=k_nearest * subset_size, seed=i)
                subset_indices_train[f"random_on_train_{i}"] = {
                    0: dict(
                        score=0.0,
                        indices=np.asarray(idx).tolist(),
                        similarities=[1.0] * len(np.asarray(idx)),
                    )
                }
                _save_subsets()

    _save_subsets()

    print("[4] Fine-tuning based on training subsets ...")
    return finetune_all_subsets(
        ctx, subset_indices_train, subset_dir, project_name, dataset,
        finetune_lr, finetune_wd, finetune_epochs, finetune_batch_size,
        config=dict(
            subset_size=subset_size, k_nearest=k_nearest,
            hessian_scale=hessian_scale, epig_lr=epig_lr,
            epig_hessian_update_scale=epig_hessian_update_scale,
            epig_mc_samples=epig_num_samples, knn_method=knn_method,
        ),
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="clip-base")
    parser.add_argument("--dataset", type=str, default="homeoffice-da-clipart")
    parser.add_argument("--hessian_dir", type=str,
                        default="hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K")
    parser.add_argument("--experiment_dir", type=str,
                        default="experiments/active-finetuning")
    parser.add_argument("--project_name", type=str, default="active-finetuning")
    parser.add_argument("--subset_size", type=int, default=50)
    parser.add_argument("--hessian_scale", type=float, default=10)
    parser.add_argument("--predictions_batch_size", type=int, default=256)
    parser.add_argument("--precompute_batch_size", type=int, default=256)
    parser.add_argument("--precompute_num_workers", type=int, default=8)
    parser.add_argument("--finetune_lr", type=float, default=1e-5)
    parser.add_argument("--finetune_wd", type=float, default=5e-2)
    parser.add_argument("--finetune_epochs", type=int, default=100)
    parser.add_argument("--finetune_batch_size", type=int, default=30)
    parser.add_argument("--only_deterministic_strategies", action="store_true")
    parser.add_argument("--only_random_strategies", action="store_true")
    parser.add_argument("--without_epig", action="store_true")
    parser.add_argument("--only_epig", action="store_true")
    parser.add_argument("--epig_lr", type=float, default=1e-4)
    parser.add_argument("--epig_hessian_update_scale", type=float, default=10.0)
    parser.add_argument("--k_nearest", type=int, default=1)
    parser.add_argument("--knn_method", type=str, default="wasserstein")
    parser.add_argument("--device", type=str, default="tpu")  # CLI parity
    parser.add_argument("--weights_dir", type=str, default=None)
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument(
        "--mlp_int8", action="store_true",
        help="W8A8 int8 vision-tower MLPs for feature precompute (~x1.2; calibration deltas in BASELINE.md). Off = parity default")
    # TPU-repo extras: EPIG sizing knobs (main() kwargs in the reference)
    parser.add_argument(
        "--epig_num_samples", type=int, default=100,
        help="EPIG MC samples (reference default 100). On TPU, 128 is "
        "measured free through the fused Pallas kernel (its contraction "
        "axis pads 100->128) and cuts MC error ~19%% — see BASELINE.md")
    parser.add_argument("--epig_pool_max_size", type=int, default=40_000)
    parser.add_argument("--epig_target_max_size", type=int, default=20_000)
    args = parser.parse_args()

    if getattr(args, "device", None):
        from bayesvlm_tpu.utils import apply_device_flag

        apply_device_flag(args.device)

    main(
        model_str=args.model,
        dataset=args.dataset,
        hessian_dir=args.hessian_dir,
        experiment_dir=args.experiment_dir,
        project_name=args.project_name,
        hessian_scale=args.hessian_scale,
        subset_size=args.subset_size,
        predictions_batch_size=args.predictions_batch_size,
        precompute_batch_size=args.precompute_batch_size,
        precompute_num_workers=args.precompute_num_workers,
        finetune_lr=args.finetune_lr,
        finetune_wd=args.finetune_wd,
        finetune_epochs=args.finetune_epochs,
        finetune_batch_size=args.finetune_batch_size,
        only_deterministic_strategies=args.only_deterministic_strategies,
        only_random_strategies=args.only_random_strategies,
        only_epig=args.only_epig,
        without_epig=args.without_epig,
        epig_lr=args.epig_lr,
        epig_hessian_update_scale=args.epig_hessian_update_scale,
        epig_num_samples=args.epig_num_samples,
        epig_pool_max_size=args.epig_pool_max_size,
        epig_target_max_size=args.epig_target_max_size,
        k_nearest=args.k_nearest,
        knn_method=args.knn_method,
        weights_dir=args.weights_dir,
        tokenizer_dir=args.tokenizer_dir,
        mlp_int8=args.mlp_int8,
    )
