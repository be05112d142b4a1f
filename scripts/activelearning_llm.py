#!/usr/bin/env python
"""Stage-3 variant: LLM-scored selection (ref:scripts/activelearning_llm.py).

Scores test candidates with an LLM (difficulty or value prompts; Gemini
client when available, any `prompt -> text` callable otherwise), selects
top-k, maps to train support via kNN, fine-tunes per subset.
"""

import argparse
import json
import sys
from collections import OrderedDict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(
    model_str: str,
    dataset: str,
    hessian_dir: str,
    experiment_dir: str,
    project_name: str,
    hessian_scale: float,
    subset_size: int,
    llm_model_name: str = "gemini-pro",
    llm_score_type: str = "difficulty",
    predictions_batch_size: int = 256,
    precompute_batch_size: int = 256,
    precompute_num_workers: int = 8,
    finetune_lr: float = 1e-5,
    finetune_wd: float = 5e-2,
    finetune_epochs: int = 100,
    finetune_batch_size: int = 30,
    k_nearest: int = 1,
    knn_method: str = "wasserstein",
    weights_dir=None,
    tokenizer_dir=None,
    llm_client=None,
):
    from bayesvlm_tpu.inference.predictions import make_predictions
    from bayesvlm_tpu.select.knn import (
        find_similar_samples_cosine,
        find_similar_samples_wasserstein,
    )
    from bayesvlm_tpu.select.llm import make_gemini_client, select_llm_score
    from bayesvlm_tpu.select.scores import select_random
    from bayesvlm_tpu.train.al_common import finetune_all_subsets, setup_context

    ctx = setup_context(
        model_str, dataset, hessian_dir, experiment_dir, hessian_scale,
        precompute_batch_size, precompute_num_workers, weights_dir, tokenizer_dir,
    )
    head = ctx.head

    prob_logits_test = make_predictions(
        head, ctx.image_outputs_test, ctx.label_outputs,
        batch_size=predictions_batch_size,
    )

    subset_dir = ctx.run_dir / (
        f"llm_{llm_score_type}_subset_{subset_size}_k_{k_nearest}"
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

    knn_fn = (
        find_similar_samples_cosine if knn_method == "cosine"
        else find_similar_samples_wasserstein
    )

    print("[3] Creating training subsets (LLM-scored) ...")
    if f"llm_{llm_score_type}" not in subset_indices_train:
        if llm_client is None:
            llm_client = make_gemini_client(llm_model_name)
        idx, vals = select_llm_score(
            ctx.image_ids_test, ctx.class_ids_test, ctx.dm.class_prompts,
            k=subset_size, client=llm_client, llm_score_type=llm_score_type,
            dataset_name=dataset,
        )
        subset_indices_train[f"llm_{llm_score_type}"] = knn_fn(
            ctx.image_outputs_train, ctx.image_outputs_test,
            np.asarray(idx), np.asarray(vals), k_nearest,
            head.source_covariance, has_bias=head.source_projection_has_bias,
        )
        _save()

    for i in range(3):
        if f"random_on_test_{i}" not in subset_indices_train:
            idx = select_random(prob_logits_test, k=subset_size, seed=i)
            subset_indices_train[f"random_on_test_{i}"] = knn_fn(
                ctx.image_outputs_train, ctx.image_outputs_test,
                np.asarray(idx), np.ones(len(np.asarray(idx))), k_nearest,
                head.source_covariance, has_bias=head.source_projection_has_bias,
            )
            _save()
    _save()

    print("[4] Fine-tuning based on training subsets ...")
    return finetune_all_subsets(
        ctx, subset_indices_train, subset_dir, project_name, dataset,
        finetune_lr, finetune_wd, finetune_epochs, finetune_batch_size,
        config=dict(llm_model=llm_model_name, llm_score_type=llm_score_type,
                    knn_method=knn_method, subset_size=subset_size),
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="clip-base")
    parser.add_argument("--dataset", type=str, default="homeoffice-da-clipart")
    parser.add_argument("--hessian_dir", type=str,
                        default="hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K")
    parser.add_argument("--experiment_dir", type=str,
                        default="experiments/active-finetuning-llm")
    parser.add_argument("--project_name", type=str, default="active-finetuning-llm")
    parser.add_argument("--subset_size", type=int, default=50)
    parser.add_argument("--hessian_scale", type=float, default=10)
    parser.add_argument("--llm_model_name", type=str, default="gemini-pro")
    parser.add_argument("--llm_score_type", type=str, default="difficulty",
                        choices=["difficulty", "value"])
    parser.add_argument("--predictions_batch_size", type=int, default=256)
    parser.add_argument("--precompute_batch_size", type=int, default=256)
    parser.add_argument("--precompute_num_workers", type=int, default=8)
    parser.add_argument("--finetune_lr", type=float, default=1e-5)
    parser.add_argument("--finetune_wd", type=float, default=5e-2)
    parser.add_argument("--finetune_epochs", type=int, default=100)
    parser.add_argument("--finetune_batch_size", type=int, default=30)
    parser.add_argument("--k_nearest", type=int, default=1)
    parser.add_argument("--knn_method", type=str, default="wasserstein")
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
        llm_model_name=args.llm_model_name, llm_score_type=args.llm_score_type,
        predictions_batch_size=args.predictions_batch_size,
        precompute_batch_size=args.precompute_batch_size,
        precompute_num_workers=args.precompute_num_workers,
        finetune_lr=args.finetune_lr, finetune_wd=args.finetune_wd,
        finetune_epochs=args.finetune_epochs,
        finetune_batch_size=args.finetune_batch_size,
        k_nearest=args.k_nearest, knn_method=args.knn_method,
        weights_dir=args.weights_dir, tokenizer_dir=args.tokenizer_dir,
    )
