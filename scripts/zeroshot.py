#!/usr/bin/env python
"""Stage 2: probabilistic zero-shot evaluation.

Drop-in CLI for ref:scripts/zeroshot.py — same flags, same pipeline:
load Hessians -> re-optimize lambda with pseudo_data_count -> covariances ->
precompute test image + class-prompt features -> probabilistic predictions
-> probit softmax -> ACC/NLPD/ECE (20-bin L1).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SUPPORTED_DATASETS = [
    "flowers102", "food101", "stanfordcars", "eurosat", "cifar100", "dtd",
    # TPU-native extras beyond ref:scripts/zeroshot.py:14 — smoke runs and
    # the ImageNet modules the data factory registers (preflight.py's
    # documented ImageNet-1k north-star row runs through these)
    "synthetic",
    "imagenet-val-wds", "imagenet-100", "imagenet-50",
    "imagenet-r", "imagenet-sketch",
]


def main(
    dataset: str,
    hessian_dir: str,
    model_str: str = "clip-base",
    pseudo_data_count: int = 10,
    batch_size: int = 32,
    num_workers: int = 4,
    weights_dir=None,
    tokenizer_dir=None,
    dtype: str = "bf16",
    use_mesh: bool = True,
    mlp_int8: bool = False,
    attn_int8: bool = False,
):
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.kfac import compute_covariances
    from bayesvlm_tpu.bayes.prior import optimize_prior_precision
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HashTokenizer, HFTokenizer
    from bayesvlm_tpu.data.transforms import get_transform
    from bayesvlm_tpu.inference.metrics import evaluate_prediction
    from bayesvlm_tpu.inference.precompute import (
        precompute_image_features,
        precompute_text_features,
    )
    from bayesvlm_tpu.inference.predictions import (
        make_predictions,
        make_predictions_sharded,
    )
    from bayesvlm_tpu.io.artifacts import load_hessians
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.utils import get_image_size

    if dataset not in SUPPORTED_DATASETS:
        raise ValueError(f"Invalid dataset: {dataset}, must be one of {SUPPORTED_DATASETS}")

    config = CONFIGS_BY_NAME[model_str]
    transform = get_transform(config.family, get_image_size(model_str))

    dm = DataModuleFactory(
        batch_size=batch_size,
        num_workers=num_workers,
        train_transform=transform,
        test_transform=transform,
        shuffle_train=True,
    ).create(dataset)
    dm.setup()

    jdtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[dtype]
    image_encoder, text_encoder, head = load_model(
        model_str, weights_dir=weights_dir, dtype=jdtype,
        mlp_int8=mlp_int8, attn_int8=attn_int8,
    )
    if jdtype != jnp.float32:
        # pre-cast GEMM weights to the compute dtype (bit-identical to the
        # per-forward on-device convert it replaces; see cast_gemm_params)
        import dataclasses as _dc

        from bayesvlm_tpu.models.encoders import cast_gemm_params

        image_encoder = _dc.replace(
            image_encoder, params=cast_gemm_params(image_encoder.params, jdtype))
        text_encoder = _dc.replace(
            text_encoder, params=cast_gemm_params(text_encoder.params, jdtype))
    import jax

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        from bayesvlm_tpu.dist.mesh import default_mesh

        mesh = default_mesh()
        image_encoder = image_encoder.with_mesh(mesh)
        print(f"[mesh] batch-sharded inference over {mesh.shape}")
    image_encoder = image_encoder.prequantize_int8()  # no-op unless mlp_int8
    if tokenizer_dir is not None:
        text_encoder.tokenizer = HFTokenizer.from_local(tokenizer_dir, config.text.max_length)
    elif text_encoder.tokenizer is None:
        text_encoder.tokenizer = HashTokenizer(
            config.text.vocab_size, config.text.max_length,
            eos_id=config.text.eos_token_id,
        )

    A_img, B_img = load_hessians(hessian_dir, tag="img")
    A_txt, B_txt = load_hessians(hessian_dir, tag="txt")

    info = {"n_img": pseudo_data_count, "n_txt": pseudo_data_count}

    print("[1] Optimizing prior precision...")
    info["lambda_img"] = float(
        optimize_prior_precision(
            image_encoder.projection_l2(), image_encoder.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=300, n=info["n_img"], lr=1e-2, num_steps=1000,
        )
    )
    info["lambda_txt"] = float(
        optimize_prior_precision(
            text_encoder.projection_l2(), text_encoder.projection_num_params(),
            A=A_txt, B=B_txt, lmbda_init=300, n=info["n_txt"], lr=1e-2, num_steps=1000,
        )
    )
    for k in ("n_img", "n_txt", "lambda_img", "lambda_txt"):
        print(f"\t{k}:", info[k])

    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    head = head.set_covariances(cov_img, cov_txt)

    print("[2] Precomputing features...")
    image_outputs, class_ids, _ = precompute_image_features(
        image_encoder, dm.test_dataloader()
    )
    label_outputs = precompute_text_features(
        text_encoder, dm.class_prompts, batch_size=batch_size
    )

    print("[3] Making predictions...")
    if mesh is not None:
        prob_logits = make_predictions_sharded(
            head, image_outputs, label_outputs, mesh
        )
    else:
        prob_logits = make_predictions(
            head, image_outputs, label_outputs, batch_size=batch_size
        )

    # probit approximation (ref:zeroshot.py:119-120)

    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 * prob_logits.var)
    pred = jax.nn.softmax(kappa * prob_logits.mean, axis=-1)

    print("[4] Evaluate model ...")
    acc, nlpd, ece = evaluate_prediction(pred, class_ids, num_classes=len(dm.class_prompts))
    print(f"Zero shot CLIP on {dataset}")
    print(f"ACC: {float(np.mean(np.asarray(acc)))}, {float(np.std(np.asarray(acc)))}")
    print(f"NLPD: {float(np.mean(np.asarray(nlpd)))}, {float(np.std(np.asarray(nlpd)))}")
    print(f"ECE: {ece}")
    result = (float(np.mean(np.asarray(acc))), float(np.mean(np.asarray(nlpd))), ece)
    main.last_info = dict(info)  # exposed for H2H tests (lambda_img/txt)
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="food101")
    parser.add_argument(
        "--hessian_dir", type=str,
        default="hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K",
    )
    parser.add_argument("--model", type=str, default="clip-base")
    parser.add_argument("--pseudo_data_count", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="tpu")  # CLI parity
    parser.add_argument("--weights_dir", type=str, default=None)
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument("--dtype", type=str, default="bf16",
                        choices=["bf16", "fp32"])  # TPU extra
    parser.add_argument("--no_mesh", action="store_true")
    # TPU extra: fused W8A8 int8 vision MLP (~x1.19 ViT-L end-to-end;
    # approximate — calibration deltas in BASELINE.md). Default off for
    # reference parity.
    parser.add_argument("--mlp_int8", action="store_true")
    # measured NEGATIVE on v5e (BASELINE.md) — tested opt-in only
    parser.add_argument("--attn_int8", action="store_true")
    args = parser.parse_args()

    if getattr(args, "device", None):
        from bayesvlm_tpu.utils import apply_device_flag

        apply_device_flag(args.device)

    main(
        dataset=args.dataset,
        hessian_dir=args.hessian_dir,
        model_str=args.model,
        pseudo_data_count=args.pseudo_data_count,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        weights_dir=args.weights_dir,
        tokenizer_dir=args.tokenizer_dir,
        dtype=args.dtype,
        use_mesh=not args.no_mesh,
        mlp_int8=args.mlp_int8,
        attn_int8=args.attn_int8,
    )
