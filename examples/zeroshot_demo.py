#!/usr/bin/env python
"""Executable end-to-end example — the counterpart of the reference's
`notebooks/zeroshot.ipynb` (its de-facto integration test, SURVEY §4):
probabilistic zero-shot with the shipped CLIP-B/32 Hessian fixtures,
comparing BayesVLM (probit) against the MAP baseline.

With --weights_dir/--tokenizer_dir pointing at a local HF snapshot of
laion/CLIP-ViT-B-32-laion2B-s34B-b79K and DATA_BASE_DIR set, this
reproduces the notebook's ACC/NLPD/ECE table on food101. Without weights
it falls back to a tiny random model + synthetic data so the pipeline
remains runnable anywhere.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(hessian_dir, dataset, model, weights_dir, tokenizer_dir, batch_size):
    import jax
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.kfac import compute_covariances
    from bayesvlm_tpu.data import HashTokenizer
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HFTokenizer
    from bayesvlm_tpu.data.transforms import get_transform
    from bayesvlm_tpu.inference.metrics import evaluate_prediction
    from bayesvlm_tpu.inference.precompute import (
        precompute_image_features,
        precompute_text_features,
    )
    from bayesvlm_tpu.inference.predictions import make_predictions
    from bayesvlm_tpu.io.artifacts import load_hessians
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.utils import get_image_size

    config = CONFIGS_BY_NAME[model]
    transform = get_transform(config.family, get_image_size(model))

    dm = DataModuleFactory(
        batch_size=batch_size, num_workers=4,
        train_transform=transform, test_transform=transform,
    ).create(dataset)
    dm.setup()

    image_encoder, text_encoder, head = load_model(model, weights_dir=weights_dir)
    if tokenizer_dir:
        text_encoder.tokenizer = HFTokenizer.from_local(
            tokenizer_dir, config.text.max_length
        )
    else:
        text_encoder.tokenizer = HashTokenizer(
            config.text.vocab_size, config.text.max_length,
            eos_id=config.text.eos_token_id,
        )

    A_img, B_img, info = load_hessians(hessian_dir, "img", return_info=True)
    A_txt, B_txt = load_hessians(hessian_dir, "txt")
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    head = head.set_covariances(cov_img, cov_txt)

    print("Precomputing features ...")
    image_outputs, class_ids, _ = precompute_image_features(
        image_encoder, dm.test_dataloader()
    )
    label_outputs = precompute_text_features(
        text_encoder, dm.class_prompts, batch_size=batch_size
    )

    print("Predicting ...")
    prob = make_predictions(head, image_outputs, label_outputs, batch_size=batch_size)

    # BayesVLM: probit-scaled softmax; MAP: plain softmax of the mean
    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 * prob.var)
    pred_bayes = jax.nn.softmax(kappa * prob.mean, axis=-1)
    pred_map = jax.nn.softmax(prob.mean, axis=-1)

    n_classes = len(dm.class_prompts)
    rows = []
    for name, pred in (("BayesVLM", pred_bayes), ("MAP", pred_map)):
        acc, nlpd, ece = evaluate_prediction(pred, class_ids, n_classes)
        rows.append((name, float(np.mean(np.asarray(acc))),
                     float(np.mean(np.asarray(nlpd))), ece))

    print(f"\nZero-shot on {dataset} ({model})")
    print(f"{'method':<10} {'ACC':>8} {'NLPD':>8} {'ECE':>8}")
    for name, acc, nlpd, ece in rows:
        print(f"{name:<10} {acc:>8.4f} {nlpd:>8.4f} {ece:>8.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--hessian_dir", default="/root/reference/hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--model", default="clip-base")
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()

    if args.weights_dir is None and args.model != "tiny-clip":
        print("no --weights_dir: falling back to tiny-clip + synthetic demo")
        # tiny fallback needs a matching tiny hessian — build one on the fly
        import jax.numpy as jnp

        from bayesvlm_tpu.bayes.estimation import kfac_ggn
        from bayesvlm_tpu.data import HashTokenizer, SyntheticDataModule
        from bayesvlm_tpu.inference.precompute import compute_features
        from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
        from bayesvlm_tpu.models import load_model
        from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
        import tempfile

        tmp = Path(tempfile.mkdtemp())
        img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32)
        txt_enc.tokenizer = HashTokenizer(
            TINY_CLIP_CONFIG.text.vocab_size, TINY_CLIP_CONFIG.text.max_length,
            eos_id=TINY_CLIP_CONFIG.text.eos_token_id,
        )
        dm = SyntheticDataModule(batch_size=16, num_train=64, num_classes=4,
                                 image_size=32, num_workers=2)
        dm.setup()
        act_i, emb_i = compute_features(img_enc, dm.train_dataloader(),
                                        return_tensors=True, modality="image")
        act_t, emb_t = compute_features(txt_enc, dm.train_dataloader(),
                                        return_tensors=True, modality="text")
        A_i, B_i = kfac_ggn(head.logit_scale, head.logit_bias, 32, emb_i, act_i, emb_t, "info_nce")
        A_t, B_t = kfac_ggn(head.logit_scale, head.logit_bias, 32, emb_t, act_t, emb_i, "info_nce")
        save_hessians(tmp, A_i, B_i, "img")
        save_hessians(tmp, A_t, B_t, "txt")
        save_prior_precision(tmp, 50.0, 1.0, 50.0, 1.0)
        main(str(tmp), "synthetic", "tiny-clip", None, None, 16)
    else:
        main(args.hessian_dir, args.dataset, args.model,
             args.weights_dir, args.tokenizer_dir, args.batch_size)
