"""SigLIP end-to-end slice: tiny-siglip + synthetic data through Hessian
estimation (sigmoid likelihood, bias column in A), covariances, Smith
forward with bias-augmented activations, probit metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesvlm_tpu.bayes.estimation import kfac_ggn
from bayesvlm_tpu.bayes.kfac import compute_covariances
from bayesvlm_tpu.bayes.prior import optimize_prior_precision
from bayesvlm_tpu.data import HashTokenizer, SyntheticDataModule
from bayesvlm_tpu.inference.metrics import evaluate_prediction
from bayesvlm_tpu.inference.precompute import (
    compute_features,
    precompute_image_features,
    precompute_text_features,
)
from bayesvlm_tpu.inference.predictions import make_predictions
from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.configs import TINY_SIGLIP_CONFIG


def test_siglip_end_to_end(tmp_path):
    cfg = TINY_SIGLIP_CONFIG
    img_enc, txt_enc, head = load_model("tiny-siglip", dtype=jnp.float32, seed=0)
    assert head.source_projection_has_bias and head.target_projection_has_bias
    txt_enc.tokenizer = HashTokenizer(
        cfg.text.vocab_size, cfg.text.max_length, eos_id=cfg.text.eos_token_id
    )

    dm = SyntheticDataModule(
        batch_size=16, num_train=64, num_test=32, num_classes=4, image_size=32,
        num_workers=2,
    )
    dm.setup()

    act_i, emb_i = compute_features(
        img_enc, dm.train_dataloader(), return_tensors=True, modality="image"
    )
    act_t, emb_t = compute_features(
        txt_enc, dm.train_dataloader(), return_tensors=True, modality="text"
    )

    # image-side: activations are the fc1 outputs (mlp_dim), A gets +1 col
    A_img, B_img = kfac_ggn(
        head.logit_scale, head.logit_bias, num_classes=32,
        source_embeds=emb_i, source_activations=act_i, target_embeds=emb_t,
        likelihood="siglip",
    )
    A_txt, B_txt = kfac_ggn(
        head.logit_scale, head.logit_bias, num_classes=32,
        source_embeds=emb_t, source_activations=act_t, target_embeds=emb_i,
        likelihood="siglip",
    )
    assert A_img.shape == (cfg.vision.mlp_dim + 1,) * 2  # bias column
    assert A_txt.shape == (cfg.text.hidden_size + 1,) * 2
    assert B_img.shape == (cfg.vision.projection_dim,) * 2

    lam_img = float(
        optimize_prior_precision(
            img_enc.projection_l2(), img_enc.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=10.0, n=1.0, lr=1e-2, num_steps=50,
        )
    )
    assert np.isfinite(lam_img) and lam_img > 0

    info = dict(lambda_img=lam_img, lambda_txt=lam_img, n_img=1.0, n_txt=1.0)
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    head2 = head.set_covariances(cov_img, cov_txt)

    image_outputs, class_ids, _ = precompute_image_features(
        img_enc, dm.test_dataloader()
    )
    # SigLIP residuals are real (attention-pool skip), not zeros
    assert float(jnp.abs(image_outputs.residuals).sum()) > 0

    label_outputs = precompute_text_features(txt_enc, dm.class_prompts, batch_size=8)
    prob = make_predictions(head2, image_outputs, label_outputs, batch_size=16)
    assert prob.mean.shape == (32, 4)
    assert np.isfinite(np.asarray(prob.mean)).all()
    assert (np.asarray(prob.var) >= 0).all()

    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 * prob.var)
    pred = jax.nn.softmax(kappa * prob.mean, axis=-1)
    acc, nlpd, ece = evaluate_prediction(pred, class_ids, num_classes=4)
    assert np.isfinite(np.asarray(nlpd)).all()
    assert 0.0 <= ece <= 1.0
