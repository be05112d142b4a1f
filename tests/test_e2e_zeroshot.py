"""End-to-end slice (SURVEY §7 step 4): tiny model + synthetic data through
the full pipeline — Hessian estimation (kfac_ggn driver) -> artifact dir ->
lambda optimization -> covariances -> feature precompute -> probabilistic
predictions -> probit -> metrics. CPU-runnable stand-in for the reference
notebook integration test."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

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
from bayesvlm_tpu.io.artifacts import (
    load_hessians,
    save_hessians,
    save_prior_precision,
)
from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    hessian_dir = tmp / "hessians"

    img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    txt_enc.tokenizer = HashTokenizer(
        TINY_CLIP_CONFIG.text.vocab_size,
        TINY_CLIP_CONFIG.text.max_length,
        eos_id=TINY_CLIP_CONFIG.text.eos_token_id,
    )

    dm = SyntheticDataModule(
        batch_size=16, num_train=64, num_test=48, num_classes=4, image_size=32,
        num_workers=2,
    )
    dm.setup()
    return tmp, hessian_dir, img_enc, txt_enc, head, dm


def test_stage1_hessian_estimation(pipeline):
    tmp, hessian_dir, img_enc, txt_enc, head, dm = pipeline

    # stream features through both encoders (caption = class prompt)
    loader = dm.train_dataloader()
    act_img, emb_img = compute_features(
        img_enc, loader, tag="img", cache_dir=hessian_dir, return_tensors=True,
        modality="image",
    )
    act_txt, emb_txt = compute_features(
        txt_enc, dm.train_dataloader(), tag="txt", cache_dir=hessian_dir,
        return_tensors=True, modality="text",
    )
    assert emb_img.shape[0] == 64 and emb_txt.shape[0] == 64

    A_img, B_img = kfac_ggn(
        head.logit_scale, head.logit_bias, num_classes=32,
        source_embeds=emb_img, source_activations=act_img,
        target_embeds=emb_txt, likelihood="info_nce",
    )
    A_txt, B_txt = kfac_ggn(
        head.logit_scale, head.logit_bias, num_classes=32,
        source_embeds=emb_txt, source_activations=act_txt,
        target_embeds=emb_img, likelihood="info_nce",
    )
    D = TINY_CLIP_CONFIG.vision.projection_dim
    assert B_img.shape == (D, D)
    assert A_img.shape == (TINY_CLIP_CONFIG.vision.hidden_size,) * 2
    # symmetric PSD-ish
    np.testing.assert_allclose(B_img, B_img.T, atol=1e-4)

    save_hessians(hessian_dir, A_img, B_img, "img")
    save_hessians(hessian_dir, A_txt, B_txt, "txt")

    lam_img = float(
        optimize_prior_precision(
            img_enc.projection_l2(), img_enc.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=10.0, n=1.0, lr=1e-2, num_steps=100,
        )
    )
    lam_txt = float(
        optimize_prior_precision(
            txt_enc.projection_l2(), txt_enc.projection_num_params(),
            A=A_txt, B=B_txt, lmbda_init=10.0, n=1.0, lr=1e-2, num_steps=100,
        )
    )
    assert np.isfinite(lam_img) and lam_img > 0
    save_prior_precision(hessian_dir, lam_img, 1.0, lam_txt, 1.0)
    assert (hessian_dir / "prior_precision_analytic.json").exists()


def test_stage2_zeroshot(pipeline):
    tmp, hessian_dir, img_enc, txt_enc, head, dm = pipeline
    assert (hessian_dir / "A_img_analytic.pt").exists(), "stage 1 must run first"

    A_img, B_img, info = load_hessians(hessian_dir, "img", return_info=True)
    A_txt, B_txt = load_hessians(hessian_dir, "txt")
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, info)
    head2 = head.set_covariances(cov_img, cov_txt)

    cache = tmp / "cache"
    image_outputs, class_ids, image_ids = precompute_image_features(
        img_enc, dm.test_dataloader(), save_predictions=True, cache_dir=cache
    )
    assert len(image_outputs) == 48

    # cache-hit path returns identical features (resume contract)
    image_outputs2, class_ids2, _ = precompute_image_features(
        img_enc, dm.test_dataloader(), save_predictions=True, cache_dir=cache
    )
    np.testing.assert_allclose(
        np.asarray(image_outputs.embeds), np.asarray(image_outputs2.embeds),
        rtol=1e-6,
    )

    label_outputs = precompute_text_features(txt_enc, dm.class_prompts, batch_size=8)
    assert len(label_outputs) == 4

    prob_logits = make_predictions(head2, image_outputs, label_outputs, batch_size=16)
    assert prob_logits.mean.shape == (48, 4)
    assert np.all(np.asarray(prob_logits.var) >= 0)

    kappa = 1.0 / jnp.sqrt(1.0 + jnp.pi / 8 * prob_logits.var)
    pred = jax.nn.softmax(kappa * prob_logits.mean, axis=-1)
    acc, nlpd, ece = evaluate_prediction(pred, class_ids, num_classes=4)
    assert acc.shape == (48,)
    assert np.isfinite(np.asarray(nlpd)).all()
    assert 0.0 <= ece <= 1.0

    # probit must shrink confidence vs MAP softmax (var > 0)
    map_pred = jax.nn.softmax(prob_logits.mean, axis=-1)
    assert float(jnp.max(pred)) <= float(jnp.max(map_pred)) + 1e-6


def test_zeroshot_script_cli(pipeline, tmp_path):
    """Run the actual scripts/zeroshot.py main() on the tiny artifacts."""
    tmp, hessian_dir, *_ = pipeline
    assert (hessian_dir / "A_img_analytic.pt").exists()

    import zeroshot as zs

    acc, nlpd, ece = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-clip",
        pseudo_data_count=10,
        batch_size=16,
        num_workers=2,
    )
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(nlpd)
