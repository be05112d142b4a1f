"""Active-learning driver: run the full scripts/activelearning.py main()
on tiny model + synthetic data, all strategies (entropy/BALD/EPIG/random),
then resume from the JSON checkpoint."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture(scope="module")
def al_run(tmp_path_factory):
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.data import HashTokenizer, SyntheticDataModule
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG

    tmp = tmp_path_factory.mktemp("al")
    hessian_dir = tmp / "hessians"

    img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    txt_enc.tokenizer = HashTokenizer(
        TINY_CLIP_CONFIG.text.vocab_size, TINY_CLIP_CONFIG.text.max_length,
        eos_id=TINY_CLIP_CONFIG.text.eos_token_id,
    )
    dm = SyntheticDataModule(
        batch_size=16, num_train=64, num_test=32, num_classes=4, image_size=32,
        num_workers=2,
    )
    dm.setup()
    act_img, emb_img = compute_features(
        img_enc, dm.train_dataloader(), return_tensors=True, modality="image"
    )
    act_txt, emb_txt = compute_features(
        txt_enc, dm.train_dataloader(), return_tensors=True, modality="text"
    )
    A_img, B_img = kfac_ggn(
        head.logit_scale, head.logit_bias, 32, emb_img, act_img, emb_txt, "info_nce"
    )
    A_txt, B_txt = kfac_ggn(
        head.logit_scale, head.logit_bias, 32, emb_txt, act_txt, emb_img, "info_nce"
    )
    save_hessians(hessian_dir, A_img, B_img, "img")
    save_hessians(hessian_dir, A_txt, B_txt, "txt")
    save_prior_precision(hessian_dir, 50.0, 1.0, 50.0, 1.0)
    return tmp, hessian_dir


def test_activelearning_main_all_strategies(al_run):
    tmp, hessian_dir = al_run
    import activelearning as al

    results = al.main(
        model_str="tiny-clip",
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        experiment_dir=str(tmp / "exp"),
        project_name="test",
        hessian_scale=10.0,
        subset_size=4,
        predictions_batch_size=32,
        precompute_batch_size=16,
        precompute_num_workers=2,
        finetune_lr=1e-3,
        finetune_wd=1e-2,
        finetune_epochs=2,
        finetune_batch_size=8,
        epig_lr=1e-4,
        epig_hessian_update_scale=10.0,
        epig_num_samples=8,
        k_nearest=1,
        knn_method="wasserstein",
        epig_pool_max_size=32,
        epig_target_max_size=16,
    )
    expected = {
        "entropy_map", "entropy_map_train", "bald_test", "epig_knn",
    } | {f"random_on_test_{i}" for i in range(5)} | {
        f"random_on_train_{i}" for i in range(5)
    }
    assert set(results) == expected
    for name, metrics in results.items():
        assert 0.0 <= metrics["accuracy"] <= 1.0, name
        assert np.isfinite(metrics["loss"]), name

    # strategy checkpoint exists and all subsets recorded
    subset_json = list((tmp / "exp" / "synthetic").glob("subset_*/subset_indices_train.json"))
    assert len(subset_json) == 1
    with open(subset_json[0]) as f:
        saved = json.load(f)
    assert set(saved) == expected

    # projection checkpoints written
    ckpts = list((tmp / "exp" / "synthetic").glob("subset_*/*/img_projection.pt"))
    assert len(ckpts) == len(expected)


def test_activelearning_resume_uses_checkpoint(al_run):
    """Second invocation must reuse the saved subsets (no strategy rerun) —
    the reference's JSON-gated resume contract."""
    tmp, hessian_dir = al_run
    import activelearning as al

    subset_json = list(
        (tmp / "exp" / "synthetic").glob("subset_*/subset_indices_train.json")
    )[0]
    before = subset_json.read_text()
    ckpts = sorted(
        (tmp / "exp" / "synthetic").glob("subset_*/*/img_projection.pt")
    )
    assert ckpts
    mtimes_before = {p: p.stat().st_mtime for p in ckpts}

    results = al.main(
        model_str="tiny-clip",
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        experiment_dir=str(tmp / "exp"),
        project_name="test",
        hessian_scale=10.0,
        subset_size=4,
        predictions_batch_size=32,
        precompute_batch_size=16,
        precompute_num_workers=2,
        finetune_epochs=1,
        finetune_batch_size=8,
        epig_num_samples=8,
        k_nearest=1,
        knn_method="wasserstein",
        epig_pool_max_size=32,
        epig_target_max_size=16,
    )
    after = subset_json.read_text()
    # same selection content (strategies not recomputed)
    assert json.loads(before) == json.loads(after)
    # skip-if-exists projection-checkpoint resume
    # (ref:activelearning_kmeans.py:424): no checkpoint rewritten
    for p, m in mtimes_before.items():
        assert p.stat().st_mtime == m, f"checkpoint rewritten: {p}"


def test_conflicting_epig_flags_fail_fast():
    """--only_epig + --without_epig would select zero strategies; the
    driver must raise before the expensive feature precompute (the kmeans
    variant has the identical guard)."""
    import activelearning

    with pytest.raises(ValueError, match="only_epig and without_epig"):
        activelearning.main(
            dataset="synthetic", hessian_dir="/nonexistent",
            experiment_dir="/nonexistent", model_str="tiny-clip",
            project_name="t", hessian_scale=1.0, subset_size=4,
            only_epig=True, without_epig=True,
        )
