#!/usr/bin/env python
"""Hardware smoke: the full Stage-3 AL driver (scripts/activelearning.py
main(), all 14 strategies incl. online EPIG + per-subset fine-tune) on
the REAL TPU with --mlp_int8 — tiny synthetic config, mirroring
tests/test_activelearning.py but on hardware with the int8 feature
pass (tiny-shape Mosaic int8 is a distinct surface from the ViT-L
benchmarks). ROUND3 §15 did the bf16 version; this is the int8 rerun.

Usage: python scripts/dev/smoke_al_int8_tpu.py [workdir]
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(workdir):
    tmp = Path(workdir)
    tmp.mkdir(parents=True, exist_ok=True)
    hessian_dir = tmp / "hessians"

    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HashTokenizer
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    cfg = CONFIGS_BY_NAME["tiny-clip"]
    img_enc, txt_enc, head = load_model("tiny-clip", seed=0)
    txt_enc.tokenizer = HashTokenizer(
        cfg.text.vocab_size, cfg.text.max_length, eos_id=cfg.text.eos_token_id
    )
    dm = DataModuleFactory(batch_size=16, num_workers=2,
                           shuffle_train=False).create("synthetic")
    dm.setup()
    act_img, emb_img = compute_features(
        img_enc, dm.train_dataloader(), return_tensors=True, modality="image")
    act_txt, emb_txt = compute_features(
        txt_enc, dm.train_dataloader(), return_tensors=True, modality="text")
    A_img, B_img = kfac_ggn(
        head.logit_scale, head.logit_bias, 32, emb_img, act_img, emb_txt,
        "info_nce")
    A_txt, B_txt = kfac_ggn(
        head.logit_scale, head.logit_bias, 32, emb_txt, act_txt, emb_img,
        "info_nce")
    save_hessians(hessian_dir, A_img, B_img, "img")
    save_hessians(hessian_dir, A_txt, B_txt, "txt")
    save_prior_precision(hessian_dir, 50.0, 1.0, 50.0, 1.0)

    import activelearning as al

    results = al.main(
        model_str="tiny-clip", dataset="synthetic",
        hessian_dir=str(hessian_dir), experiment_dir=str(tmp / "exp"),
        project_name="smoke", hessian_scale=10.0, subset_size=4,
        predictions_batch_size=32, precompute_batch_size=16,
        precompute_num_workers=2, finetune_lr=1e-3, finetune_wd=1e-2,
        finetune_epochs=2, finetune_batch_size=8, epig_lr=1e-4,
        epig_hessian_update_scale=10.0, epig_num_samples=8, k_nearest=1,
        knn_method="wasserstein", epig_pool_max_size=32,
        epig_target_max_size=16,
        mlp_int8=True,
    )
    assert len(results) == 14, sorted(results)
    for name, metrics in results.items():
        assert 0.0 <= metrics["accuracy"] <= 1.0, name
        assert np.isfinite(metrics["loss"]), name
    print(json.dumps({"backend": jax.default_backend(),
                      "strategies": len(results), "ok": True}))


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="al_int8_smoke_")
    main(wd)
