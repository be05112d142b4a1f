"""AL variant drivers (kmeans, EGL, LLM) end-to-end on tiny model +
synthetic data, including the LLM path with a stub client."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture(scope="module")
def tiny_hessians(tmp_path_factory):
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.data import HashTokenizer, SyntheticDataModule
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG

    tmp = tmp_path_factory.mktemp("alv")
    hessian_dir = tmp / "hessians"
    img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
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
    A_i, B_i = kfac_ggn(head.logit_scale, head.logit_bias, 32, emb_i, act_i,
                        emb_t, "info_nce")
    A_t, B_t = kfac_ggn(head.logit_scale, head.logit_bias, 32, emb_t, act_t,
                        emb_i, "info_nce")
    save_hessians(hessian_dir, A_i, B_i, "img")
    save_hessians(hessian_dir, A_t, B_t, "txt")
    save_prior_precision(hessian_dir, 50.0, 1.0, 50.0, 1.0)
    return tmp, hessian_dir


def _common_kwargs(tmp, hessian_dir, exp):
    return dict(
        model_str="tiny-clip",
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        experiment_dir=str(tmp / exp),
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
        k_nearest=1,
        knn_method="wasserstein",
    )


def test_kmeans_variant(tiny_hessians):
    tmp, hessian_dir = tiny_hessians
    import activelearning_kmeans as alk

    results = alk.main(
        **_common_kwargs(tmp, hessian_dir, "exp_kmeans"),
        k_clusters=16,
        early_stopping_patience=15,
    )
    # reference strategy keys (ref:activelearning_kmeans.py:603-714)
    assert "entropy_map_kmeans_knn" in results
    assert "entropy_map_trainset_direct" in results
    assert "bald_test_kmeans_knn" in results
    assert "epig_direct" in results
    assert len([k for k in results
                if k.startswith("random_on_test_kmeans_knn")]) == 5
    assert len([k for k in results
                if k.startswith("random_on_train_direct")]) == 5
    for m in results.values():
        assert np.isfinite(m["loss"])
    # representative indices must be valid ORIGINAL train indices (the
    # driver's factory-built synthetic module has 256 train samples)
    js = list((tmp / "exp_kmeans" / "synthetic").glob(
        "kmeans_*/subset_indices_train.json"))[0]
    saved = json.loads(js.read_text())
    for strat in saved.values():
        for entry in strat.values():
            assert all(0 <= int(i) < 256 for i in entry["indices"])


def test_elg_variant(tiny_hessians):
    tmp, hessian_dir = tiny_hessians
    import activelearning_elg as ale

    results = ale.main(
        **_common_kwargs(tmp, hessian_dir, "exp_elg"),
        epig_num_samples=8, epig_pool_max_size=32, epig_target_max_size=16,
    )
    # full reference strategy set (ref:activelearning_elg.py:670-806)
    for key in ("entropy_map", "entropy_map_train", "bald_test",
                "egl_test", "epig_knn"):
        assert key in results, key
    assert len([k for k in results if k.startswith("random_on_test")]) == 5
    assert len([k for k in results if k.startswith("random_on_train")]) == 5

    # --only_egl gating: a fresh run must produce egl_test only
    results2 = ale.main(
        **_common_kwargs(tmp, hessian_dir, "exp_elg_only"), only_egl=True,
    )
    assert set(results2) == {"egl_test"}


def test_llm_variant_with_stub_client(tiny_hessians):
    tmp, hessian_dir = tiny_hessians
    import activelearning_llm as all_

    calls = []

    def stub_client(prompt):
        calls.append(prompt)
        # deterministic score derived from the prompt content
        return f"Score: {1 + (hash(prompt) % 5)}"

    results = all_.main(
        **_common_kwargs(tmp, hessian_dir, "exp_llm"),
        llm_score_type="difficulty",
        llm_client=stub_client,
        epig_num_samples=8, epig_pool_max_size=32, epig_target_max_size=16,
    )
    # full reference strategy set (ref:activelearning_llm.py:640-760)
    for key in ("entropy_map", "entropy_map_train", "bald_test",
                "epig_knn", "llm_difficulty_test"):
        assert key in results, key
    assert len([k for k in results if k.startswith("random_on_test")]) == 5
    assert len([k for k in results if k.startswith("random_on_train")]) == 5
    assert len(calls) == 128  # one call per test candidate (factory default)
    assert all("challenging" in p for p in calls)

    # run_llm_value flag produces the value-scored strategy too
    results2 = all_.main(
        **_common_kwargs(tmp, hessian_dir, "exp_llm2"),
        run_llm_value=True,
        llm_client=stub_client,
        only_random_strategies=True,  # skip the shared strategies for speed
    )
    assert "llm_value_test" in results2
