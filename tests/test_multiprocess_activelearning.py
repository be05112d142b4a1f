"""REAL 2-process active-learning driver end-to-end (round-3 VERDICT #6).

Two coordinated jax processes (gloo CPU collectives, 4 virtual devices
each) run the actual scripts/activelearning.py main(): stripe-sharded
feature precompute over host-local meshes, allgather + re-interleave,
replicated selection (entropy/BALD + kNN) and per-subset fine-tuning,
primary-only writes. The primary's subset JSON and fine-tuned projection
checkpoints must match a single-process replay of the same command.

Companion to tests/test_multiprocess_dist.py (same worker recipe);
ref:scripts/activelearning.py:447-599 defines the strategy-block
semantics being distributed.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

_AL_KW = """dict(
    model_str="tiny-clip", dataset="synthetic",
    hessian_dir={hdir!r}, experiment_dir={edir!r},
    project_name="mp-test", hessian_scale=10.0, subset_size=4,
    predictions_batch_size=32, precompute_batch_size=16,
    precompute_num_workers=0,
    finetune_lr=1e-3, finetune_wd=1e-2, finetune_epochs=2,
    finetune_batch_size=8,
    only_deterministic_strategies=True, without_epig=True,
    k_nearest=1, knn_method="wasserstein",
)"""

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = "localhost:{port}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(pid)
sys.path.insert(0, {repo!r})
sys.path.insert(0, {scripts!r})
import jax
jax.config.update("jax_platforms", "cpu")
import activelearning as al
al.main(**{kw})
print("WORKER", pid, "AL DONE")
"""


@pytest.fixture(scope="module")
def tiny_hessians(tmp_path_factory):
    """Tiny-clip K-FAC fixture shared by the workers and the replay."""
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.data import HashTokenizer, SyntheticDataModule
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG

    tmp = tmp_path_factory.mktemp("mp_al")
    hessian_dir = tmp / "hessians"

    img_enc, txt_enc, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    txt_enc.tokenizer = HashTokenizer(
        TINY_CLIP_CONFIG.text.vocab_size, TINY_CLIP_CONFIG.text.max_length,
        eos_id=TINY_CLIP_CONFIG.text.eos_token_id,
    )
    dm = SyntheticDataModule(
        batch_size=16, num_train=64, num_test=32, num_classes=4,
        image_size=32, num_workers=0,
    )
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
    return tmp, hessian_dir


@pytest.mark.slow
def test_two_process_activelearning(tiny_hessians):
    tmp, hessian_dir = tiny_hessians

    mp_dir = tmp / "exp_mp"
    kw = _AL_KW.format(hdir=str(hessian_dir), edir=str(mp_dir))
    worker = _WORKER.format(
        port=29417, repo=str(REPO), scripts=str(REPO / "scripts"), kw=kw)
    env = dict(os.environ, PYTHONHASHSEED="0")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} AL DONE" in out
    # the stripe sharding actually happened on both hosts
    assert "host 0/2 encodes its sample stripe" in outs[0]
    assert "host 1/2 encodes its sample stripe" in outs[1]

    run_dir = mp_dir / "synthetic"
    # per-host feature caches exist; primary-only artifact writes
    assert (run_dir / "base" / "train_host0").exists()
    assert (run_dir / "base" / "train_host1").exists()

    subset_dirs = list(run_dir.glob("subset_*"))
    assert len(subset_dirs) == 1
    mp_json = subset_dirs[0] / "subset_indices_train.json"
    assert mp_json.exists()
    mp_subsets = json.loads(mp_json.read_text())
    assert set(mp_subsets) == {"entropy_map", "entropy_map_train", "bald_test"}

    # replica never wrote checkpoints; primary wrote one per subset
    for s in mp_subsets:
        assert (subset_dirs[0] / s / "img_projection.pt").exists()
        replica = subset_dirs[0] / s / "_replica_host1" / "img_projection.pt"
        assert not replica.exists()

    # --- single-process replay (8 virtual devices, this interpreter) ---
    import activelearning as al

    sp_dir = tmp / "exp_sp"
    al.main(**eval(_AL_KW.format(hdir=str(hessian_dir), edir=str(sp_dir))))
    sp_subset_dir = list((sp_dir / "synthetic").glob("subset_*"))[0]
    sp_subsets = json.loads(
        (sp_subset_dir / "subset_indices_train.json").read_text())

    assert mp_subsets == sp_subsets, "subset selections diverged"

    from bayesvlm_tpu.io.torch_compat import load_pt_array

    for s in mp_subsets:
        mp_sd = load_pt_array(subset_dirs[0] / s / "img_projection.pt")
        sp_sd = load_pt_array(sp_subset_dir / s / "img_projection.pt")
        assert set(mp_sd) == set(sp_sd)
        for k in mp_sd:
            np.testing.assert_allclose(
                np.asarray(mp_sd[k]), np.asarray(sp_sd[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"{s}/{k}")
