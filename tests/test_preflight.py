"""Dry-run of scripts/preflight.py on a fully offline tiny fixture: a
transformers CLIPModel built from config objects (random init) saved as
a local HF snapshot, tiny random SPD Hessians, and the synthetic
dataset. The script must convert, pass HF parity, and produce finite
ACC/NLPD/ECE — proving the real-weights path works end-to-end before
real weights exist (VERDICT round-1 #7; ref:scripts/zeroshot.py:25-128)."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture(scope="module")
def tiny_snapshot(tmp_path_factory):
    """Save a random-init HF CLIPModel matching the tiny-clip config as a
    local snapshot directory."""
    d = tmp_path_factory.mktemp("snapshot")
    cfg = transformers.CLIPConfig(
        projection_dim=16,
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
            hidden_act="gelu", projection_dim=16,
        ),
        text_config=dict(
            vocab_size=64, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, hidden_act="gelu",
            projection_dim=16, eos_token_id=63, bos_token_id=0,
            pad_token_id=1,
        ),
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return d


@pytest.fixture(scope="module")
def tiny_hessians(tmp_path_factory):
    from bayesvlm_tpu.io.artifacts import save_hessians

    d = tmp_path_factory.mktemp("hessians")
    rng = np.random.default_rng(0)

    def spd(n):
        M = rng.normal(size=(n, n)).astype(np.float32)
        return M @ M.T / n + np.eye(n, dtype=np.float32)

    # tiny-clip dims: A = tower activation dim, B = projection dim
    save_hessians(d, spd(32), spd(16), "img")
    save_hessians(d, spd(24), spd(16), "txt")
    return d


def test_preflight_dry_run(tiny_snapshot, tiny_hessians, tmp_path):
    import preflight

    summary = preflight.main(
        model_str="tiny-clip",
        snapshot=str(tiny_snapshot),
        hessian_dir=str(tiny_hessians),
        dataset="synthetic",
        out=tmp_path / "weights",
        dtype="fp32",
        batch_size=16,
        num_workers=2,
        use_mesh=False,
    )
    assert 0.0 <= summary["acc"] <= 1.0
    assert np.isfinite(summary["nlpd"]) and np.isfinite(summary["ece"])
    assert summary["lambda_img"] > 0 and summary["lambda_txt"] > 0
    # parity ran (tiny fixture must be bit-convertible)
    assert summary["parity"]["image_max_rel"] <= preflight.PARITY_RTOL
    assert summary["parity"]["text_max_rel"] <= preflight.PARITY_RTOL
    # cache reuse: second run skips conversion and still succeeds
    summary2 = preflight.main(
        model_str="tiny-clip",
        snapshot=str(tiny_snapshot),
        hessian_dir=str(tiny_hessians),
        dataset="synthetic",
        out=tmp_path / "weights",
        dtype="fp32",
        batch_size=16,
        num_workers=2,
        skip_parity=True,
        use_mesh=False,
    )
    assert summary2["acc"] == pytest.approx(summary["acc"], abs=1e-6)
