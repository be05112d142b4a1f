"""Minimal offline serving demo for ProbabilisticVLM.

Runs end-to-end with random-init tiny weights and synthetic hessian
artifacts (no network, no checkpoint downloads): build the posterior,
cache class prompts, and serve calibrated predictions for a batch of
images. Swap model_str/weights_dir/hessian_dir for a real deployment —
the call pattern is identical.

    python examples/serving.py
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
from bayesvlm_tpu.models.configs import TINY_CLIP_CONFIG as cfg
from bayesvlm_tpu.pipeline import ProbabilisticVLM


def make_demo_hessians(path: str) -> str:
    """Stand-in Stage-1 artifacts (real runs: scripts/hessian_estimation.py)."""
    rng = np.random.default_rng(0)

    def spd(d):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return M @ M.T / d + np.eye(d, dtype=np.float32)

    save_hessians(path, spd(cfg.vision.hidden_size),
                  spd(cfg.vision.projection_dim), "img")
    save_hessians(path, spd(cfg.text.hidden_size),
                  spd(cfg.text.projection_dim), "txt")
    save_prior_precision(path, 5.0, 1.0, 5.0, 1.0)
    return path


def main():
    hessian_dir = make_demo_hessians(tempfile.mkdtemp())

    vlm = ProbabilisticVLM.from_pretrained(
        "tiny-clip",          # real runs: "clip-large" etc.
        hessian_dir,          # real runs: hessians/hessian_CLIP-ViT-L-14-...
        # weights_dir=...,    # local HF snapshot (offline)
        # tokenizer_dir=...,  # local tokenizer files
        prior_num_steps=100,
        mesh=None,  # single-device latency lane (compile_serving below);
                    # drop this to auto-shard batches on a multi-chip mesh
    ).set_class_prompts([f"An image of a thing {i}" for i in range(5)])

    rng = np.random.default_rng(1)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)

    probs = np.asarray(vlm.predict(images))           # probit-calibrated
    logits = vlm.logits(images)                       # mean + variance
    mc = np.asarray(vlm.predict(images, num_samples=64, seed=0))

    print("lambda_img / lambda_txt:",
          round(vlm.info["lambda_img"], 3), round(vlm.info["lambda_txt"], 3))
    print("probit probs:", probs.shape, "row sums", probs.sum(-1).round(4))
    print("predictive var (mean over batch):",
          float(np.mean(np.asarray(logits.var))))
    print("MC vs probit max |d|:", float(np.abs(mc - probs).max()))

    # low-latency lane: AOT-compile the predict chain into one fused
    # donated-input program for a fixed batch size; predict() uses it
    # automatically on signature match
    vlm.compile_serving(batch_size=8)
    fast = np.asarray(vlm.predict(images))
    print("AOT fast path max |d| vs general path:",
          float(np.abs(fast - probs).max()))

    # multi-model co-residency: several VLMs resident on one chip behind
    # ONE dispatcher (the measured envelope fits ~12 ViT-H-class towers
    # per 16 GiB chip — BASELINE.md). Real deployments pass different
    # model_str/hessian_dir per lane; scripts/serve.py --models_json
    # exposes the same thing over HTTP as POST /predict/<model>.
    from bayesvlm_tpu.multiserve import MultiModelServer

    vlm_b = ProbabilisticVLM.from_pretrained(
        "tiny-clip", hessian_dir, prior_num_steps=100, mesh=None,
    ).set_class_prompts([f"A photo of object {i}" for i in range(3)])
    with MultiModelServer({"things": vlm, "objects": vlm_b},
                          batch_size={"things": 8, "objects": 4},
                          buckets="pow2", max_wait_ms=2.0) as ms:
        p1 = ms.predict("things", images[0])
        p2 = ms.predict("objects", images[1])
        print("co-resident lanes:", p1.shape, p2.shape,
              "| compiled HBM:", ms.hbm_footprint())


if __name__ == "__main__":
    main()
