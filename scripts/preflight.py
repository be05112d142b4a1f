#!/usr/bin/env python
"""Real-weights preflight: the one command to run when HF weights and
datasets become available.

The north-star quality rows (CIFAR-100 / ImageNet-1k ACC/NLPD/ECE vs the
paper, ref:scripts/zeroshot.py:25-128) are blocked in the build
environment by the lack of network egress. This script makes them fill
within minutes of weights appearing:

  1. convert    — HF snapshot -> msgpack parameter cache
                  (scripts/convert_weights.py), skipped if cached
  2. parity     — our fp32 towers vs the actual HF torch model from the
                  same snapshot (get_image_features / get_text_features)
                  on random inputs; hard-fails above tolerance
  3. zeroshot   — the full Stage-2 probabilistic pipeline
                  (scripts/zeroshot.py) on the requested dataset with
                  the shipped golden Hessians: prints ACC / NLPD / ECE

Expected layout (all local, no network):

  <snapshot>/                HF snapshot dir for the model (e.g. a
      config.json            huggingface_hub download of
      model.safetensors      laion/CLIP-ViT-B-32-laion2B-s34B-b79K),
      (or pytorch_model.bin) containing the full CLIPModel/SiglipModel
      tokenizer_config.json  state dict. Tokenizer files alongside are
      ...                    picked up automatically.
  <hessian_dir>/             reference artifact dir, e.g.
      A_img_analytic.pt      hessians/hessian_CLIP-ViT-B-32-laion2B-...
      B_img_analytic.pt      (shipped with the reference repo)
      A_txt_analytic.pt
      B_txt_analytic.pt
  <data_base_dir>/           dataset root per data/factory.py (.env
                             DATA_BASE_DIR also works); `synthetic`
                             needs nothing on disk.

Usage:
  python scripts/preflight.py --model clip-base \
      --snapshot /weights/hf/CLIP-ViT-B-32-laion2B-s34B-b79K \
      --hessian_dir hessians/hessian_CLIP-ViT-B-32-laion2B-s34B-b79K \
      --dataset cifar100 --data_base_dir /data
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

PARITY_RTOL = 2e-3
PARITY_ATOL = 2e-4  # fp32 tower tolerances of tests/test_hf_parity.py


def step_convert(model_str: str, snapshot: str, out_dir: Path,
                 force: bool = False) -> Path:
    import convert_weights

    # head.json is written LAST (atomically) by convert_weights, so its
    # presence proves the whole artifact set landed; checking only the
    # first artifact would trust an interrupted conversion
    complete = all(
        (out_dir / f).exists()
        for f in ("vision.msgpack", "text.msgpack", "head.json")
    )
    if complete and not force:
        print(f"[convert] cache exists at {out_dir}, skipping (use --force_convert to redo)")
        return out_dir
    print(f"[convert] {snapshot} -> {out_dir}")
    convert_weights.main(model_str, snapshot, str(out_dir))
    return out_dir


def step_parity(model_str: str, snapshot: str, weights_dir: Path,
                n_images: int = 4, n_texts: int = 4, seed: int = 0):
    """Compare our fp32 towers (loaded from the converted cache) against
    the HF torch model loaded from the same snapshot. Returns
    {'image_max_rel': float, 'text_max_rel': float}."""
    import numpy as np
    import torch
    import transformers

    import jax.numpy as jnp

    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME

    config = CONFIGS_BY_NAME[model_str]
    cls = {"clip": transformers.CLIPModel,
           "siglip": transformers.SiglipModel}[config.family]
    hf = cls.from_pretrained(snapshot).eval()

    img_enc, txt_enc, _ = load_model(model_str, weights_dir=str(weights_dir),
                                     dtype=jnp.float32)

    rng = np.random.default_rng(seed)
    size = config.vision.image_size
    pixels = rng.normal(size=(n_images, 3, size, size)).astype(np.float32)

    tcfg = config.text
    ids = rng.integers(2, max(3, tcfg.vocab_size - 2),
                       size=(n_texts, tcfg.max_length)).astype(np.int64)
    if config.family == "clip":
        # CLIP pools at the EOS position; give each row one
        ids[:, 0] = 0
        for r in range(n_texts):
            ids[r, 1 + r % (tcfg.max_length - 1)] = tcfg.eos_token_id

    with torch.no_grad():
        hf_img = hf.get_image_features(pixel_values=torch.tensor(pixels)).numpy()
        hf_txt = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()

    import jax

    # On TPU, fp32 matmuls default to fast bf16 passes; the parity check
    # is about CONVERSION correctness, so force true fp32 accumulation.
    with jax.default_matmul_precision("highest"):
        ours_img = np.asarray(img_enc(jnp.asarray(pixels)).embeds)
        ours_txt = np.asarray(txt_enc(jnp.asarray(ids, jnp.int32)).embeds)

    def max_rel(a, b):
        return float(np.max(np.abs(a - b) / (np.abs(b) + PARITY_ATOL)))

    res = {"image_max_rel": max_rel(ours_img, hf_img),
           "text_max_rel": max_rel(ours_txt, hf_txt)}
    for k, v in res.items():
        status = "OK" if v <= PARITY_RTOL else "FAIL"
        print(f"[parity] {k}: {v:.2e} ({status}, tol {PARITY_RTOL:.0e})")
    if max(res.values()) > PARITY_RTOL:
        raise SystemExit(
            f"[parity] FAILED: converted towers diverge from the HF "
            f"snapshot beyond rtol={PARITY_RTOL} — do not trust "
            f"downstream numbers. {res}")
    return res


def main(model_str: str, snapshot: str, hessian_dir: str,
         dataset: str = "cifar100", data_base_dir=None, out=None,
         tokenizer_dir=None, dtype: str = "bf16", batch_size: int = 32,
         num_workers: int = 4, pseudo_data_count: int = 10,
         skip_parity: bool = False, force_convert: bool = False,
         use_mesh: bool = True):
    if data_base_dir is not None:
        import os

        os.environ["DATA_BASE_DIR"] = str(data_base_dir)

    out_dir = Path(out) if out else Path("weights") / model_str
    step_convert(model_str, snapshot, out_dir, force=force_convert)

    parity = None
    if skip_parity:
        print("[parity] skipped (--skip_parity)")
    else:
        parity = step_parity(model_str, snapshot, out_dir)

    if tokenizer_dir is None and (Path(snapshot) / "tokenizer_config.json").exists():
        tokenizer_dir = snapshot
        print(f"[zeroshot] using tokenizer files from the snapshot")

    import zeroshot

    acc, nlpd, ece = zeroshot.main(
        dataset=dataset, hessian_dir=hessian_dir, model_str=model_str,
        pseudo_data_count=pseudo_data_count, batch_size=batch_size,
        num_workers=num_workers, weights_dir=str(out_dir),
        tokenizer_dir=tokenizer_dir, dtype=dtype, use_mesh=use_mesh,
    )
    summary = {
        "model": model_str, "dataset": dataset,
        "acc": acc, "nlpd": nlpd, "ece": ece,
        "lambda_img": zeroshot.main.last_info["lambda_img"],
        "lambda_txt": zeroshot.main.last_info["lambda_txt"],
        "parity": parity,
    }
    print("[preflight] " + json.dumps(summary))
    return summary


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True)
    parser.add_argument("--snapshot", required=True,
                        help="local HF snapshot dir (config.json + weights)")
    parser.add_argument("--hessian_dir", required=True)
    parser.add_argument("--dataset", default="cifar100")
    parser.add_argument("--data_base_dir", default=None)
    parser.add_argument("--out", default=None,
                        help="converted-weights cache dir (default weights/<model>)")
    parser.add_argument("--tokenizer_dir", default=None)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--pseudo_data_count", type=int, default=10)
    parser.add_argument("--skip_parity", action="store_true")
    parser.add_argument("--force_convert", action="store_true")
    parser.add_argument("--no_mesh", action="store_true")
    args = parser.parse_args()
    main(
        model_str=args.model, snapshot=args.snapshot,
        hessian_dir=args.hessian_dir, dataset=args.dataset,
        data_base_dir=args.data_base_dir, out=args.out,
        tokenizer_dir=args.tokenizer_dir, dtype=args.dtype,
        batch_size=args.batch_size, num_workers=args.num_workers,
        pseudo_data_count=args.pseudo_data_count,
        skip_parity=args.skip_parity, force_convert=args.force_convert,
        use_mesh=not args.no_mesh,
    )
