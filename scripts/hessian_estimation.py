#!/usr/bin/env python
"""Stage 1: fit the K-FAC Laplace posterior over a (LAION-scale) dataset.

Drop-in CLI for ref:scripts/hessian_estimation.py:269-313 — same flags and
defaults, same artifact directory contract (A/B_{img,txt}_analytic.pt +
prior_precision_analytic.json), file-existence-gated resume.

TPU path: encoders run as jitted batch forwards; the GGN runs as
GEMM-reformulated class batches, sharded over all local devices when more
than one is present. Multi-host (COORDINATOR_ADDRESS/NUM_PROCESSES/
PROCESS_ID env): per-host tar sharding + cross-host factor reduction, or
--dist_global_batch for class batches spanning the gathered global
dataset (psum over ICI/DCN). TPU extras beyond the reference's flags:
--native_decode (C++ JPEG lane), --ggn_precision, --no_mesh, --device.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(
    dataset: str,
    model_str: str,
    precompute_batch_size: int,
    la_num_classes: int,
    la_batch_size: int,
    num_workers: int,
    hessian_dir: str,
    num_files=None,
    max_datapoints=None,
    siglip_chunk_size_j: int = 8000,
    lambda_init_txt: float = 400,
    lambda_init_img: float = 800,
    n_init_txt: float = 1.0,
    n_init_img: float = 1.0,
    lr: float = 1e-2,
    num_steps: int = 300,
    weights_dir=None,
    tokenizer_dir=None,
    use_mesh: bool = True,
    native_decode: bool = False,
    ggn_precision: str = "highest",
    dist_global_batch: bool = False,
    u8_pipeline: bool = False,
    mlp_int8: bool = False,
    save_orbax: bool = False,
    feature_checkpoint_every: int = 256,
    ggn_checkpoint_every: int = 1,
):
    from bayesvlm_tpu.bayes.estimation import kfac_ggn
    from bayesvlm_tpu.bayes.prior import optimize_prior_precision
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HashTokenizer, HFTokenizer
    from bayesvlm_tpu.data.transforms import get_transform
    from bayesvlm_tpu.dist.init import allgather_rows, initialize_distributed
    from bayesvlm_tpu.inference.precompute import compute_features
    from bayesvlm_tpu.io.artifacts import save_hessians, save_prior_precision
    from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.utils import get_image_size, get_likelihood_for_model

    os.makedirs(hessian_dir, exist_ok=True)
    # Multi-host: no-op single host; with a coordinator address set it
    # initializes jax.distributed and exposes the global data mesh + the
    # host's rank for input sharding (SURVEY §5; no reference counterpart).
    ctx = initialize_distributed() if use_mesh else None
    multi_host = ctx is not None and ctx.num_hosts > 1
    config = CONFIGS_BY_NAME[model_str]
    likelihood = get_likelihood_for_model(model_str)
    if u8_pipeline:
        # ship raw uint8 crops; the encoder normalizes in-graph (4x less
        # host->device traffic + less host CPU — see data/transforms.py)
        from bayesvlm_tpu.data.transforms import get_transform_uint8

        transform = get_transform_uint8(config.family, get_image_size(model_str))
    else:
        transform = get_transform(config.family, get_image_size(model_str))

    image_encoder, text_encoder, head = load_model(
        model_str, weights_dir=weights_dir, mlp_int8=mlp_int8)
    # pre-cast GEMM weights to the bf16 compute dtype (bit-identical to
    # the per-forward on-device convert it replaces; see cast_gemm_params)
    import dataclasses as _dc

    from bayesvlm_tpu.models.encoders import cast_gemm_params

    image_encoder = _dc.replace(
        image_encoder, params=cast_gemm_params(image_encoder.params))
    text_encoder = _dc.replace(
        text_encoder, params=cast_gemm_params(text_encoder.params))
    image_encoder = image_encoder.prequantize_int8()  # no-op unless mlp_int8
    if tokenizer_dir is not None:
        text_encoder.tokenizer = HFTokenizer.from_local(
            tokenizer_dir, config.text.max_length
        )
    elif text_encoder.tokenizer is None:
        text_encoder.tokenizer = HashTokenizer(
            config.text.vocab_size, config.text.max_length,
            eos_id=config.text.eos_token_id,
        )

    dm = DataModuleFactory(
        batch_size=precompute_batch_size,
        num_workers=num_workers,
        shuffle_train=False,
        train_transform=transform,
        test_transform=transform,
    ).create(dataset)
    if num_files is not None and dataset == "laion400m":
        print(f"Reducing number of files from {len(dm.data_path)} to {num_files}")
        dm.data_path = dm.data_path[:num_files]
    dm.setup()
    if native_decode:
        if not hasattr(dm, "enable_native_decode"):
            raise ValueError(f"--native_decode not supported for {dataset}")
        dm.enable_native_decode(
            get_image_size(model_str), family=config.family,
            num_threads=num_workers, out_uint8=u8_pipeline,
        )
        print("[native] batched C++ JPEG decode lane enabled "
              "(bilinear; see BASELINE.md for the measured delta)")
    if multi_host:
        if not hasattr(dm, "shard_for_host"):
            # without per-host sharding every host would process the FULL
            # dataset and allreduce_factors would combine the duplicated
            # sums as if disjoint — factors silently inflated by
            # sqrt(num_hosts). Fail fast instead.
            raise ValueError(
                f"multi-host runs need per-host data sharding, but dataset "
                f"'{dataset}' does not support shard_for_host (currently "
                f"only the webdataset-tar modules do); run single-host or "
                f"use a shardable dataset"
            )
        # per-host webdataset tar assignment (mirrors the num_files slicing
        # contract at ref:hessian_estimation.py:152-154, split over hosts)
        dm.shard_for_host(ctx.host_id, ctx.num_hosts)
        print(f"[dist] host {ctx.host_id}/{ctx.num_hosts} takes "
              f"{len(dm.dataset.tar_paths)} tar shards")
    loader = dm.test_dataloader()

    # multi-host: each host caches features for ITS data shard
    host_tag = f"_host{ctx.host_id}" if multi_host else ""
    fce = feature_checkpoint_every if feature_checkpoint_every > 0 else None
    path_act_img, path_emb_img = compute_features(
        image_encoder, loader, tag="img" + host_tag, cache_dir=hessian_dir,
        modality="image", checkpoint_every=fce,
    )
    path_act_txt, path_emb_txt = compute_features(
        text_encoder, loader, tag="txt" + host_tag, cache_dir=hessian_dir,
        modality="text", checkpoint_every=fce,
    )

    print("Loading embeddings and activations...")
    activations_img = np.asarray(load_pt_array(path_act_img))
    embeddings_img = np.asarray(load_pt_array(path_emb_img))
    activations_txt = np.asarray(load_pt_array(path_act_txt))
    embeddings_txt = np.asarray(load_pt_array(path_emb_txt))

    if max_datapoints is not None:
        activations_img = activations_img[:max_datapoints]
        embeddings_img = embeddings_img[:max_datapoints]
        activations_txt = activations_txt[:max_datapoints]
        embeddings_txt = embeddings_txt[:max_datapoints]

    # Global-class-batch mode: gather every host's features (rank order)
    # so the contrastive class batches span the WHOLE dataset, sharded
    # over the GLOBAL mesh — psum partials ride ICI within a slice and
    # DCN across (SURVEY §5 class-axis sharding). Without this flag each
    # host forms class batches from its own shard only and the factors
    # are combined afterwards (cheaper, different batch composition).
    global_batch = multi_host and dist_global_batch
    if global_batch:
        activations_img = allgather_rows(activations_img, ctx.num_hosts)
        embeddings_img = allgather_rows(embeddings_img, ctx.num_hosts)
        activations_txt = allgather_rows(activations_txt, ctx.num_hosts)
        embeddings_txt = allgather_rows(embeddings_txt, ctx.num_hosts)
        print(f"[dist] global class batches over {len(embeddings_img)} "
              f"gathered pairs, mesh {ctx.mesh.shape}")

    # Default multi-host: GGN accumulation runs over THIS host's devices
    # (each host holds a different data shard; cross-host combination
    # happens afterwards in allreduce_factors). Global-batch mode instead
    # shards the gathered class batches over the GLOBAL mesh.
    if ctx is None:
        mesh = None
    elif global_batch:
        mesh = ctx.mesh
    else:
        mesh = ctx.local_mesh
    scale = head.logit_scale
    bias = head.logit_bias

    def _global_factors(A, B, n_local):
        from bayesvlm_tpu.dist.init import allreduce_factors

        if global_batch:
            return A, B  # class batches already spanned all hosts
        return allreduce_factors(
            A, B, n_local, num_hosts=ctx.num_hosts if multi_host else 1
        )

    # GGN step-checkpoint lane: single-host only (orbax CheckpointManager
    # sync semantics differ under jax.distributed; multi-host keeps the
    # reference's whole-artifact gating, which the per-host feature parts
    # above already shorten substantially)
    def _ggn_ckpt_dir(direction):
        if multi_host or ggn_checkpoint_every <= 0:
            return None
        return str(Path(hessian_dir) / f"_ggn_steps_{direction}")

    A_img_path = Path(hessian_dir) / "A_img_analytic.pt"
    B_img_path = Path(hessian_dir) / "B_img_analytic.pt"
    if A_img_path.exists() and B_img_path.exists():
        A_img = np.asarray(load_pt_array(A_img_path))
        B_img = np.asarray(load_pt_array(B_img_path))
    else:
        print("Computing Hessian for image encoder...")
        A_img, B_img = kfac_ggn(
            scale, bias, la_num_classes,
            embeddings_img, activations_img, embeddings_txt,
            likelihood, block_size=la_batch_size,
            chunk_size_j=siglip_chunk_size_j, precision=ggn_precision,
            mesh=mesh, progress=True,
            checkpoint_dir=_ggn_ckpt_dir("img"),
            checkpoint_every=ggn_checkpoint_every,
        )
        n_local = (len(embeddings_img) // la_num_classes) * la_num_classes
        A_img, B_img = _global_factors(A_img, B_img, n_local)
        if ctx is None or ctx.is_primary:
            save_hessians(hessian_dir, A_img, B_img, "img")

    A_txt_path = Path(hessian_dir) / "A_txt_analytic.pt"
    B_txt_path = Path(hessian_dir) / "B_txt_analytic.pt"
    if A_txt_path.exists() and B_txt_path.exists():
        A_txt = np.asarray(load_pt_array(A_txt_path))
        B_txt = np.asarray(load_pt_array(B_txt_path))
    else:
        print("Computing Hessian for text encoder...")
        A_txt, B_txt = kfac_ggn(
            scale, bias, la_num_classes,
            embeddings_txt, activations_txt, embeddings_img,
            likelihood, block_size=la_batch_size,
            chunk_size_j=siglip_chunk_size_j, precision=ggn_precision,
            mesh=mesh, progress=True,
            checkpoint_dir=_ggn_ckpt_dir("txt"),
            checkpoint_every=ggn_checkpoint_every,
        )
        n_local = (len(embeddings_txt) // la_num_classes) * la_num_classes
        A_txt, B_txt = _global_factors(A_txt, B_txt, n_local)
        if ctx is None or ctx.is_primary:
            save_hessians(hessian_dir, A_txt, B_txt, "txt")

    print("Optimizing prior precision for image encoder...")
    lambda_img = float(
        optimize_prior_precision(
            image_encoder.projection_l2(), image_encoder.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=lambda_init_img, n=n_init_img,
            lr=lr, num_steps=num_steps,
        )
    )
    print("Optimizing prior precision for text encoder...")
    lambda_txt = float(
        optimize_prior_precision(
            text_encoder.projection_l2(), text_encoder.projection_num_params(),
            A=A_txt, B=B_txt, lmbda_init=lambda_init_txt, n=n_init_txt,
            lr=lr, num_steps=num_steps,
        )
    )
    if ctx is None or ctx.is_primary:
        save_prior_precision(
            hessian_dir, lambda_img, n_init_img, lambda_txt, n_init_txt
        )
        if save_orbax:
            # production lane: one sharded orbax pytree alongside the .pt
            # contract files (either lane readable; artifacts.load_hessians
            # falls back to it when the .pt files are absent)
            from bayesvlm_tpu.io.orbax_ckpt import save_hessians_orbax

            save_hessians_orbax(hessian_dir, A_img, B_img, A_txt, B_txt)
    print(json.dumps({"lambda_img": lambda_img, "lambda_txt": lambda_txt}))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="tpu")  # kept for CLI parity
    parser.add_argument("--dataset", type=str, default="laion400m")
    parser.add_argument("--model", type=str, default="clip-base")
    parser.add_argument("--precompute_batch_size", type=int, default=10)
    parser.add_argument("--la_num_classes", type=int, default=32768)
    parser.add_argument(
        "--la_batch_size", type=int, default=2048,
        help="GGN source-axis block size. Results are block-size invariant; "
        "the reference defaults to 5 to bound its [B,D,D] per-sample "
        "intermediates, which this GEMM reformulation does not have, so "
        "the default here is sized for the [block, C] logits buffer.")
    parser.add_argument(
        "--num_workers", type=int, default=8,
        help="Decode parallelism. >=2 on the PIL lane activates forked "
        "decode worker processes (round-robin tar assignment): sample "
        "order is deterministic but differs from num_workers<2, and "
        "drop_last applies PER WORKER (up to num_workers*(batch_size-1) "
        "fewer samples than a global drop_last). With --native_decode "
        "this is the C++ decoder thread count instead.")
    parser.add_argument("--hessian_dir", type=str, default="hessians/custom-hessian-clip-base")
    parser.add_argument("--num_files", type=int, default=60)
    parser.add_argument("--max_datapoints", type=int, default=327680)
    parser.add_argument(
        "--siglip_chunk_size", type=int, default=8000,
        help="SigLIP GGN target-axis chunk (bounds the [block, N] logits "
        "buffers; ref:bayesvlm/hessians.py:98-115). Results are invariant.")
    parser.add_argument("--lambda_init_txt", type=float, default=400)
    parser.add_argument("--lambda_init_img", type=float, default=800)
    parser.add_argument("--n_init_txt", type=float, default=1.0)
    parser.add_argument("--n_init_img", type=float, default=1.0)
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--num_steps", type=int, default=300)
    # TPU-specific extras
    parser.add_argument("--weights_dir", type=str, default=None,
                        help="local HF snapshot dir with converted weights")
    parser.add_argument("--tokenizer_dir", type=str, default=None)
    parser.add_argument("--no_mesh", action="store_true")
    parser.add_argument(
        "--dist_global_batch", action="store_true",
        help="multi-host: gather all hosts' features and shard the "
        "contrastive class batches over the GLOBAL mesh (exact global "
        "batch composition; psum over ICI/DCN) instead of per-host "
        "batches + factor reduction")
    parser.add_argument(
        "--ggn_precision", type=str, default="highest",
        choices=["highest", "high"],
        help="GGN matmul precision: 'highest'=fp32 (parity default); "
        "'high'=bf16x3 (1.6x faster, 1.7e-5 max rel err vs fp64)")
    parser.add_argument(
        "--mlp_int8", action="store_true",
        help="W8A8 int8 vision-tower MLPs for the feature pass "
        "(~x1.2 img/s; GGN math stays fp32 — factor parity tested at "
        "rtol 5e-3, BASELINE.md). Approximate; off = parity default")
    parser.add_argument(
        "--native_decode", action="store_true",
        help="opt into the native C++ batched JPEG decode lane (bilinear "
        "resampling vs the default PIL bicubic; delta in BASELINE.md)")
    parser.add_argument(
        "--save_orbax", action="store_true",
        help="additionally write the K-FAC factors as an orbax checkpoint "
        "(<hessian_dir>/factors_orbax) — the TPU-native sharded/async "
        "artifact lane; .pt files remain the reference-parity contract")
    parser.add_argument(
        "--feature_checkpoint_every", type=int, default=256,
        help="write the feature cache in atomic part files every N batches "
        "so a preempted pass resumes without re-encoding (0 disables; "
        "the reference only gates on the whole end-of-pass artifact)")
    parser.add_argument(
        "--ggn_checkpoint_every", type=int, default=1,
        help="checkpoint the running GGN partial sums every N class "
        "batches (orbax step checkpoints under <hessian_dir>/_ggn_steps_*; "
        "a killed run resumes bit-identically; 0 disables; single-host)")
    parser.add_argument(
        "--u8_pipeline", action="store_true",
        help="ship raw uint8 crops to the device and normalize in-graph "
        "(4x less host->device traffic; numerically equivalent up to "
        "fp32 op order — see BASELINE.md stage-1 section)")
    args = parser.parse_args()

    if getattr(args, "device", None):
        from bayesvlm_tpu.utils import apply_device_flag

        apply_device_flag(args.device)

    main(
        dataset=args.dataset,
        model_str=args.model,
        precompute_batch_size=args.precompute_batch_size,
        la_num_classes=args.la_num_classes,
        la_batch_size=args.la_batch_size,
        num_workers=args.num_workers,
        hessian_dir=args.hessian_dir,
        num_files=args.num_files,
        max_datapoints=args.max_datapoints,
        siglip_chunk_size_j=args.siglip_chunk_size,
        lambda_init_txt=args.lambda_init_txt,
        lambda_init_img=args.lambda_init_img,
        n_init_txt=args.n_init_txt,
        n_init_img=args.n_init_img,
        lr=args.lr,
        num_steps=args.num_steps,
        weights_dir=args.weights_dir,
        tokenizer_dir=args.tokenizer_dir,
        use_mesh=not args.no_mesh,
        native_decode=args.native_decode,
        ggn_precision=args.ggn_precision,
        dist_global_batch=args.dist_global_batch,
        u8_pipeline=args.u8_pipeline,
        mlp_int8=args.mlp_int8,
        save_orbax=args.save_orbax,
        feature_checkpoint_every=args.feature_checkpoint_every,
        ggn_checkpoint_every=args.ggn_checkpoint_every,
    )
