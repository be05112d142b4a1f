"""Shared setup for the active-learning drivers (the common prefix of
ref:scripts/activelearning{,_kmeans,_elg,_llm}.py: features, Hessians,
lambda re-opt, covariances, predictions)."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import numpy as np


@dataclasses.dataclass
class ALContext:
    dm: Any
    image_encoder: Any
    text_encoder: Any
    head: Any
    image_outputs_train: Any
    class_ids_train: Any
    image_ids_train: Any
    image_outputs_val: Any
    class_ids_val: Any
    image_outputs_test: Any
    class_ids_test: Any
    image_ids_test: Any
    label_outputs: Any
    A_img: Any
    B_img: Any
    A_txt: Any
    B_txt: Any
    covar_info: dict
    run_dir: Path
    dist_ctx: Any = None  # DistContext when launched multi-process

    @property
    def is_primary(self) -> bool:
        return self.dist_ctx is None or self.dist_ctx.is_primary


def _stripe_batches(loader, host_id: int, num_hosts: int):
    """Yield only this host's sample stripe (global_idx % num_hosts ==
    host_id) from a deterministic loader — the map-style-dataset analogue
    of Stage-1's per-host tar sharding. Striping (vs contiguous split)
    needs no dataset length up front and reassembles with a fixed
    interleave (_gather_striped)."""
    consumed = 0
    for batch in loader:
        images = np.asarray(batch["image"])
        n = images.shape[0]
        sel = (np.arange(consumed, consumed + n) % num_hosts) == host_id
        consumed += n
        if not sel.any():
            continue
        yield {
            "image": images[sel],
            "class_id": np.asarray(batch["class_id"]).reshape(-1)[sel],
            "image_id": np.asarray(batch["image_id"]).reshape(-1)[sel],
        }


def _gather_striped(arr, dist_ctx):
    """Allgather per-host stripe rows and restore the original dataset
    order (stripe h holds samples h, h+H, h+2H, ...)."""
    from bayesvlm_tpu.dist.init import allgather_rows

    gathered, counts = allgather_rows(
        np.asarray(arr), dist_ctx.num_hosts, return_counts=True)
    H = dist_ctx.num_hosts
    out = np.empty_like(gathered)
    off = 0
    for h in range(H):
        c = int(counts[h])
        out[h::H] = gathered[off:off + c]
        off += c
    return out


def setup_context(
    model_str: str,
    dataset: str,
    hessian_dir: str,
    experiment_dir: str,
    hessian_scale: float,
    precompute_batch_size: int,
    precompute_num_workers: int,
    weights_dir=None,
    tokenizer_dir=None,
    mlp_int8: bool = False,
    dist_ctx=None,
) -> ALContext:
    """``dist_ctx`` (a DistContext from initialize_distributed) switches
    the feature precompute to multi-process mode: each process encodes its
    sample stripe over its LOCAL device mesh, the feature rows are
    allgathered and re-interleaved into dataset order, and everything
    downstream (selection, fine-tune) runs replicated — identical on all
    processes because the gathered inputs are; only the primary writes
    artifacts (no reference counterpart, SURVEY §2.7)."""
    from bayesvlm_tpu.bayes.kfac import compute_covariances
    from bayesvlm_tpu.bayes.prior import optimize_prior_precision
    from bayesvlm_tpu.data.factory import DataModuleFactory
    from bayesvlm_tpu.data.tokenizer import HashTokenizer, HFTokenizer
    from bayesvlm_tpu.data.transforms import get_transform
    from bayesvlm_tpu.inference.precompute import (
        precompute_image_features,
        precompute_text_features,
    )
    from bayesvlm_tpu.io.artifacts import load_hessians
    from bayesvlm_tpu.models import load_model
    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.utils import get_image_size

    run_dir = Path(experiment_dir) / dataset
    run_dir.mkdir(parents=True, exist_ok=True)

    config = CONFIGS_BY_NAME[model_str]
    transform = get_transform(config.family, get_image_size(model_str))

    dm = DataModuleFactory(
        batch_size=precompute_batch_size,
        num_workers=precompute_num_workers,
        shuffle_train=False,
        train_transform=transform,
        test_transform=transform,
    ).create(dataset)
    dm.setup()

    image_encoder, text_encoder, head = load_model(
        model_str, weights_dir=weights_dir, mlp_int8=mlp_int8)
    # pre-cast GEMM weights to the bf16 compute dtype (bit-identical to
    # the per-forward on-device convert it replaces; see cast_gemm_params)
    from bayesvlm_tpu.models.encoders import cast_gemm_params

    image_encoder = dataclasses.replace(
        image_encoder,
        params=cast_gemm_params(image_encoder.params))
    text_encoder = dataclasses.replace(
        text_encoder,
        params=cast_gemm_params(text_encoder.params))
    import jax

    multi_host = dist_ctx is not None and dist_ctx.num_hosts > 1
    if multi_host:
        # host-local mesh: each process feeds its own stripe; a global
        # mesh would need globally-coordinated per-batch input feeding
        if len(jax.local_devices()) > 1:
            image_encoder = image_encoder.with_mesh(dist_ctx.local_mesh)
    elif len(jax.devices()) > 1:
        # batch-sharded feature precompute over the data mesh (same as
        # the Stage-2 CLI; GSPMD equivalence tested)
        from bayesvlm_tpu.dist.mesh import default_mesh

        image_encoder = image_encoder.with_mesh(default_mesh())
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

    print("[1] Precomputing features ...")
    if multi_host:
        import jax.numpy as jnp

        from bayesvlm_tpu.types import EncoderResult

        h, H = dist_ctx.host_id, dist_ctx.num_hosts
        print(f"[dist] host {h}/{H} encodes its sample stripe "
              f"({len(jax.local_devices())} local devices)")

        def _pre(loader, name):
            er, cids, iids = precompute_image_features(
                image_encoder, _stripe_batches(loader, h, H),
                cache_dir=run_dir / "base" / f"{name}_host{h}",
                save_predictions=True,
            )
            er_g = EncoderResult(
                embeds=jnp.asarray(_gather_striped(er.embeds, dist_ctx)),
                activations=jnp.asarray(
                    _gather_striped(er.activations, dist_ctx)),
                residuals=jnp.asarray(
                    _gather_striped(er.residuals, dist_ctx)),
            )
            return (
                er_g,
                jnp.asarray(_gather_striped(cids, dist_ctx)),
                jnp.asarray(_gather_striped(iids, dist_ctx)),
            )

        image_outputs_train, class_ids_train, image_ids_train = _pre(
            dm.train_dataloader(), "train")
        image_outputs_val, class_ids_val, _ = _pre(
            dm.val_dataloader(), "val")
        image_outputs_test, class_ids_test, image_ids_test = _pre(
            dm.test_dataloader(), "test")
        # class prompts are tiny: every host encodes them identically
        label_outputs = precompute_text_features(
            text_encoder, dm.class_prompts, batch_size=precompute_batch_size,
            cache_dir=run_dir / "base" / f"txt_host{h}", save_predictions=True,
        )
    else:
        image_outputs_train, class_ids_train, image_ids_train = precompute_image_features(
            image_encoder, dm.train_dataloader(),
            cache_dir=run_dir / "base" / "train", save_predictions=True,
        )
        image_outputs_val, class_ids_val, _ = precompute_image_features(
            image_encoder, dm.val_dataloader(),
            cache_dir=run_dir / "base" / "val", save_predictions=True,
        )
        image_outputs_test, class_ids_test, image_ids_test = precompute_image_features(
            image_encoder, dm.test_dataloader(),
            cache_dir=run_dir / "base" / "test", save_predictions=True,
        )
        label_outputs = precompute_text_features(
            text_encoder, dm.class_prompts, batch_size=precompute_batch_size,
            cache_dir=run_dir / "base", save_predictions=True,
        )

    A_img, B_img = load_hessians(hessian_dir, tag="img")
    A_txt, B_txt, info = load_hessians(hessian_dir, tag="txt", return_info=True)

    lambda_img = float(
        optimize_prior_precision(
            image_encoder.projection_l2(), image_encoder.projection_num_params(),
            A=A_img, B=B_img, lmbda_init=info["lambda_img"], n=hessian_scale,
            lr=1e-2, num_steps=500,
        )
    )
    lambda_txt = float(
        optimize_prior_precision(
            text_encoder.projection_l2(), text_encoder.projection_num_params(),
            A=A_txt, B=B_txt, lmbda_init=info["lambda_txt"], n=hessian_scale,
            lr=1e-2, num_steps=500,
        )
    )
    covar_info = dict(
        lambda_img=lambda_img, lambda_txt=lambda_txt,
        n_img=hessian_scale, n_txt=hessian_scale,
    )
    cov_img, cov_txt = compute_covariances(A_img, B_img, A_txt, B_txt, covar_info)
    head = head.set_covariances(cov_img, cov_txt)

    return ALContext(
        dm=dm, image_encoder=image_encoder, text_encoder=text_encoder, head=head,
        image_outputs_train=image_outputs_train, class_ids_train=class_ids_train,
        image_ids_train=image_ids_train,
        image_outputs_val=image_outputs_val, class_ids_val=class_ids_val,
        image_outputs_test=image_outputs_test, class_ids_test=class_ids_test,
        image_ids_test=image_ids_test,
        label_outputs=label_outputs,
        A_img=A_img, B_img=B_img, A_txt=A_txt, B_txt=B_txt,
        covar_info=covar_info, run_dir=run_dir, dist_ctx=dist_ctx,
    )


def finetune_all_subsets(
    ctx: ALContext,
    subset_indices_train: dict,
    subset_dir: Path,
    project_name: str,
    dataset: str,
    finetune_lr: float,
    finetune_wd: float,
    finetune_epochs: int,
    finetune_batch_size: int,
    config: Optional[dict] = None,
    early_stopping_patience: Optional[int] = None,
) -> dict:
    """Fine-tune the image projection per strategy subset; writes
    `img_projection.pt` checkpoints (skip-if-exists resume like
    ref:activelearning_kmeans.py:424)."""
    import copy

    import jax.numpy as jnp

    from bayesvlm_tpu.io.torch_compat import save_pt_state_dict
    from bayesvlm_tpu.select.knn import extract_test_train_indices
    from bayesvlm_tpu.train.finetune import finetune_projection
    from bayesvlm_tpu.train.logging import ExperimentLogger

    results = {}
    for subset, indices_dict in subset_indices_train.items():
        print(f"    - Fine-tuning on subset {subset} ...")
        finetune_dir = subset_dir / subset
        finetune_dir.mkdir(parents=True, exist_ok=True)
        checkpoint_path = finetune_dir / "img_projection.pt"
        if checkpoint_path.exists():
            # skip-if-exists resume (ref:activelearning_kmeans.py:424)
            print(f"      checkpoint exists, skipping: {checkpoint_path}")
            continue

        indices = extract_test_train_indices(indices_dict)["train"]
        masked_features = ctx.image_outputs_train[jnp.asarray(indices)]
        masked_class_ids = ctx.class_ids_train[jnp.asarray(indices)]

        img_proj = copy.deepcopy(dict(ctx.image_encoder.projection_tree()))
        txt_proj = dict(ctx.text_encoder.projection_tree())

        # multi-process: replicas train identically (same gathered inputs/
        # seeds) but log to a replica subdir and never write checkpoints
        logger_dir = finetune_dir if ctx.is_primary else (
            finetune_dir / f"_replica_host{ctx.dist_ctx.host_id}")
        logger = ExperimentLogger(
            project_name, logger_dir,
            name=f"{finetune_dir.parent.name}/{finetune_dir.name}",
            config=dict(
                lr=finetune_lr, wd=finetune_wd, epochs=finetune_epochs,
                batch_size=finetune_batch_size, selection=subset,
                dataset=dataset, **(config or {}),
            ),
        )
        try:
            best_proj, best_test_m = finetune_projection(
                img_proj, txt_proj, ctx.head,
                masked_features, masked_class_ids,
                ctx.image_outputs_val, ctx.class_ids_val,
                ctx.image_outputs_test, ctx.class_ids_test,
                ctx.label_outputs,
                lr=finetune_lr, wd=finetune_wd, epochs=finetune_epochs,
                batch_size=finetune_batch_size,
                num_classes=len(ctx.dm.class_prompts),
                logger=logger,
                early_stopping_patience=early_stopping_patience,
            )
        finally:
            logger.finish()
        # full state_dict incl. the SigLIP projection bias — the
        # reference's torch.save(img_projection.state_dict()) contract
        # (ref:scripts/activelearning.py:657-660)
        state = {
            "weight": np.ascontiguousarray(np.asarray(best_proj["kernel"]).T)
        }
        if best_proj.get("bias") is not None:
            state["bias"] = np.asarray(best_proj["bias"])
        if ctx.is_primary:
            save_pt_state_dict(state, checkpoint_path)
        results[subset] = best_test_m
        print(f"      best test metrics: {best_test_m}")
    return results
