"""Projection-layer fine-tuning on cached features
(ref:scripts/activelearning.py:33-225).

Everything operates on precomputed activations/residuals — no encoder in
the loop. The train step (CE on deterministic logits between the updated
image embeds and the fixed text embeds, ref:activelearning.py:195-205) is
one jitted optax AdamW step; evaluation uses the probabilistic forward and
reports accuracy / weighted accuracy / ECE / mean CE loss
(ref:activelearning.py:33-73). Best checkpoint = lowest val loss.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesvlm_tpu.inference.metrics import expected_calibration_error
from bayesvlm_tpu.probforward.smith import ProbabilisticHead, _smith_forward
from bayesvlm_tpu.types import EncoderResult

Array = jax.Array


def _project(proj: Dict, activations: Array, residuals: Array) -> Array:
    e = activations @ proj["kernel"]
    if "bias" in proj:
        e = e + proj["bias"]
    return e + residuals


@partial(jax.jit, static_argnames=("has_bias",))
def _eval_batch(
    proj: Dict,
    activations: Array,
    residuals: Array,
    text_embeds: Array,
    text_activations: Array,
    src_A_inv: Array,
    src_B_diag: Array,
    tgt_A_inv: Array,
    tgt_B_diag: Array,
    logit_scale: Array,
    has_bias: bool,
):
    embeds = _project(proj, activations, residuals)
    mean, var = _smith_forward(
        embeds, activations, text_embeds, text_activations,
        src_A_inv, src_B_diag, tgt_A_inv, tgt_B_diag,
        logit_scale, has_bias, has_bias,
    )
    return mean, var


def evaluate_projection(
    proj: Dict,
    head: ProbabilisticHead,
    features: EncoderResult,
    labels: Array,
    text_features: EncoderResult,
    num_classes: int,
    batch_size: int = 4096,
) -> dict:
    """ref:scripts/activelearning.py:33-73."""
    N = len(features)
    means, labels_np = [], np.asarray(labels)
    loss = 0.0
    for s in range(0, N, batch_size):
        sl = slice(s, min(s + batch_size, N))
        mean, _ = _eval_batch(
            proj,
            features.activations[sl], features.residuals[sl],
            text_features.embeds, text_features.activations,
            head.source_covariance.A_inv, jnp.diagonal(head.source_covariance.B_inv),
            head.target_covariance.A_inv, jnp.diagonal(head.target_covariance.B_inv),
            head.logit_scale, head.source_projection_has_bias,
        )
        lbl = jnp.asarray(labels_np[sl.start : sl.stop])
        logp = jax.nn.log_softmax(mean, axis=-1)
        loss += float(-jnp.take_along_axis(logp, lbl[:, None], axis=-1).sum())
        means.append(np.asarray(mean))
    mean_all = np.concatenate(means, axis=0)

    pred = mean_all.argmax(-1)
    acc = float((pred == labels_np).mean())
    # weighted accuracy = mean of per-class recalls (torchmetrics 'weighted'
    # with balanced support reduces to this; ref:activelearning.py:65)
    accs = []
    for c in range(num_classes):
        mask = labels_np == c
        if mask.any():
            accs.append(float((pred[mask] == c).mean()) * mask.sum())
    acc_weighted = float(np.sum(accs) / len(labels_np)) if accs else 0.0

    probs = jax.nn.softmax(jnp.asarray(mean_all), axis=-1)
    ece = float(expected_calibration_error(probs, jnp.asarray(labels_np), n_bins=15))
    return dict(
        accuracy=acc,
        accuracy_weighted=acc_weighted,
        ece=ece,
        loss=loss / N,
    )


def finetune_projection(
    img_proj: Dict,
    txt_proj: Dict,
    head: ProbabilisticHead,
    train_features: EncoderResult,
    labels_train: Array,
    val_features: EncoderResult,
    labels_val: Array,
    test_features: EncoderResult,
    labels_test: Array,
    text_features: EncoderResult,
    lr: float,
    wd: float,
    epochs: int,
    batch_size: int,
    num_classes: int,
    logger=None,
    seed: int = 0,
    early_stopping_patience: Optional[int] = None,
) -> Tuple[Dict, dict]:
    """AdamW fine-tune of the image projection; returns (best projection,
    best test metrics). ref:scripts/activelearning.py:76-225.
    `early_stopping_patience` stops after that many epochs without val-loss
    improvement (ref:scripts/activelearning_kmeans.py:367, patience 15)."""
    has_bias = head.source_projection_has_bias
    text_embeds_fixed = _project(
        txt_proj, text_features.activations, jnp.zeros_like(text_features.embeds)
    )

    opt = optax.adamw(learning_rate=lr, weight_decay=wd)
    opt_state = opt.init(img_proj)
    logit_scale = head.logit_scale
    logit_bias = head.logit_bias

    @jax.jit
    def train_step(proj, opt_state, activations, residuals, lbls):
        def loss_fn(p):
            embeds = _project(p, activations, residuals)
            e = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
            t = text_embeds_fixed / jnp.linalg.norm(
                text_embeds_fixed, axis=-1, keepdims=True
            )
            logits = e @ t.T * jnp.exp(logit_scale) + logit_bias
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(logp, lbls[:, None], axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(proj)
        updates, opt_state = opt.update(grads, opt_state, proj)
        return optax.apply_updates(proj, updates), opt_state, loss

    N = len(train_features)
    rng = np.random.default_rng(seed)
    acts = np.asarray(train_features.activations)
    res = np.asarray(train_features.residuals)
    lbls = np.asarray(labels_train)

    def _eval_all(p):
        return (
            evaluate_projection(p, head, train_features, labels_train,
                                text_features, num_classes),
            evaluate_projection(p, head, val_features, labels_val,
                                text_features, num_classes),
            evaluate_projection(p, head, test_features, labels_test,
                                text_features, num_classes),
        )

    train_m, val_m, test_m = _eval_all(img_proj)
    if logger:
        logger.log({f"train_{k}": v for k, v in train_m.items()}, step=0)
        logger.log({f"val_{k}": v for k, v in val_m.items()}, step=0)
        logger.log({f"test_{k}": v for k, v in test_m.items()}, step=0)

    best_val_loss = float("inf")
    best_proj, best_test_m, best_val_m = img_proj, test_m, val_m
    epochs_without_improvement = 0

    for epoch in range(epochs):
        order = rng.permutation(N)
        losses = []
        # fixed-shape batches: drop ragged tail into a padded final batch
        for s in range(0, N, batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            img_proj, opt_state, loss = train_step(
                img_proj, opt_state,
                jnp.asarray(acts[idx]), jnp.asarray(res[idx]), jnp.asarray(lbls[idx]),
            )
            losses.append(float(loss))

        train_m, val_m, test_m = _eval_all(img_proj)
        # checkpoint selection uses <= (ties keep the LATER epoch —
        # ref:scripts/activelearning.py:211), but patience only resets on
        # STRICT improvement (ref:scripts/activelearning_kmeans.py:416):
        # a plateau of exactly-repeating val losses must still trigger
        # early stopping, not refresh it forever
        improved_strictly = val_m["loss"] < best_val_loss
        if val_m["loss"] <= best_val_loss:
            best_val_loss = val_m["loss"]
            best_proj, best_test_m, best_val_m = img_proj, test_m, val_m
        if improved_strictly:
            epochs_without_improvement = 0
        else:
            epochs_without_improvement += 1
        if logger:
            logger.log({f"train_{k}": v for k, v in train_m.items()}, step=epoch + 1)
            logger.log({f"val_{k}": v for k, v in val_m.items()}, step=epoch + 1)
            logger.log({f"test_{k}": v for k, v in test_m.items()}, step=epoch + 1)
            logger.log(
                {f"best_test_{k}": v for k, v in best_test_m.items()}, step=epoch + 1
            )
            logger.log(
                {f"best_val_{k}": v for k, v in best_val_m.items()}, step=epoch + 1
            )
        if (
            early_stopping_patience is not None
            and epochs_without_improvement >= early_stopping_patience
        ):
            print(f"Early stopping at epoch {epoch + 1}")
            break

    return best_proj, best_test_m
