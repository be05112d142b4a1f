"""Batched probabilistic predictions over cached features
(ref:bayesvlm/precompute.py:18-65).

The whole image set vs. the full class-prompt set runs as fixed-shape jitted
batches of the Smith forward; optional `.pt` caching matches the reference's
`logits_mean.pt` / `logits_var.pt` contract.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.io.torch_compat import load_pt_array, save_pt_array
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.types import EncoderResult, ProbabilisticLogits


def make_predictions(
    head: ProbabilisticHead,
    image_outputs: EncoderResult,
    text_outputs: EncoderResult,
    batch_size: int = 2048,
    save_predictions: bool = False,
    map_estimate: bool = False,
    cache_dir: Optional[Path] = None,
) -> ProbabilisticLogits:
    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        mean_path = cache_dir / "logits_mean.pt"
        var_path = cache_dir / "logits_var.pt"
        if mean_path.exists() and var_path.exists():
            return ProbabilisticLogits(
                mean=jnp.asarray(load_pt_array(mean_path)),
                var=jnp.asarray(load_pt_array(var_path)),
            )

    N = len(image_outputs)
    means, vars_ = [], []
    for start in range(0, N, batch_size):
        n = min(batch_size, N - start)
        if n < batch_size and start > 0:
            # pad to keep the jit signature fixed; trim after
            idx = np.concatenate(
                [np.arange(start, start + n), np.full(batch_size - n, start)]
            )
            batch = image_outputs[jnp.asarray(idx)]
        else:
            batch = image_outputs[start : start + n] if n == batch_size else image_outputs[start:]
        logits = head(batch, text_outputs, map_estimate=map_estimate)
        means.append(np.asarray(logits.mean[:n]))
        vars_.append(np.asarray(logits.var[:n]))

    mean = np.concatenate(means, axis=0)
    var = np.concatenate(vars_, axis=0)

    if cache_dir is not None and save_predictions:
        cache_dir.mkdir(parents=True, exist_ok=True)
        save_pt_array(mean, mean_path)
        save_pt_array(var, var_path)

    return ProbabilisticLogits(mean=jnp.asarray(mean), var=jnp.asarray(var))


def make_predictions_sharded(
    head: ProbabilisticHead,
    image_outputs: EncoderResult,
    text_outputs: EncoderResult,
    mesh,
    axis: str = "data",
) -> ProbabilisticLogits:
    """SPMD probabilistic predictions: batch-shard the image features over
    the mesh's data axis (text replicated); XLA runs the Smith forward on
    every chip in parallel with zero collectives (output stays sharded
    until gathered). No reference counterpart (single-device upstream)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    N = len(image_outputs)
    pad = (-N) % n_dev

    def _prep(x):
        x = np.asarray(x)
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return jax.device_put(x, NamedSharding(mesh, P(axis, None)))

    import jax

    embeds = _prep(image_outputs.embeds)
    acts = _prep(image_outputs.activations)
    rep = NamedSharding(mesh, P())
    t_embeds = jax.device_put(np.asarray(text_outputs.embeds), rep)
    t_acts = jax.device_put(np.asarray(text_outputs.activations), rep)

    from bayesvlm_tpu.probforward.smith import _smith_forward

    mean, var = _smith_forward(
        embeds, acts, t_embeds, t_acts,
        head.source_covariance.A_inv,
        jnp.diagonal(head.source_covariance.B_inv),
        head.target_covariance.A_inv,
        jnp.diagonal(head.target_covariance.B_inv),
        head.logit_scale,
        head.source_projection_has_bias,
        head.target_projection_has_bias,
    )
    return ProbabilisticLogits(mean=mean[:N], var=var[:N])
