"""Early-stopping semantics of train/finetune.py: checkpoint selection
uses <= (ties keep the later epoch, ref:scripts/activelearning.py:211),
but patience must only reset on STRICT improvement
(ref:scripts/activelearning_kmeans.py:416) — an exactly-repeating val
loss plateau has to trigger early stopping, not refresh it forever."""

import jax.numpy as jnp
import numpy as np

from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.probforward.smith import ProbabilisticHead
from bayesvlm_tpu.train.finetune import finetune_projection
from bayesvlm_tpu.types import EncoderResult


class _CountingLogger:
    def __init__(self):
        self.max_step = 0

    def log(self, metrics, step):
        self.max_step = max(self.max_step, step)


def _tiny_setup(P=6, D=4, C=3, N=12, seed=0):
    rng = np.random.default_rng(seed)

    def er(n):
        return EncoderResult.create(
            embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
            activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32),
        )

    def spd(d):
        M = rng.normal(size=(d, d)).astype(np.float32)
        return jnp.asarray(M @ M.T / d * 0.1 + np.eye(d, dtype=np.float32))

    cov = KroneckerFactorizedCovariance(A_inv=spd(P), B_inv=spd(D))
    head = ProbabilisticHead.create(
        logit_scale=1.0, source_covariance=cov, target_covariance=cov)
    proj = {"kernel": jnp.asarray(rng.normal(size=(P, D)) * 0.2, jnp.float32)}
    labels = jnp.asarray(rng.integers(0, C, size=(N,)), jnp.int32)
    return head, proj, er, labels, C, N


def test_plateau_triggers_early_stopping():
    head, proj, er, labels, C, N = _tiny_setup()
    feats, text = er(N), er(C)
    logger = _CountingLogger()
    # lr=0: every epoch leaves the projection (and so the val loss)
    # EXACTLY unchanged — the plateau case
    finetune_projection(
        proj, dict(proj), head, feats, labels, feats, labels, feats,
        labels, text, lr=0.0, wd=0.0, epochs=50, batch_size=8,
        num_classes=C, logger=logger, early_stopping_patience=3,
    )
    # epoch 1 strictly improves over inf; epochs 2-4 tie -> patience 3
    # exhausts at epoch 4. Before the fix this ran all 50 epochs.
    assert logger.max_step == 4


def test_patience_none_runs_all_epochs():
    head, proj, er, labels, C, N = _tiny_setup(seed=1)
    feats, text = er(N), er(C)
    logger = _CountingLogger()
    finetune_projection(
        proj, dict(proj), head, feats, labels, feats, labels, feats,
        labels, text, lr=0.0, wd=0.0, epochs=5, batch_size=8,
        num_classes=C, logger=logger, early_stopping_patience=None,
    )
    assert logger.max_step == 5
