"""REAL 2-process TP x DP test (round-4 VERDICT #5a: the gloo integration
tests were DP-only; TP equality previously lived on a single-process CPU
mesh).

Spawns TWO coordinated jax processes (gloo CPU collectives, 4 virtual
devices each) over a global ('data', 'model') = (2, 4) mesh: tensor
parallelism spans each process's own 4 devices (the ICI analog) and data
parallelism crosses the process boundary (the DCN analog) — the layout a
real multi-host slice would use. Each process feeds its own batch half via
jax.make_array_from_process_local_data; the tower weights carry the
Megatron TP NamedShardings (dist/tp.py) and GSPMD inserts the gloo
collectives. The full train step (forward + K-FAC factors + projection
SGD step) is then checked against a single-process dense replay of the
same global batch.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = "localhost:{port}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(pid)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from bayesvlm_tpu.dist.init import initialize_distributed
ctx = initialize_distributed()
assert ctx.num_hosts == 2 and ctx.num_devices == 8, (
    ctx.num_hosts, ctx.num_devices)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from bayesvlm_tpu.dist.mesh import make_mesh
from bayesvlm_tpu.dist.tp import shard_tower_params
from bayesvlm_tpu.models import load_model
from bayesvlm_tpu.bayes.hessians import (
    _assemble_factor, _infonce_block_stats, _l2_normalize)

# process-major device order: row p = process p's 4 local devices, so
# 'model' (TP) collectives stay process-local and 'data' (DP) crosses
# the process boundary
mesh = make_mesh(jax.devices(), axis_names=("data", "model"), shape=(2, 4))
img_enc, _, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
module, params = img_enc.module, img_enc.params
cfg = img_enc.config
params_tp = shard_tower_params(params, mesh)

B_global, C = 8, 8
rng = np.random.default_rng(0)
pixels_g = rng.normal(size=(
    B_global, cfg.vision.image_size, cfg.vision.image_size, 3)
).astype(np.float32)
labels_g = rng.integers(0, C, size=(B_global,)).astype(np.int32)
text_embeds = rng.normal(size=(C, cfg.vision.projection_dim)).astype(
    np.float32)

half = B_global // 2
lo, hi = pid * half, (pid + 1) * half
px = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None, None, None)), pixels_g[lo:hi])
lb = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), labels_g[lo:hi])
tx = jax.device_put(jnp.asarray(text_embeds), NamedSharding(mesh, P()))
lr = jnp.float32(1e-3)


def tp_step(p, px, lb, tx, scale):
    embeds, activations = module.apply({{"params": p}}, px)
    Y, _ = _l2_normalize(tx)
    w, G = _infonce_block_stats(embeds, Y, scale)
    B_factor = _assemble_factor(w, G, Y)
    A_factor = activations.T @ activations

    def loss_fn(kernel):
        e = activations @ kernel
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        t = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        logits = e @ t.T * jnp.exp(scale)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, lb[:, None], axis=-1).mean()

    kernel = p["visual_projection"]["kernel"]
    loss, grad = jax.value_and_grad(loss_fn)(kernel)
    return A_factor, B_factor, kernel - lr * grad, loss


A2, B2, k2, loss2 = jax.jit(
    tp_step, out_shardings=NamedSharding(mesh, P())
)(params_tp, px, lb, tx, head.logit_scale)
jax.block_until_ready((A2, B2, k2, loss2))
if pid == 0:
    np.savez({out!r}, A=np.asarray(A2), B=np.asarray(B2),
             k=np.asarray(k2), loss=np.asarray(loss2))
print("TPWORKER", pid, "DONE", float(loss2))
"""


@pytest.mark.slow
def test_two_process_tp_dp_train_step(tmp_path):
    out = tmp_path / "tp_out.npz"
    worker = _WORKER.format(port=29415, repo=str(REPO), out=str(out))
    env = dict(os.environ, PYTHONHASHSEED="0")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for pid, (p, txt) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{txt[-3000:]}"
        assert f"TPWORKER {pid} DONE" in txt
    assert out.exists()

    # --- single-process dense replay of the same global step ---
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from bayesvlm_tpu.bayes.hessians import (
        _assemble_factor,
        _infonce_block_stats,
        _l2_normalize,
    )
    from bayesvlm_tpu.models import load_model

    img_enc, _, head = load_model("tiny-clip", dtype=jnp.float32, seed=0)
    module, params = img_enc.module, img_enc.params
    cfg = img_enc.config

    B_global, C = 8, 8
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(
        B_global, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, size=(B_global,)).astype(np.int32))
    tx = jnp.asarray(rng.normal(
        size=(C, cfg.vision.projection_dim)).astype(np.float32))

    embeds, activations = module.apply({"params": params}, pixels)
    Y, _ = _l2_normalize(tx)
    w, G = _infonce_block_stats(embeds, Y, head.logit_scale)
    B_exp = _assemble_factor(w, G, Y)
    A_exp = activations.T @ activations

    def loss_fn(kernel):
        e = activations @ kernel
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        t = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        logits = e @ t.T * jnp.exp(head.logit_scale)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

    kernel = params["visual_projection"]["kernel"]
    loss_exp, grad = jax.value_and_grad(loss_fn)(kernel)
    k_exp = kernel - 1e-3 * grad

    got = np.load(out)
    # GSPMD partial sums over gloo reassociate fp32: ~1e-4 agreement
    np.testing.assert_allclose(float(got["loss"]), float(loss_exp),
                               rtol=1e-4)
    np.testing.assert_allclose(got["A"], np.asarray(A_exp),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got["B"], np.asarray(B_exp),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got["k"], np.asarray(k_exp),
                               rtol=1e-3, atol=1e-5)
