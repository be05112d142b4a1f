"""REAL 2-process evidence for the sharded selection layer: two
coordinated jax processes (gloo, 4 virtual devices each) run EPIG
scoring and kNN retrieval with mesh="auto". resolve_auto_mesh must pick
the LOCAL 4-device mesh (a global multi-controller mesh would make the
host fetches crash on non-addressable arrays), both processes must
agree with each other, and the result must match a dense
single-process reference."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys, json
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
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from bayesvlm_tpu.dist.mesh import resolve_auto_mesh
mesh = resolve_auto_mesh("auto")
assert mesh is not None and mesh.devices.size == 4, mesh  # LOCAL mesh

from bayesvlm_tpu.select.epig import epig_from_probs_sharded
from bayesvlm_tpu.select.knn import find_similar_samples_cosine
from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
from bayesvlm_tpu.types import EncoderResult

rng = np.random.default_rng(7)
pool = jnp.asarray(jax.nn.softmax(
    jnp.asarray(rng.normal(size=(37, 6, 5)).astype(np.float32)), -1))
targ = jnp.asarray(jax.nn.softmax(
    jnp.asarray(rng.normal(size=(11, 6, 5)).astype(np.float32)), -1))
epig = np.asarray(epig_from_probs_sharded(pool, targ, mesh,
                                          use_pallas=False))

n_train, n_test, D, P = 64, 6, 8, 6
mk = lambda n: EncoderResult.create(
    embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
    activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32))
train, test = mk(n_train), mk(n_test)
M = rng.normal(size=(P, P)).astype(np.float32)
cov = KroneckerFactorizedCovariance(
    A_inv=jnp.asarray(M @ M.T / P + np.eye(P, dtype=np.float32)),
    B_inv=jnp.diag(jnp.asarray(
        np.abs(rng.normal(size=D)).astype(np.float32) + 0.1)))
knn = find_similar_samples_cosine(
    train, test, np.arange(n_test), np.zeros(n_test, np.float32),
    k_nearest=3, source_covariance=cov, buffersize=4, mesh="auto")
knn_ids = {{int(t): d["indices"] for t, d in knn.items()}}

json.dump(dict(epig=epig.tolist(), knn=knn_ids),
          open({out!r} + f".{{pid}}.json", "w"))
print("WORKER", pid, "DONE")
"""


@pytest.mark.slow
def test_two_process_sharded_selection(tmp_path):
    out = str(tmp_path / "sel")
    worker = _WORKER.format(port=29417, repo=str(REPO), out=out)
    env = dict(os.environ, PYTHONHASHSEED="0")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o[-3000:]}"
        assert f"WORKER {pid} DONE" in o

    r0 = json.load(open(out + ".0.json"))
    r1 = json.load(open(out + ".1.json"))
    # replicated selection math must agree bit-for-bit across processes
    np.testing.assert_array_equal(np.asarray(r0["epig"]),
                                  np.asarray(r1["epig"]))
    assert r0["knn"] == r1["knn"]

    # dense single-process reference (same seeds)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bayesvlm_tpu.bayes.kfac import KroneckerFactorizedCovariance
    from bayesvlm_tpu.select.epig import epig_from_probs_using_matmul
    from bayesvlm_tpu.select.knn import find_similar_samples_cosine
    from bayesvlm_tpu.types import EncoderResult

    rng = np.random.default_rng(7)
    pool = jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(37, 6, 5)).astype(np.float32)), -1))
    targ = jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(11, 6, 5)).astype(np.float32)), -1))
    epig_ref = np.asarray(
        epig_from_probs_using_matmul(pool, targ, use_pallas=False))
    np.testing.assert_allclose(np.asarray(r0["epig"]), epig_ref,
                               rtol=1e-6, atol=1e-6)

    n_train, n_test, D, P = 64, 6, 8, 6
    mk = lambda n: EncoderResult.create(
        embeds=jnp.asarray(rng.normal(size=(n, D)), jnp.float32),
        activations=jnp.asarray(rng.normal(size=(n, P)), jnp.float32))
    train, test = mk(n_train), mk(n_test)
    M = rng.normal(size=(P, P)).astype(np.float32)
    cov = KroneckerFactorizedCovariance(
        A_inv=jnp.asarray(M @ M.T / P + np.eye(P, dtype=np.float32)),
        B_inv=jnp.diag(jnp.asarray(
            np.abs(rng.normal(size=D)).astype(np.float32) + 0.1)))
    knn_ref = find_similar_samples_cosine(
        train, test, np.arange(n_test), np.zeros(n_test, np.float32),
        k_nearest=3, source_covariance=cov, buffersize=4, mesh=None)
    ref_ids = {str(int(t)): d["indices"] for t, d in knn_ref.items()}
    assert r0["knn"] == ref_ids
