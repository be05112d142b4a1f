"""REAL multi-process orbax checkpoint test.

The orbax lane (io/orbax_ckpt.py) claims multi-host semantics: every host
writes its own addressable shards, restore lands arrays already laid out
on the global mesh. The single-process suite can't witness that — this
test spawns TWO coordinated jax processes (gloo CPU collectives, 4
virtual devices each = one 8-device global 'data' mesh), saves a
globally-sharded pytree where each process holds only half the rows,
restores it sharded in both processes, and finally re-reads the same
checkpoint from THIS (single-process) interpreter to prove the artifact
is topology-independent.

Companion to tests/test_multiprocess_dist.py (same worker recipe); the
reference has no distributed persistence at all (SURVEY §2.7 — torch.save
of host tensors only, ref:bayesvlm/hessians.py:137-167).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_SHAPE = (16, 6)

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
out = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = "localhost:{port}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(pid)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bayesvlm_tpu.dist.init import initialize_distributed
from bayesvlm_tpu.io import orbax_ckpt as oc

ctx = initialize_distributed()
assert ctx.num_hosts == 2 and ctx.num_devices == 8, (ctx.num_hosts, ctx.num_devices)

sharding = NamedSharding(ctx.mesh, P("data", None))
shape = {shape!r}
global_data = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
arr = jax.make_array_from_callback(shape, sharding, lambda idx: global_data[idx])
# each process holds only its local devices' rows
n_local = sum(s.data.shape[0] for s in arr.addressable_shards)
assert n_local == shape[0] // 2, n_local

tree = {{"A": arr, "step": 3}}
oc.save_pytree(out + "/ckpt", tree)

# sharded restore: arrays land already distributed on the global mesh
restored = oc.load_pytree(out + "/ckpt", shardings=sharding)
assert int(restored["step"]) == 3
r = restored["A"]
assert r.shape == shape and str(r.dtype) == "float32", (r.shape, r.dtype)
for s in r.addressable_shards:
    np.testing.assert_array_equal(np.asarray(s.data), global_data[s.index])

# restore-with-`like` against the live sharded array (train-state recipe)
restored2 = oc.load_pytree(out + "/ckpt", like=tree)
for s in restored2["A"].addressable_shards:
    np.testing.assert_array_equal(np.asarray(s.data), global_data[s.index])

print("WORKER", pid, "ORBAX OK")
"""


@pytest.mark.slow
def test_two_process_sharded_save_restore(tmp_path):
    out = tmp_path / "mp_orbax"
    out.mkdir()
    worker = _WORKER.format(port=29415, repo=str(REPO), shape=_SHAPE)
    env = dict(os.environ, PYTHONHASHSEED="0")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid), str(out)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for pid, (p, txt) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{txt[-3000:]}"
        assert f"WORKER {pid} ORBAX OK" in txt

    # the artifact is topology-independent: this single-process interpreter
    # (different device count, no distributed client) reads it back whole
    from bayesvlm_tpu.io import orbax_ckpt as oc

    tree = oc.load_pytree(out / "ckpt")
    global_data = np.arange(np.prod(_SHAPE), dtype=np.float32).reshape(_SHAPE)
    np.testing.assert_array_equal(np.asarray(tree["A"]), global_data)
    assert int(tree["step"]) == 3
