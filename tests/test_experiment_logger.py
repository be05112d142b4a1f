"""ExperimentLogger's wandb-absent JSONL lane (train/logging.py) — the
same keys the reference sends to wandb (ref:scripts/activelearning.py:
109-123,179-223) land in <run_dir>/metrics.jsonl."""

import json

import jax.numpy as jnp

from bayesvlm_tpu.train.logging import ExperimentLogger, _to_py


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_jsonl_lane(tmp_path):
    run_dir = tmp_path / "run"
    logger = ExperimentLogger(
        "proj", run_dir, name="r1", config={"lr": 1e-3}, use_wandb=False)
    logger.log({"loss": jnp.asarray(0.5), "acc": 0.25}, step=0)
    logger.log({"loss": jnp.asarray(0.25), "note": "warmup"}, step=1)
    logger.finish()

    rows = _read_jsonl(run_dir / "metrics.jsonl")
    assert rows[0] == {"_config": {"lr": 1e-3}, "_name": "r1"}
    assert rows[1] == {"loss": 0.5, "acc": 0.25, "_step": 0}
    # non-numeric values pass through unchanged
    assert rows[2] == {"loss": 0.25, "note": "warmup", "_step": 1}


def test_append_on_resume(tmp_path):
    run_dir = tmp_path / "run"
    for step in range(2):
        logger = ExperimentLogger("proj", run_dir, use_wandb=False)
        logger.log({"v": step}, step=step)
        logger.finish()
    rows = _read_jsonl(run_dir / "metrics.jsonl")
    assert [r["_step"] for r in rows] == [0, 1]


def test_to_py_scalars():
    assert _to_py(jnp.asarray(2.0)) == 2.0
    assert _to_py("text") == "text"
    assert _to_py(None) is None
