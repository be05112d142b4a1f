"""wandb-compatible experiment logging, optional dependency.

The reference logs every fine-tune run to wandb
(ref:scripts/activelearning.py:109-123,179-223). wandb is not in this
image; this shim uses it when importable and otherwise appends JSONL to
`<dir>/metrics.jsonl` with the same keys, so downstream tooling keeps
working either way.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional


class ExperimentLogger:
    def __init__(self, project: str, run_dir, name: Optional[str] = None,
                 config: Optional[dict] = None, use_wandb: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, dir=str(self.run_dir), reinit=True
                )
                if config:
                    wandb.config.update(config)
                if name:
                    wandb.run.name = name
            except Exception:
                self._wandb = None
        self._file = open(self.run_dir / "metrics.jsonl", "a")
        if config:
            self._file.write(json.dumps({"_config": config, "_name": name}) + "\n")

    def log(self, metrics: dict, step: int):
        payload = {k: _to_py(v) for k, v in metrics.items()}
        if self._wandb is not None:
            import wandb

            wandb.log(payload, step=step)
        payload["_step"] = step
        self._file.write(json.dumps(payload) + "\n")
        self._file.flush()

    def finish(self):
        if self._wandb is not None:
            import wandb

            wandb.finish()
        self._file.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
