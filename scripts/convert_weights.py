#!/usr/bin/env python
"""Convert a local HF checkpoint snapshot into this framework's parameter
cache (msgpack via flax.serialization) for fast offline loading.

Usage:
  python scripts/convert_weights.py --model clip-base \
      --snapshot /path/to/hf/snapshot --out weights/clip-base
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(model_str: str, snapshot: str, out: str):
    import numpy as np
    from flax import serialization

    from bayesvlm_tpu.models.configs import CONFIGS_BY_NAME
    from bayesvlm_tpu.models.convert import (
        _load_state_dict,
        convert_from_snapshot,
        load_logit_scale_bias,
    )

    config = CONFIGS_BY_NAME[model_str]
    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)

    for tower, num_layers in (
        ("vision", config.vision.num_layers),
        ("text", config.text.num_layers),
    ):
        params = convert_from_snapshot(snapshot, config.family, tower, num_layers)
        blob = serialization.msgpack_serialize(params)
        # tmp + atomic rename: an interrupted run must never leave a
        # truncated artifact that later loads half-read (preflight's
        # skip-guard trusts existing files)
        tmp = out_dir / f".{tower}.msgpack.tmp"
        tmp.write_bytes(blob)
        os.replace(tmp, out_dir / f"{tower}.msgpack")
        n = sum(p.size for p in _flatten(params))
        print(f"{tower}: {n / 1e6:.1f}M params -> {out_dir / f'{tower}.msgpack'}")

    scale, bias = load_logit_scale_bias(_load_state_dict(Path(snapshot)))
    tmp = out_dir / ".head.json.tmp"
    tmp.write_text(
        __import__("json").dumps({"logit_scale": scale, "logit_bias": bias})
    )
    os.replace(tmp, out_dir / "head.json")
    print(f"head: scale={scale} bias={bias}")


def _flatten(tree):
    import numpy as np

    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flatten(v)
    else:
        yield np.asarray(tree)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--snapshot", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    main(args.model, args.snapshot, args.out)
