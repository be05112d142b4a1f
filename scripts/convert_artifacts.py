#!/usr/bin/env python
"""Convert a Hessian artifact directory between the reference ``.pt``
lane and the TPU-native orbax lane — the CLI face of
``bayesvlm_tpu.io.orbax_ckpt.{hessians_to_orbax,orbax_to_hessians}``.

The reference persists K-FAC factors only as ``torch.save`` files
(ref:bayesvlm/hessians.py:137-167,203-217); this repo keeps that contract
byte-compatible (io/torch_compat.py) and adds the orbax lane for
production runs (sharded saves, restore-with-sharding —
io/orbax_ckpt.py). This script moves a directory either way:

  # .pt dir (reference layout) -> add factors_orbax/ alongside
  python scripts/convert_artifacts.py --la_dir hessians/hessian_X --to orbax

  # orbax dir -> (re)write the reference .pt interchange files
  python scripts/convert_artifacts.py --la_dir runs/hessian_X --to pt

  # write to a separate directory (prior-precision JSON copied too)
  python scripts/convert_artifacts.py --la_dir A --to orbax --out B

Both conversions are lossless fp32; ``artifacts.load_hessians`` reads
either layout transparently (falls back to factors_orbax/ when the .pt
files are absent).
"""

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(la_dir: str, to: str, out: str = None) -> Path:
    from bayesvlm_tpu.utils import apply_device_flag

    apply_device_flag("cpu")  # pure IO — never claim the accelerator

    from bayesvlm_tpu.io.orbax_ckpt import hessians_to_orbax, orbax_to_hessians

    if to == "orbax":
        dest = hessians_to_orbax(la_dir, out)
    else:
        dest = orbax_to_hessians(la_dir, out)
    print(f"wrote {to} artifacts: {dest}")
    return dest


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument(
        "--la_dir", required=True,
        help="source artifact directory (reference .pt layout for --to "
        "orbax; an orbax factors_orbax/ layout for --to pt)")
    parser.add_argument(
        "--to", required=True, choices=("orbax", "pt"),
        help="target lane")
    parser.add_argument(
        "--out", default=None,
        help="optional destination directory (default: convert in place, "
        "both lanes readable side by side)")
    args = parser.parse_args()
    main(args.la_dir, args.to, args.out)
