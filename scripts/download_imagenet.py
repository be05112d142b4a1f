#!/usr/bin/env python
"""Download the ImageNet-1k validation webdataset tars from the HF Hub
(ref:scripts/download_imagenet.py). Requires network access; in air-gapped
deployments place the tars in $DATA_BASE_DIR/imagenet_val_wds manually."""

import argparse
import os

DATASET_REPO = "timm/imagenet-1k-wds"
SPLIT_PATTERN = "**/*-validation-*.tar"


def main(download_dir: str):
    from huggingface_hub import HfFileSystem, hf_hub_download

    fs = HfFileSystem()
    files = [
        fs.resolve_path(path)
        for path in fs.glob(f"hf://datasets/{DATASET_REPO}/{SPLIT_PATTERN}")
    ]
    os.makedirs(download_dir, exist_ok=True)
    for i, file in enumerate(files):
        print(f"[{i + 1}/{len(files)}] {file.path_in_repo}")
        hf_hub_download(
            repo_id=file.repo_id,
            filename=file.path_in_repo,
            repo_type="dataset",
            local_dir=download_dir,
        )
    print(f"All {len(files)} validation tar files downloaded to '{download_dir}'")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--download_dir", type=str, required=True)
    args = parser.parse_args()
    main(args.download_dir)
