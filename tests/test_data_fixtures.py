"""Dataset modules against synthetic on-disk fixtures: zhou-split JSON,
homeoffice folder trees, DTD label files, few-shot semantics."""

import json

import numpy as np
import pytest
from PIL import Image

from bayesvlm_tpu.data.folder import DTDDataModule
from bayesvlm_tpu.data.homeoffice import (
    HomeOfficeArtDataModule,
    HomeOfficeDAArtDataModule,
)
from bayesvlm_tpu.data.transforms import default_transform
from bayesvlm_tpu.data.zhou import EuroSATDataModule


def _img(path, color):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", (24, 24), color=color).save(path)


@pytest.fixture()
def eurosat_dir(tmp_path):
    root = tmp_path / "eurosat"
    split = {"train": [], "val": [], "test": []}
    classes = ["Forest", "River"]
    n = 0
    for ci, cls in enumerate(classes):
        for i in range(6):
            rel = f"2750/{cls}/{cls}_{i}.jpg"
            _img(root / rel, (ci * 100 + 20, i * 30, 0))
            rel_short = f"{cls}/{cls}_{i}.jpg"
            bucket = ["train", "train", "train", "train", "val", "test"][i]
            split[bucket].append([rel_short, ci, cls])
            n += 1
    with open(root / "split_zhou_EuroSAT.json", "w") as f:
        json.dump(split, f)
    return root


def test_eurosat_zhou_module(eurosat_dir):
    dm = EuroSATDataModule(
        data_dir=str(eurosat_dir), batch_size=4, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
    )
    dm.setup()
    assert dm.class_names == ["Forest", "River"]
    assert len(dm.train_dataset) == 8
    assert len(dm.val_dataset) == 2
    assert len(dm.test_dataset) == 2
    batch = next(iter(dm.train_dataloader()))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["text"][0].startswith("An image of a")


def test_eurosat_few_shot_seed_reset(eurosat_dir):
    dm = EuroSATDataModule(
        data_dir=str(eurosat_dir), batch_size=4, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
        use_few_shot=True, shots_per_class=2, few_shot_sample_seed=0,
    )
    dm.setup()
    assert len(dm.train_dataset) == 4  # 2 classes x 2 shots
    # reference quirk: seed reset per class -> same positions per class
    ids = [dm.train_dataset[i]["class_id"] for i in range(4)]
    assert sorted(ids) == [0, 0, 1, 1]


@pytest.fixture()
def homeoffice_dir(tmp_path):
    root = tmp_path / "homeoffice"
    for domain in ("Art", "Clipart", "Product", "Real World"):
        for cls in ("Bike", "Chair"):
            for i in range(5):
                _img(root / domain / cls / f"{i:05d}.jpg", (i * 40, 10, 10))
    return root


def test_homeoffice_splits(homeoffice_dir):
    dm = HomeOfficeArtDataModule(
        data_dir=str(homeoffice_dir), batch_size=4, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
    )
    dm.setup()
    assert dm.class_names == ["Bike", "Chair"]
    n = 10
    assert len(dm.test_dataset) == n - int(0.8 * n)
    assert len(dm.train_dataset) + len(dm.val_dataset) + len(dm.test_dataset) == n
    # seeded shuffle: setup is deterministic across instances
    dm2 = HomeOfficeArtDataModule(
        data_dir=str(homeoffice_dir), batch_size=4, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
    )
    dm2.setup()
    a = [dm.train_dataset[i]["class_id"] for i in range(len(dm.train_dataset))]
    b = [dm2.train_dataset[i]["class_id"] for i in range(len(dm2.train_dataset))]
    assert a == b


def test_homeoffice_da_concat_train(homeoffice_dir):
    dm = HomeOfficeDAArtDataModule(
        data_dir=str(homeoffice_dir), batch_size=4, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
    )
    dm.setup()
    assert len(dm.train_dataset) == 40  # all 4 domains
    assert len(dm.val_dataset) + len(dm.test_dataset) == 10  # target domain
    sample = dm.train_dataset[0]
    assert "image_path" in sample  # DA collate extra


def test_dtd_partition_files(tmp_path):
    root = tmp_path / "dtd" / "dtd"
    classes = ["banded", "dotted"]
    lines = {"train": [], "val": [], "test": []}
    for cls in classes:
        for i in range(3):
            rel = f"{cls}/{cls}_{i:04d}.jpg"
            _img(root / "images" / rel, (50, 60, 70))
            lines[["train", "val", "test"][i]].append(rel)
    for split, ls in lines.items():
        p = root / "labels" / f"{split}1.txt"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("\n".join(ls) + "\n")

    dm = DTDDataModule(
        data_dir=str(tmp_path / "dtd"), batch_size=2, num_workers=1,
        train_transform=default_transform(16), test_transform=default_transform(16),
    )
    dm.setup()
    assert dm.class_names == classes
    assert len(dm.train_dataset) == 2
    assert len(dm.test_dataset) == 2
    b = next(iter(dm.test_dataloader()))
    assert b["image"].shape == (2, 16, 16, 3)
    assert set(np.asarray(b["class_id"]).tolist()) == {0, 1}
