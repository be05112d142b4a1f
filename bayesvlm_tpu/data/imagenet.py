"""ImageNet-family datamodules (ref:bayesvlm/data/{imagenet_wds,
imagenet_1k,imagenet_r,imagenet_sketch,imagenet_da}.py).

- ImagenetWDSModule: validation tar shards (webdataset); labels from the
  `cls` member, names from a local wnid->name table (the reference pulls
  them from the HF dataset builder, ref:imagenet_wds.py:14-19; offline we
  read `imagenet_classes.json` from the data dir or fall back to wnids).
- Imagenet50/100: parquet shards filtered to a seeded class subset
  (ref:imagenet_1k.py:16-44) — pandas/pyarrow instead of dask.
- ImagenetR / ImagenetSketch / Imagenet-DA variants: folder trees with a
  wnid->words `classes.csv` mapping (ref:imagenet_da.py:15-26).
"""

from __future__ import annotations

import csv
import io
import json
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from bayesvlm_tpu.data.base import DataModule, ImageRecordDataset
from bayesvlm_tpu.data.wds import IterableLoader, WebDataset, decode_image

# 200 ImageNet-R wnids (public list, ref:imagenet_1k.py:241-246)
IMAGENET_R_WNIDS_FILE = "imagenet_r_wnids.txt"


def _load_label_names(data_dir: Path) -> Optional[List[str]]:
    """Load the 1000 imagenet class names from a local JSON (list of names
    ordered by class index). The reference fetches this via
    `load_dataset_builder("ILSVRC/imagenet-1k")` which needs network."""
    for candidate in (data_dir / "imagenet_classes.json",
                      data_dir.parent / "imagenet_classes.json"):
        if candidate.exists():
            with open(candidate) as f:
                return json.load(f)
    try:  # works when the HF builder metadata is cached locally
        from datasets import load_dataset_builder

        b = load_dataset_builder("ILSVRC/imagenet-1k")
        return list(b.info.features["label"].names)
    except Exception:
        return None


class ImagenetWDSModule(DataModule):
    DATASET_SUBDIR = "imagenet_val_wds"

    def __init__(self, *args, **kwargs):
        if kwargs.pop("use_few_shot", False):
            raise ValueError("Few shot not supported for this dataset")
        kwargs.pop("shots_per_class", None)
        kwargs.pop("few_shot_sample_seed", None)
        super().__init__(*args, **kwargs)
        if self.subset_indices is not None:
            raise ValueError("Subset indices are not supported for this dataset")
        self.data_path = sorted(str(p) for p in Path(self.data_dir).glob("*.tar"))

    def setup(self):
        names = _load_label_names(Path(self.data_dir))
        self.class_names = names if names is not None else [
            f"class_{i}" for i in range(1000)
        ]
        self._counter = 0

        def _preprocess(item):
            if "cls" not in item:
                # a missing label would otherwise default into
                # class_names[-1] (the LAST class's caption) — raise so
                # WebDataset's warn_and_continue skips the sample instead
                raise ValueError("missing 'cls' member (no label)")
            img = decode_image(item["jpg"] if "jpg" in item else item["jpeg"])
            label = int(item["cls"])
            self._counter += 1
            return dict(
                image=self.test_transform(img) if self.test_transform else img,
                text=self.text_prompt.format(class_name=self.class_names[label]),
                class_id=label,
                image_id=self._counter - 1,
            )

        wds = WebDataset(
            self.data_path,
            shuffle_buffer=1000 if self.shuffle_train else 0,
            map_fn=_preprocess,
        )
        module = self

        class _EpochStableIds:
            """Reset the image_id counter at each iteration start so the
            same sample keeps the same id across epochs (hessian CLIs
            iterate one loader twice: image pass, then text pass)."""

            def __iter__(self):
                module._counter = 0
                return iter(wds)

            def __getattr__(self, attr):
                return getattr(wds, attr)

        self.dataset = _EpochStableIds()

    def train_dataloader(self):
        return IterableLoader(self.dataset, self.batch_size, drop_last=False)

    val_dataloader = train_dataloader
    test_dataloader = train_dataloader


class _ImagenetParquetModule(DataModule):
    """Seeded class-subset parquet module (ref:imagenet_1k.py)."""

    DATASET_SUBDIR = "imagenet_1k"
    NUM_CLASSES = 100
    CLASSES_SEED = 0

    def setup(self):
        import pandas as pd

        names = _load_label_names(Path(self.data_dir))
        if names is None:
            raise FileNotFoundError(
                "imagenet_classes.json not found and HF builder metadata "
                "unavailable offline"
            )
        classes = np.array(names)
        np.random.seed(self.CLASSES_SEED)
        class_ids = np.sort(
            np.random.choice(np.arange(len(classes)), self.NUM_CLASSES, replace=False)
        )
        self.class_names = [str(c) for c in classes[class_ids]]
        id_map = {int(c): i for i, c in enumerate(class_ids)}

        trainval = pd.read_parquet(self.data_dir / "trainval.parquet")
        trainval = trainval[trainval.cls.isin(set(class_ids.tolist()))]
        n = len(trainval)
        df_train = trainval.iloc[: int(0.8 * n)]
        df_val = trainval.iloc[int(0.8 * n) :]
        test = pd.read_parquet(self.data_dir / "test.parquet")
        test = test[test.cls.isin(set(class_ids.tolist()))]

        def make_ds(df, transform):
            rows = df.to_dict("records")

            class _DS:
                def __len__(self_inner):
                    return len(rows)

                def __getitem__(self_inner, i):
                    row = rows[int(i)]
                    img = Image.open(io.BytesIO(row["jpg"]))
                    if transform is not None:
                        img = transform(img)
                    cid = id_map[int(row["cls"])]
                    return dict(
                        image=img,
                        text=self.text_prompt.format(class_name=self.class_names[cid]),
                        class_id=cid,
                        image_id=int(i),
                    )

            return _DS()

        self.train_dataset = make_ds(df_train, self.train_transform)
        self.val_dataset = make_ds(df_val, self.test_transform)
        self.test_dataset = make_ds(test, self.test_transform)


class Imagenet50DataModule(_ImagenetParquetModule):
    NUM_CLASSES = 50


class Imagenet100DataModule(_ImagenetParquetModule):
    NUM_CLASSES = 100


class _FolderTreeModule(DataModule):
    """wnid-folder tree + classes.csv wnid->words (ref:imagenet_da.py)."""

    SUBTREE = ""

    def _wnid_to_words(self) -> dict:
        path = self.data_dir / "classes.csv"
        out = {}
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) >= 2:
                    out[row[0]] = row[1]
        return out

    def setup(self):
        root = self.data_dir / self.SUBTREE if self.SUBTREE else self.data_dir
        words = self._wnid_to_words() if (self.data_dir / "classes.csv").exists() else {}
        wnids = sorted(d.name for d in root.iterdir() if d.is_dir())
        self.class_names = [words.get(w, w) for w in wnids]
        records = []
        for ci, wnid in enumerate(wnids):
            for p in sorted((root / wnid).iterdir()):
                if p.suffix.lower() in (".jpg", ".jpeg", ".png"):
                    records.append((p, ci, len(records)))

        from sklearn.model_selection import train_test_split

        idx = list(range(len(records)))
        idx_trainval, idx_test = train_test_split(idx, test_size=0.2, random_state=0)
        idx_train, idx_val = train_test_split(
            idx_trainval, test_size=0.2, random_state=0
        )
        mk = lambda ids, tf: ImageRecordDataset(
            [records[i] for i in ids], tf, self.text_prompt, self.class_names
        )
        self.train_dataset = mk(self._apply_subset_ids(idx_train), self.train_transform)
        self.val_dataset = mk(idx_val, self.test_transform)
        self.test_dataset = mk(idx_test, self.test_transform)

    def _apply_subset_ids(self, ids):
        if self.subset_indices is None:
            return ids
        return [ids[int(i)] for i in self.subset_indices]


class ImagenetRDataModule(_FolderTreeModule):
    DATASET_SUBDIR = "imagenet-r"
    SUBTREE = ""


class ImagenetDARenditionsDataModule(_FolderTreeModule):
    DATASET_SUBDIR = "imagenet_variations"
    SUBTREE = "renditions"


class ImagenetDASketchDataModule(_FolderTreeModule):
    DATASET_SUBDIR = "imagenet_variations"
    SUBTREE = "sketch"


class ImagenetSketchDataModule(DataModule):
    """HF songweig/imagenet_sketch (ref:imagenet_sketch.py)."""

    DATASET_SUBDIR = "imagenet_sketch"

    def setup(self):
        import datasets as hf_datasets

        ds = hf_datasets.load_dataset(
            "songweig/imagenet_sketch", cache_dir=str(self.data_dir)
        )["train"]
        names = ds.features["label"].names
        self.class_names = list(names)
        tp = self.text_prompt
        tf_train, tf_test = self.train_transform, self.test_transform
        from sklearn.model_selection import train_test_split

        idx = list(range(len(ds)))
        idx_trainval, idx_test = train_test_split(idx, test_size=0.2, random_state=0)
        idx_train, idx_val = train_test_split(idx_trainval, test_size=0.2, random_state=0)

        def make(ids, tf):
            class _DS:
                def __len__(self_inner):
                    return len(ids)

                def __getitem__(self_inner, i):
                    row = ds[int(ids[int(i)])]
                    img = row["image"]
                    if tf is not None:
                        img = tf(img)
                    return dict(
                        image=img,
                        text=tp.format(class_name=names[row["label"]]),
                        class_id=int(row["label"]),
                        image_id=int(ids[int(i)]),
                    )

            return _DS()

        self.train_dataset = make(idx_train, tf_train)
        self.val_dataset = make(idx_val, tf_test)
        self.test_dataset = make(idx_test, tf_test)
