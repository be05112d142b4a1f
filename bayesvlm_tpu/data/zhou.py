"""SuS-X / CoOp "zhou split" JSON datasets: EuroSAT, SUN397, UCF101,
OxfordPets, CUB (ref:bayesvlm/data/{eurosat,sun397,ucf101,oxfordpets,cub}.py
— all five share the same 188-line shape).

Split file format: {"train": [[rel_path, class_id, class_name], ...],
"val": [...], "test": [...]}. Few-shot sampling mirrors the reference's
per-class np.random.choice with a reset seed per class
(ref:eurosat.py:41-58). Unlike the reference, images load lazily instead of
being preloaded into RAM (ref:eurosat.py:17-23) — the threaded loader hides
decode latency and RAM stays bounded."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List

import numpy as np
from PIL import Image

from bayesvlm_tpu.data.base import DataModule


def _label_names_from_split_info(split_info) -> List[str]:
    idx_to_classname = {x[1]: x[2] for x in split_info}
    return [idx_to_classname[x] for x in sorted(idx_to_classname.keys())]


class _ZhouDataset:
    def __init__(self, image_dir, split_info, text_prompt, transform,
                 use_few_shot=False, shots_per_class=5, few_shot_sample_seed=0):
        self._image_dir = Path(image_dir)
        self._split_info = list(split_info)
        self._label_names = _label_names_from_split_info(self._split_info)
        self._text_prompt = text_prompt
        self._transform = transform

        if use_few_shot:
            class_index = defaultdict(list)
            for i, item in enumerate(self._split_info):
                class_index[item[1]].append(i)
            selected = []
            for indices in class_index.values():
                # reference quirk: seed reset before every class draw
                # (ref:bayesvlm/data/eurosat.py:53-56)
                np.random.seed(few_shot_sample_seed)
                selected.extend(
                    np.random.choice(indices, shots_per_class, replace=False)
                )
            self._split_info = [self._split_info[int(i)] for i in selected]

    def __len__(self):
        return len(self._split_info)

    def __getitem__(self, idx):
        rel_path, class_id, class_name = self._split_info[int(idx)]
        img = Image.open(self._image_dir / rel_path)
        if self._transform is not None:
            img = self._transform(img)
        return dict(
            image=img,
            text=self._text_prompt.format(class_name=class_name),
            class_id=int(class_id),
            image_id=int(idx),
        )


class ZhouSplitDataModule(DataModule):
    SPLIT_FILE = ""        # e.g. split_zhou_EuroSAT.json
    IMAGE_SUBDIR = ""      # images root relative to data_dir

    def setup(self):
        with open(self.data_dir / self.SPLIT_FILE) as f:
            split = json.load(f)
        image_dir = self.data_dir / self.IMAGE_SUBDIR

        self.class_names = _label_names_from_split_info(
            split["train"] + split["val"] + split["test"]
        )

        self.train_dataset = _ZhouDataset(
            image_dir, split["train"], self.text_prompt, self.train_transform,
            use_few_shot=self.use_few_shot,
            shots_per_class=self.shots_per_class,
            few_shot_sample_seed=self.few_shot_sample_seed,
        )
        if self.subset_indices is not None:
            base = self.train_dataset
            idx = [int(i) for i in self.subset_indices]

            class _Subset:
                def __len__(self_inner):
                    return len(idx)

                def __getitem__(self_inner, i):
                    return base[idx[int(i)]]

            self.train_dataset = _Subset()
        self.val_dataset = _ZhouDataset(
            image_dir, split["val"], self.text_prompt, self.test_transform
        )
        self.test_dataset = _ZhouDataset(
            image_dir, split["test"], self.text_prompt, self.test_transform
        )

    @property
    def class_prompts(self):
        return [self.text_prompt.format(class_name=n) for n in self.class_names]


class EuroSATDataModule(ZhouSplitDataModule):
    DATASET_SUBDIR = "eurosat"
    SPLIT_FILE = "split_zhou_EuroSAT.json"
    IMAGE_SUBDIR = "2750"


class Sun397DataModule(ZhouSplitDataModule):
    DATASET_SUBDIR = "sun397"
    SPLIT_FILE = "split_zhou_SUN397.json"
    IMAGE_SUBDIR = "SUN397"


class UCF101DataModule(ZhouSplitDataModule):
    DATASET_SUBDIR = "ucf101"
    SPLIT_FILE = "split_zhou_UCF101.json"
    IMAGE_SUBDIR = "UCF-101-midframes"


class OxfordpetsDataModule(ZhouSplitDataModule):
    DATASET_SUBDIR = "oxfordpets"
    SPLIT_FILE = "split_zhou_OxfordPets.json"
    IMAGE_SUBDIR = "images"


class CUBDataModule(ZhouSplitDataModule):
    DATASET_SUBDIR = "cub"
    SPLIT_FILE = "split_CUB.json"
    IMAGE_SUBDIR = "images"
