"""LAION-400M webdataset module (ref:bayesvlm/data/laion400m.py) — the
pretraining-data source for Hessian estimation. jpg+txt caption pairs,
image_id = int(__key__), drop_last batches, no labels."""

from __future__ import annotations

from pathlib import Path

from bayesvlm_tpu.data.base import DataModule
from bayesvlm_tpu.data.wds import IterableLoader, WebDataset, decode_image


class Laion400mDataModule(DataModule):
    DATASET_SUBDIR = "laion400m"

    def __init__(self, *args, **kwargs):
        if kwargs.pop("use_few_shot", False):
            raise ValueError("Few shot not supported for this dataset")
        kwargs.pop("shots_per_class", None)
        kwargs.pop("few_shot_sample_seed", None)
        super().__init__(*args, **kwargs)
        if self.subset_indices is not None:
            raise ValueError("Subset indices are not supported for this dataset")
        tarfiles = sorted(Path(self.data_dir).glob("*.tar"))
        self.data_path = [str(t) for t in tarfiles]

    def _preprocess(self, item):
        image = decode_image(item["jpg"])
        out = dict(
            image=self.train_transform(image) if self.train_transform else image,
            text=item["txt"].decode("utf-8"),
            image_id=int(item["__key__"]),
        )
        return out

    def setup(self):
        self.dataset = WebDataset(
            self.data_path,
            shuffle_buffer=1000 if self.shuffle_train else 0,
            map_fn=self._preprocess,
        )
        self.class_names = []

    def shard_for_host(self, host_id: int, num_hosts: int):
        """Per-host tar assignment for multi-host runs (SURVEY §5)."""
        self.dataset = self.dataset.shard_slice(host_id, num_hosts)

    def train_dataloader(self):
        return IterableLoader(self.dataset, self.batch_size, drop_last=True)

    def val_dataloader(self):
        return self.train_dataloader()

    def test_dataloader(self):
        return self.train_dataloader()

    @property
    def class_prompts(self):
        return []
