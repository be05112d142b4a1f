"""Dataset registry + factory (ref:bayesvlm/data/factory.py).

Same names as the reference's SUPPORTED_MODULES (ref:factory.py:52-88);
`DATA_BASE_DIR` env var (with optional `.env` file, parsed without the
python-dotenv dependency) joined with each module's DATASET_SUBDIR
(ref:factory.py:116-127). Adds a `synthetic` module for tests/benchmarks.
"""

from __future__ import annotations

import os
from pathlib import Path

from bayesvlm_tpu.data.cifar100 import CIFAR100DataModule
from bayesvlm_tpu.data.folder import (
    DTDDataModule,
    Flowers102DataModule,
    Food101DataModule,
    StanfordCarsDataModule,
)
from bayesvlm_tpu.data.homeoffice import (
    HomeOfficeArtDataModule,
    HomeOfficeClipartDataModule,
    HomeOfficeDAArtDataModule,
    HomeOfficeDAClipartDataModule,
    HomeOfficeDAProductDataModule,
    HomeOfficeDARealWorldDataModule,
    HomeOfficeProductDataModule,
    HomeOfficeRealWorldDataModule,
)
from bayesvlm_tpu.data.imagenet import (
    Imagenet50DataModule,
    Imagenet100DataModule,
    ImagenetDARenditionsDataModule,
    ImagenetDASketchDataModule,
    ImagenetRDataModule,
    ImagenetSketchDataModule,
    ImagenetWDSModule,
)
from bayesvlm_tpu.data.laion400m import Laion400mDataModule
from bayesvlm_tpu.data.synthetic import SyntheticDataModule
from bayesvlm_tpu.data.transforms import default_transform
from bayesvlm_tpu.data.zhou import (
    CUBDataModule,
    EuroSATDataModule,
    OxfordpetsDataModule,
    Sun397DataModule,
    UCF101DataModule,
)

SUPPORTED_MODULES = {
    "laion400m": Laion400mDataModule,
    # downstream datasets
    "flowers102": Flowers102DataModule,
    "food101": Food101DataModule,
    "eurosat": EuroSATDataModule,
    "cifar100": CIFAR100DataModule,
    "stanfordcars": StanfordCarsDataModule,
    "dtd": DTDDataModule,
    "sun397": Sun397DataModule,
    "oxfordpets": OxfordpetsDataModule,
    "ucf101": UCF101DataModule,
    "cub": CUBDataModule,
    # homeoffice
    "homeoffice-art": HomeOfficeArtDataModule,
    "homeoffice-clipart": HomeOfficeClipartDataModule,
    "homeoffice-product": HomeOfficeProductDataModule,
    "homeoffice-realworld": HomeOfficeRealWorldDataModule,
    "homeoffice-da-art": HomeOfficeDAArtDataModule,
    "homeoffice-da-clipart": HomeOfficeDAClipartDataModule,
    "homeoffice-da-product": HomeOfficeDAProductDataModule,
    "homeoffice-da-realworld": HomeOfficeDARealWorldDataModule,
    # imagenet
    "imagenet-val-wds": ImagenetWDSModule,
    "imagenet-100": Imagenet100DataModule,
    "imagenet-50": Imagenet50DataModule,
    "imagenet-r": ImagenetRDataModule,
    "imagenet-sketch": ImagenetSketchDataModule,
    "imagenet-da-r": ImagenetDARenditionsDataModule,
    "imagenet-da-sketch": ImagenetDASketchDataModule,
    # testing / benchmarking (no reference counterpart)
    "synthetic": SyntheticDataModule,
}


def _load_dotenv():
    """Parse a .env file in cwd (python-dotenv replacement,
    ref:factory.py:117-118)."""
    env_path = Path(".env")
    if not env_path.exists():
        return
    for line in env_path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        os.environ.setdefault(k.strip(), v.strip().strip('"').strip("'"))


class DataModuleFactory:
    def __init__(
        self,
        batch_size: int = 32,
        num_workers: int = 4,
        text_prompt: str = "An image of a {class_name}",
        train_transform=None,
        test_transform=None,
        shuffle_train: bool = True,
        base_path: str = None,
        shots_per_class: int = 10,
        use_few_shot: bool = False,
        few_shot_sample_seed: int = 42,
        subset_indices=None,
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.text_prompt = text_prompt
        self.train_transform = (
            train_transform if train_transform is not None else default_transform(224)
        )
        self.test_transform = (
            test_transform if test_transform is not None else default_transform(224)
        )
        self.shuffle_train = shuffle_train
        self.base_path = base_path
        self.shots_per_class = shots_per_class
        self.use_few_shot = use_few_shot
        self.few_shot_sample_seed = few_shot_sample_seed
        self.subset_indices = subset_indices

    def create(self, name: str, **overrides):
        if name not in SUPPORTED_MODULES:
            raise ValueError(
                f"Unknown dataset '{name}'. Supported: {sorted(SUPPORTED_MODULES)}"
            )
        cls = SUPPORTED_MODULES[name]

        _load_dotenv()
        base = self.base_path or os.environ.get("DATA_BASE_DIR", "")
        data_dir = Path(base) / cls.DATASET_SUBDIR if base else Path(cls.DATASET_SUBDIR)

        kwargs = dict(
            data_dir=str(data_dir),
            batch_size=self.batch_size,
            num_workers=self.num_workers,
            text_prompt=self.text_prompt,
            train_transform=self.train_transform,
            test_transform=self.test_transform,
            shuffle_train=self.shuffle_train,
            subset_indices=self.subset_indices,
            shots_per_class=self.shots_per_class,
            use_few_shot=self.use_few_shot,
            few_shot_sample_seed=self.few_shot_sample_seed,
        )
        kwargs.update(overrides)
        return cls(**kwargs)
