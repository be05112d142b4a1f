"""LAION-400M webdataset module (ref:bayesvlm/data/laion400m.py) — the
pretraining-data source for Hessian estimation. jpg+txt caption pairs,
image_id = int(__key__), drop_last batches, no labels."""

from __future__ import annotations

from pathlib import Path

from bayesvlm_tpu.data.base import DataModule
from bayesvlm_tpu.data.wds import (
    IterableLoader,
    NativeDecodeLoader,
    WebDataset,
    decode_image,
)


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

    def enable_native_decode(
        self, image_size: int, family: str = "clip", num_threads: int = 8,
        out_uint8: bool = False,
    ):
        """Opt into the native (C++) batched JPEG decode lane.

        Bilinear resampling (PIL bicubic remains the default pipeline);
        the measured embedding delta is recorded in BASELINE.md. Raises
        if native/libbvt_io.so is not built. `out_uint8` ships raw uint8
        crops and normalizes in-graph (4x less H2D traffic).
        """
        from bayesvlm_tpu.data import native_io
        from bayesvlm_tpu.data.transforms import (
            DEFAULT_MEAN,
            DEFAULT_STD,
            IMAGENET_STANDARD_MEAN,
            IMAGENET_STANDARD_STD,
        )

        if not native_io.available():
            raise RuntimeError(
                "native decode requested but native/libbvt_io.so is not "
                "built (run `make -C native`)"
            )
        if family == "siglip":
            params = dict(mean=IMAGENET_STANDARD_MEAN,
                          std=IMAGENET_STANDARD_STD, square_resize=True)
        else:
            params = dict(mean=DEFAULT_MEAN, std=DEFAULT_STD,
                          square_resize=False)
        self._native_decode = dict(
            image_size=image_size, num_threads=num_threads,
            out_uint8=out_uint8, **params
        )

    def train_dataloader(self):
        from bayesvlm_tpu.data.prefetch import ParallelPILLoader, PrefetchLoader

        native = getattr(self, "_native_decode", None)
        if native is not None:
            raw = WebDataset(
                self.dataset.tar_paths,
                shuffle_buffer=self.dataset.shuffle_buffer,
                seed=self.dataset.seed,
                map_fn=None,
                use_native=self.dataset.use_native,
            )
            # background thread overlaps the (GIL-releasing) C++ decode
            # with device compute: serialized 1/(1/feed+1/chip) -> min()
            return PrefetchLoader(
                NativeDecodeLoader(raw, self.batch_size, drop_last=True,
                                   **native),
                depth=2,
            )
        if self.num_workers and self.num_workers >= 2 \
                and len(self.dataset.tar_paths) >= 2:
            # the reference's DataLoader(num_workers=N) analogue: decode
            # worker processes over round-robin tar assignment (order is
            # deterministic but differs from num_workers=0, as there)
            ds = self.dataset

            def make_iter(tars):
                return iter(WebDataset(
                    tars, shuffle_buffer=ds.shuffle_buffer, seed=ds.seed,
                    map_fn=ds.map_fn, use_native=ds.use_native,
                ))

            return ParallelPILLoader(
                ds.tar_paths, make_iter, self.batch_size,
                num_workers=self.num_workers, drop_last=True,
            )
        return PrefetchLoader(
            IterableLoader(self.dataset, self.batch_size, drop_last=True),
            depth=2,
        )

    def val_dataloader(self):
        return self.train_dataloader()

    def test_dataloader(self):
        return self.train_dataloader()

    @property
    def class_prompts(self):
        return []
