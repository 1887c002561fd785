"""Deprecated DatasetLoader shim (parity with
mmf/common/dataset_loader.py:9-78): kept so old user code importing
``DatasetLoader`` keeps working; it is a thin wrapper over
MultiDataModule, which is the supported API."""

from __future__ import annotations

import warnings


class DatasetLoader:
    def __init__(self, config):
        warnings.warn(
            "DatasetLoader is deprecated; use "
            "mmf_tpu.datasets.multi_datamodule.MultiDataModule",
            DeprecationWarning,
        )
        self.config = config
        self._datamodule = None

    def load_datasets(self):
        from mmf_tpu.datasets.multi_datamodule import MultiDataModule

        self._datamodule = MultiDataModule(self.config)

    @property
    def train_dataset(self):
        return getattr(self._datamodule, "train_dataset", None)

    @property
    def val_dataset(self):
        return getattr(self._datamodule, "val_dataset", None)

    @property
    def test_dataset(self):
        return getattr(self._datamodule, "test_dataset", None)

    def train_dataloader(self):
        return self._datamodule.train_dataloader()

    def val_dataloader(self):
        return self._datamodule.val_dataloader()

    def test_dataloader(self):
        return self._datamodule.test_dataloader()

    def get_test_reporter(self, dataset_type):
        return self._datamodule.get_test_reporter(dataset_type)

    def update_registry_for_model(self, config):
        if hasattr(self._datamodule, "update_registry_for_model"):
            self._datamodule.update_registry_for_model(config)

    def prepare_batch(self, batch, *args, **kwargs):
        return self._datamodule.prepare_batch(batch)
