"""BaseDataset (parity with mmf/datasets/base_dataset.py).

A map-style dataset producing ``Sample``s of fixed-shape numpy arrays.
``init_processors`` instantiates configured processors onto the dataset
and registers ``{dataset}_{processor}`` into the registry for cross-layer
access (the M4C pattern: models read answer processors from the registry).
"""

from __future__ import annotations

from typing import Any, Dict

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import SampleList


class BaseDataset:
    def __init__(self, dataset_name: str, config: Dict[str, Any] = None,
                 dataset_type: str = "train"):
        self.config = config or {}
        self._dataset_name = dataset_name
        self._dataset_type = dataset_type
        self._global_config = registry.get("config", no_warning=True)

    def load_item(self, idx: int):
        raise NotImplementedError

    def __getitem__(self, idx: int):
        return self.load_item(idx)

    def init_processors(self):
        if "processors" not in self.config:
            return
        from mmf_tpu.datasets.processors.processors import Processor

        extra_params = {"data_dir": self.config.get("data_dir", None)}
        reg_key = f"{self._dataset_name}_{{}}"
        for processor_key, processor_params in self.config["processors"].items():
            if processor_params is None:
                continue
            full_key = reg_key.format(processor_key)
            processor_instance = registry.get(full_key, no_warning=True)
            if processor_instance is None:
                processor_instance = Processor(processor_params, **extra_params)
                registry.register(full_key, processor_instance)
            setattr(self, processor_key, processor_instance)

    def prepare_batch(self, batch: SampleList) -> SampleList:
        """Stamp identity; device placement happens in the trainer via
        sharded device_put (unlike the reference's .to(device) here)."""
        if isinstance(batch, SampleList):
            batch.dataset_name = self._dataset_name
            batch.dataset_type = self._dataset_type
        return batch

    @property
    def dataset_type(self):
        return self._dataset_type

    @property
    def name(self):
        return self._dataset_name

    @property
    def dataset_name(self):
        return self._dataset_name

    @dataset_name.setter
    def dataset_name(self, name):
        self._dataset_name = name

    @dataset_type.setter
    def dataset_type(self, dataset_type):
        self._dataset_type = dataset_type

    def format_for_prediction(self, report):
        return []

    def verbose_dump(self, *args, **kwargs):
        return
