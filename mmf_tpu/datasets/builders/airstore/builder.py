"""airstore builder (registered; dataset loading
requires FB-internal airstore client, which is unavailable in this environment —
raises a clear error at load time; parity with
mmf/datasets/builders/airstore)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class AirstoreDataset:
    def __init__(self, config, dataset_type, *args, **kwargs):
        raise NotImplementedError(
            "airstore requires FB-internal airstore client, which is not available in this "
            "environment")


@registry.register_builder("airstore")
class AirstoreBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="airstore", dataset_class=AirstoreDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/airstore/defaults.yaml"
