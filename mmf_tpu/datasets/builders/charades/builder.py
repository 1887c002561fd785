"""charades builder (registered; dataset loading
requires video decoding backend (pytorchvideo), which is unavailable in this environment —
raises a clear error at load time; parity with
mmf/datasets/builders/charades)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class CharadesDataset:
    def __init__(self, config, dataset_type, *args, **kwargs):
        raise NotImplementedError(
            "charades requires video decoding backend (pytorchvideo), which is not available in this "
            "environment")


@registry.register_builder("charades")
class CharadesBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="charades", dataset_class=CharadesDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/charades/defaults.yaml"
