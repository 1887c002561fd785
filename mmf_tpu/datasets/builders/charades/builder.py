"""charades builder (parity with mmf/datasets/builders/charades/builder.py).

The dataset trains from pre-decoded frame directories — see
dataset.py for the offline-decode rationale."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.charades.dataset import CharadesDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


@registry.register_builder("charades")
class CharadesBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="charades",
                 dataset_class=CharadesDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/charades/defaults.yaml"
