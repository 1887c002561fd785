"""MM-IMDb builder."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.mmimdb.dataset import (
    MMIMDbFeaturesDataset,
    MMIMDbImageDataset,
)
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


@registry.register_builder("mmimdb")
class MMIMDbBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="mmimdb",
                 dataset_class=MMIMDbImageDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/mmimdb/defaults.yaml"

    def load(self, config, dataset_type, *args, **kwargs):
        self.config = config
        if config.get("use_features", False):
            self.dataset_class = MMIMDbFeaturesDataset
        else:
            self.dataset_class = MMIMDbImageDataset
        return super().load(config, dataset_type, *args, **kwargs)


@registry.register_builder("masked_mmimdb")
class MaskedMMImdbBuilder(MMFDatasetBuilder):
    """(reference mmimdb/masked_builder.py)"""

    def __init__(self, dataset_name="masked_mmimdb", *args, **kwargs):
        from mmf_tpu.datasets.builders.mmimdb.masked_dataset import (
            MaskedMMImdbDataset,
        )

        super().__init__(dataset_name, MaskedMMImdbDataset)

    @classmethod
    def config_path(cls):
        return "configs/datasets/mmimdb/masked.yaml"
