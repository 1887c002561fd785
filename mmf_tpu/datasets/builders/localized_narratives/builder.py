"""masked_localized_narratives builder (parity with
mmf/datasets/builders/localized_narratives/masked_builder.py)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.localized_narratives.masked_dataset import (
    MaskedLocalizedNarrativesDataset,
)
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


@registry.register_builder("masked_localized_narratives")
class LocalizedNarrativesBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_localized_narratives",
                 dataset_class=MaskedLocalizedNarrativesDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/localized_narratives/defaults.yaml"
