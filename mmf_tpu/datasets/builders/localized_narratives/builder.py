"""masked_localized_narratives builder (registered; dataset loading
requires localized-narratives trace data, which is unavailable in this environment —
raises a clear error at load time; parity with
mmf/datasets/builders/localized_narratives)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class LocalizedNarrativesDataset:
    def __init__(self, config, dataset_type, *args, **kwargs):
        raise NotImplementedError(
            "masked_localized_narratives requires localized-narratives trace data, which is not available in this "
            "environment")


@registry.register_builder("masked_localized_narratives")
class LocalizedNarrativesBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_localized_narratives", dataset_class=LocalizedNarrativesDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/localized_narratives/defaults.yaml"
