"""masked_sbu builder (parity with
mmf/datasets/builders/sbu_captions/builder.py): COCO-caption-format data."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.coco.masked_dataset import MaskedCOCODataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class SbuCaptionsDataset(MaskedCOCODataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index, *args, **kwargs)
        self.dataset_name = "masked_sbu"


@registry.register_builder("masked_sbu")
class SbuCaptionsBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_sbu", dataset_class=SbuCaptionsDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/sbu_captions/defaults.yaml"
