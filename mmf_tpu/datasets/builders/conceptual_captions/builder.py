"""conceptual_captions builder (parity with
mmf/datasets/builders/conceptual_captions/builder.py): COCO-caption-format data."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.coco.dataset import COCODataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class ConceptualCaptionsDataset(COCODataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index, *args, **kwargs)
        self.dataset_name = "conceptual_captions"


@registry.register_builder("conceptual_captions")
class ConceptualCaptionsBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="conceptual_captions", dataset_class=ConceptualCaptionsDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/conceptual_captions/defaults.yaml"
