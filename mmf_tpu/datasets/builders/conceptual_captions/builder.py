"""conceptual_captions builder (parity with
mmf/datasets/builders/conceptual_captions/builder.py): COCO-caption-format data."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.coco.dataset import COCODataset
from mmf_tpu.datasets.builders.coco.masked_dataset import MaskedCOCODataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class ConceptualCaptionsDataset(COCODataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index, *args, **kwargs)
        self.dataset_name = "conceptual_captions"


class MaskedConceptualCaptionsDataset(MaskedCOCODataset):
    """(reference conceptual_captions/masked_dataset.py:6-14)"""

    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        kwargs.setdefault("dataset_name", "masked_conceptual_captions")
        super().__init__(config, dataset_type, imdb_file_index, *args,
                         **kwargs)


@registry.register_builder("conceptual_captions")
class ConceptualCaptionsBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="conceptual_captions", dataset_class=ConceptualCaptionsDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/conceptual_captions/defaults.yaml"


@registry.register_builder("masked_conceptual_captions")
class MaskedConceptualCaptionsBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_conceptual_captions",
                 dataset_class=MaskedConceptualCaptionsDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/conceptual_captions/masked.yaml"
