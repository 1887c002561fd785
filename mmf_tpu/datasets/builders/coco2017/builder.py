"""COCO-2017 builders.

detection_coco: raw-image DETR detection for UniT (parity with
mmf/datasets/builders/coco/detection_builder.py — the JSON is parsed
directly, no pycocotools).
masked_coco2017: localized-narratives-style MLM pretraining over COCO-2017
(parity with mmf/datasets/builders/coco2017/masked_builder.py).
coco2017: feature-based variant kept for config compatibility.
"""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.coco.detection_dataset import (
    DetectionCOCODataset,
)
from mmf_tpu.datasets.builders.localized_narratives.masked_dataset import (
    MaskedLocalizedNarrativesDatasetMixin,
)
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class MaskedCoco2017Dataset(MaskedLocalizedNarrativesDatasetMixin,
                            MMFDataset):
    """(reference coco2017/masked_dataset.py:10-21)"""

    def __init__(self, config, dataset_type, index=0, *args, **kwargs):
        super().__init__(
            "masked_coco2017", config, dataset_type, index=index
        )


@registry.register_builder("coco2017")
class COCO2017Builder(MMFDatasetBuilder):
    def __init__(self, dataset_name="coco2017",
                 dataset_class=MaskedCoco2017Dataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/coco2017/defaults.yaml"


@registry.register_builder("masked_coco2017")
class MaskedCoco2017Builder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_coco2017",
                 dataset_class=MaskedCoco2017Dataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/coco2017/masked.yaml"


@registry.register_builder("detection_coco")
class DetectionCOCOBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="detection_coco",
                 dataset_class=DetectionCOCODataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/coco/detection.yaml"
