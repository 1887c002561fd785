"""COCO-2017 detection builders for UniT
(parity with mmf/datasets/builders/coco2017/builder.py)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class COCO2017Dataset:
    """Detection dataset; requires raw COCO-2017 images + detr processor."""

    def __init__(self, config, dataset_type, *args, **kwargs):
        raise NotImplementedError(
            "coco2017 detection loading requires raw COCO data; "
            "pre-populate the data dir and extend this dataset "
            "(pycocotools is unavailable in this environment)")


@registry.register_builder("detection_coco")
@registry.register_builder("coco2017")
class COCO2017Builder(MMFDatasetBuilder):
    def __init__(self, dataset_name="coco2017",
                 dataset_class=COCO2017Dataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/coco2017/defaults.yaml"
