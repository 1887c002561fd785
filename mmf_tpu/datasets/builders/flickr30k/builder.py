"""Flickr30k builder (parity with
mmf/datasets/builders/flickr30k): masked pretraining over caption+region
features in COCO-ish format."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.coco.dataset import COCODataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class MaskedFlickr30kDataset(COCODataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index, *args, **kwargs)
        self.dataset_name = "masked_flickr30k"


@registry.register_builder("masked_flickr30k")
class MaskedFlickr30kBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_flickr30k",
                 dataset_class=MaskedFlickr30kDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/flickr30k/masked.yaml"
