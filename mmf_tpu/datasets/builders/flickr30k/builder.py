"""Flickr30k masked builder (parity with
mmf/datasets/builders/flickr30k/masked_builder.py + masked_dataset.py):
localized-narratives captions over Flickr30k FRCNN features."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.localized_narratives.masked_dataset import (
    MaskedLocalizedNarrativesDatasetMixin,
)
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class MaskedFlickr30kDataset(MaskedLocalizedNarrativesDatasetMixin,
                             MMFDataset):
    def __init__(self, config, dataset_type, index=0, *args, **kwargs):
        super().__init__(
            "masked_flickr30k", config, dataset_type, index=index
        )


@registry.register_builder("masked_flickr30k")
class MaskedFlickr30kBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_flickr30k",
                 dataset_class=MaskedFlickr30kDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/flickr30k/masked.yaml"
