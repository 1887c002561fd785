"""textcaps builder (parity with mmf/datasets/builders/textcaps/builder.py):
TextVQA-format (M4C) dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.textvqa.builder import TextVQABuilder
from mmf_tpu.datasets.builders.textvqa.dataset import TextVQADataset


class TextcapsDataset(TextVQADataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="textcaps", *args, **kwargs)


@registry.register_builder("textcaps")
class TextcapsBuilder(TextVQABuilder):
    def __init__(self, dataset_name="textcaps", dataset_class=TextcapsDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = TextcapsDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/textcaps/defaults.yaml"
