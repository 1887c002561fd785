"""stvqa builder (parity with mmf/datasets/builders/stvqa/builder.py):
TextVQA-format (M4C) dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.textvqa.builder import TextVQABuilder
from mmf_tpu.datasets.builders.textvqa.dataset import TextVQADataset


class StvqaDataset(TextVQADataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="stvqa", *args, **kwargs)


@registry.register_builder("stvqa")
class StvqaBuilder(TextVQABuilder):
    def __init__(self, dataset_name="stvqa", dataset_class=StvqaDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = StvqaDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/stvqa/defaults.yaml"
