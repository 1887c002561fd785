"""vizwiz builder (parity with mmf/datasets/builders/vizwiz/builder.py):
a VQA2-format dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class VizwizDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="vizwiz", *args, **kwargs)


@registry.register_builder("vizwiz")
class VizwizBuilder(VQA2Builder):
    def __init__(self, dataset_name="vizwiz", dataset_class=VizwizDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = VizwizDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/vizwiz/defaults.yaml"
