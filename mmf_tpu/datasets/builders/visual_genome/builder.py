"""visual_genome builder (parity with mmf/datasets/builders/visual_genome/builder.py):
a VQA2-format dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class VisualGenomeDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="visual_genome", *args, **kwargs)


@registry.register_builder("visual_genome")
class VisualGenomeBuilder(VQA2Builder):
    def __init__(self, dataset_name="visual_genome", dataset_class=VisualGenomeDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = VisualGenomeDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_genome/defaults.yaml"
