"""visual_entailment builder (parity with mmf/datasets/builders/visual_entailment/builder.py):
a VQA2-format dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class VisualEntailmentDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="visual_entailment", *args, **kwargs)


@registry.register_builder("visual_entailment")
class VisualEntailmentBuilder(VQA2Builder):
    def __init__(self, dataset_name="visual_entailment", dataset_class=VisualEntailmentDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = VisualEntailmentDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_entailment/defaults.yaml"
