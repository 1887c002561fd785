"""vqacp_v2 builder (parity with mmf/datasets/builders/vqacp_v2/builder.py):
a VQA2-format dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class VqacpV2Dataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="vqacp_v2", *args, **kwargs)


@registry.register_builder("vqacp_v2")
class VqacpV2Builder(VQA2Builder):
    def __init__(self, dataset_name="vqacp_v2", dataset_class=VqacpV2Dataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = VqacpV2Dataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/vqacp_v2/defaults.yaml"
