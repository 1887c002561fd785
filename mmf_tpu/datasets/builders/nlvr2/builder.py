"""NLVR2 builder."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.nlvr2.dataset import NLVR2Dataset
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder


@registry.register_builder("nlvr2")
class NLVR2Builder(VQA2Builder):
    def __init__(self, dataset_name="nlvr2", dataset_class=NLVR2Dataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = NLVR2Dataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/nlvr2/defaults.yaml"
