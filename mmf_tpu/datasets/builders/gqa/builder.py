"""gqa builders (parity with mmf/datasets/builders/gqa/builder.py +
masked_builder.py): a VQA2-format dataset with its own config tree."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset
from mmf_tpu.datasets.builders.vqa2.masked_dataset import MaskedVQA2Dataset


class GqaDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="gqa", *args, **kwargs)


class MaskedGqaDataset(MaskedVQA2Dataset):
    """Question + random-answer MLM pair over GQA annotations
    (reference gqa/masked_dataset.py:9-54 — same item shape as masked
    VQA2, add_answer defaults True)."""

    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        kwargs.setdefault("dataset_name", "masked_gqa")
        super().__init__(config, dataset_type, imdb_file_index, *args,
                         **kwargs)
        self._add_answer = config.get("add_answer", True)


@registry.register_builder("gqa")
class GqaBuilder(VQA2Builder):
    def __init__(self, dataset_name="gqa", dataset_class=GqaDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = GqaDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/gqa/defaults.yaml"


@registry.register_builder("masked_gqa")
class MaskedGqaBuilder(VQA2Builder):
    def __init__(self, dataset_name="masked_gqa",
                 dataset_class=MaskedGqaDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/gqa/masked.yaml"
