"""GLUE builders (parity with
mmf/datasets/builders/glue/builder.py): text-only tasks via jsonl
annotations (the reference wraps HF datasets; here annotations come from
the standard annotation db)."""

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class GLUEDataset(MMFDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(
            kwargs.get("dataset_name", "glue"), config, dataset_type,
            index=imdb_file_index)

    def __getitem__(self, idx):
        info = self.annotation_db[idx]
        sample = Sample()
        args = {"text_a": info.get("sentence1", info.get("sentence", ""))}
        if "sentence2" in info:
            args["text_b"] = info["sentence2"]
        processed = self.text_processor(args)
        sample.update(processed)
        if "label" in info:
            sample.targets = np.int64(info["label"])
        return sample


def _make_glue_builder(key):
    @registry.register_builder(key)
    class _Builder(MMFDatasetBuilder):
        def __init__(self, dataset_name=key, dataset_class=GLUEDataset,
                     *args, **kwargs):
            super().__init__(dataset_name, dataset_class)

        @classmethod
        def config_path(cls):
            return "configs/datasets/glue/defaults.yaml"

    _Builder.__name__ = f"GLUE{key.upper()}Builder"
    return _Builder


for _key in ["glue_qnli", "glue_sst2", "glue_mnli_mismatched", "glue_qqp"]:
    _make_glue_builder(_key)
