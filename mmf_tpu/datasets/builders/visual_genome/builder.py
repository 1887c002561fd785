"""visual_genome builders (parity with
mmf/datasets/builders/visual_genome/builder.py + masked_builder.py +
detection_builder.py): a VQA2-format dataset with its own config tree."""

import random

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.vqa2.builder import VQA2Builder
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class VisualGenomeDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="visual_genome", *args, **kwargs)


class MaskedVisualGenomeDataset(MMFDataset):
    """MLM over VG region/QA text with preprocessed answers
    (reference visual_genome/masked_dataset.py:7-80)."""

    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__("masked_visual_genome", config, dataset_type,
                         index=imdb_file_index)
        self._add_answer = config.get("add_answer", True)

    def __getitem__(self, idx):
        sample_info = self.annotation_db[idx]
        sample_info = self._preprocess_answer(sample_info)
        sample_info["question_id"] = sample_info["id"]
        current_sample = Sample()

        if self._use_features:
            current_sample = self.add_masked_features(idx, current_sample)

        current_sample = self._add_masked_question(sample_info, current_sample)
        if self._add_answer:
            current_sample = self.add_answer_info(sample_info, current_sample)
        return current_sample

    def _preprocess_answer(self, sample_info):
        sample_info["answers"] = [
            self.vg_answer_preprocessor(
                {"text": sample_info["answers"][0]},
                remove=["?", ",", ".", "a", "an", "the"],
            )["text"]
        ]
        return sample_info

    def add_answer_info(self, sample_info, sample):
        if "answers" in sample_info:
            processed = self.answer_processor(
                {"answers": sample_info["answers"]}
            )
            sample.targets = processed["answers_scores"]
        return sample

    def _add_masked_question(self, sample_info, current_sample):
        processed = self.masked_token_processor(
            {"text_a": sample_info["question"], "text_b": None,
             "is_correct": -1}
        )
        processed.pop("tokens", None)
        current_sample.update(processed)
        return current_sample


@registry.register_builder("visual_genome")
class VisualGenomeBuilder(VQA2Builder):
    def __init__(self, dataset_name="visual_genome", dataset_class=VisualGenomeDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)
        self.dataset_class = VisualGenomeDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_genome/defaults.yaml"


@registry.register_builder("masked_visual_genome")
class MaskedVisualGenomeBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="masked_visual_genome", *args, **kwargs):
        super().__init__(dataset_name, MaskedVisualGenomeDataset)

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_genome/masked.yaml"


@registry.register_builder("detection_visual_genome")
class DetectionVisualGenomeBuilder(MMFDatasetBuilder):
    """VG detection for UniT, COCO-json format with attribute annotations
    (reference visual_genome/detection_builder.py)."""

    def __init__(self, dataset_name="detection_visual_genome", *args,
                 **kwargs):
        from mmf_tpu.datasets.builders.coco.detection_dataset import (
            DetectionVisualGenomeDataset,
        )

        super().__init__(dataset_name, DetectionVisualGenomeDataset)

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_genome/detection.yaml"
