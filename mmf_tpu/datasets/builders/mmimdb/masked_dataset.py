"""Masked MM-IMDb pretraining dataset
(parity with mmf/datasets/builders/mmimdb/masked_dataset.py:8-61): the
movie plot plus one randomly-chosen genre form the MLM sentence pair."""

from __future__ import annotations

import random

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class MaskedMMImdbDataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        kwargs.setdefault("dataset_name", "masked_mmimdb")
        super().__init__(config, dataset_type, imdb_file_index, *args,
                         **kwargs)
        self._add_answer = config.get("add_answer", True)

    def load_item(self, idx):
        sample_info = self.annotation_db[idx]
        current_sample = Sample()

        if self._use_features:
            current_sample = self.add_masked_features(idx, current_sample)

        return self._add_masked_question(sample_info, current_sample)

    def _add_masked_question(self, sample_info, current_sample):
        plot = sample_info["plot"]
        if isinstance(plot, list):
            plot = plot[0]
        random_genre = random.choice(sample_info["genres"])

        processed = self.masked_token_processor(
            {"text_a": plot, "text_b": random_genre, "is_correct": -1}
        )
        processed.pop("tokens", None)
        current_sample.update(processed)
        return current_sample
