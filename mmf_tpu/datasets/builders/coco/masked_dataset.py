"""Masked (MLM + ITM) pretraining dataset over COCO-caption-format data.

Parity with mmf/datasets/builders/coco/masked_dataset.py:7-93: each item is
one caption (optionally paired with a second, possibly mismatched, caption
for the image-text-matching objective) run through the masked-token
processor, plus FRCNN region features with optional masked-region labels.
The same class backs masked_sbu / masked_flickr30k /
masked_conceptual_captions, mirroring the reference's subclass tree.
"""

from __future__ import annotations

import random

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.coco.dataset import COCODataset


class MaskedCOCODataset(COCODataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        kwargs.setdefault("dataset_name", "masked_coco")
        super().__init__(config, dataset_type, imdb_file_index, *args,
                         **kwargs)
        self.dataset_name = kwargs["dataset_name"]
        self._two_sentence = config.get("two_sentence", True)
        self._false_caption = config.get("false_caption", True)
        self._two_sentence_probability = config.get(
            "two_sentence_probability", 0.5
        )
        self._false_caption_probability = config.get(
            "false_caption_probability", 0.5
        )

    def load_item(self, idx):
        sample_info = self.annotation_db[idx]
        current_sample = Sample()

        if self._use_features:
            current_sample = self.add_masked_features(idx, current_sample)
        else:
            image_path = str(sample_info["image_name"]) + ".jpg"
            current_sample.image = self.image_db.from_path(image_path)[
                "images"
            ][0]

        current_sample = self._add_masked_caption(sample_info, current_sample)
        return current_sample

    def _add_masked_caption(self, sample_info, current_sample):
        captions = sample_info["captions"]
        image_id = sample_info["image_id"]
        selected_index = random.randrange(len(captions))
        selected_caption = captions[selected_index]
        other_caption = None
        is_correct = -1

        if self._two_sentence:
            # ITM over sentence PAIRS: second sentence is either another
            # true caption of the same image or a random mismatch
            if random.random() > self._two_sentence_probability:
                other_caption = self._get_mismatching_caption(image_id)
                is_correct = False
            else:
                others = [
                    i for i in range(len(captions)) if i != selected_index
                ]
                # single-caption images (SBU / Conceptual Captions reuse
                # this dataset) re-use the same caption as the true pair
                # instead of crashing on random.choice([])
                other_caption = captions[
                    random.choice(others) if others else selected_index
                ]
                is_correct = True
        elif self._false_caption:
            # ITM over a SINGLE sentence: swap it for a mismatch sometimes
            if random.random() < self._false_caption_probability:
                selected_caption = self._get_mismatching_caption(image_id)
                is_correct = False
            else:
                is_correct = True

        processed = self.masked_token_processor(
            {
                "text_a": selected_caption,
                "text_b": other_caption,
                "is_correct": is_correct,
            }
        )
        processed.pop("tokens", None)
        current_sample.update(processed)
        return current_sample

    def _get_mismatching_caption(self, image_id):
        other = self.annotation_db[random.randrange(len(self.annotation_db))]
        while other["image_id"] == image_id:
            other = self.annotation_db[
                random.randrange(len(self.annotation_db))
            ]
        return other["captions"][random.randrange(len(other["captions"]))]
