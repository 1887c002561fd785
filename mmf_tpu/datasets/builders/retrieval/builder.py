"""Retrieval builder (parity with mmf/datasets/builders/retrieval —
builder.py:24, dataset.py:100): image-text retrieval over
captions-per-image annotations (Flickr30k/COCO Karpathy splits,
Conceptual Captions TSV).

Train items pair each image with one randomly-drawn caption. Eval items
carry ALL ``samples_factor`` captions stacked along a leading axis
(fixed shapes for XLA); the alignment models flatten that axis so the
retrieval recall metrics see [B] images vs [B*factor] texts."""

from __future__ import annotations

import random

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.retrieval.datasets import ANNOTATIONS_DATABASE
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class RetrievalDataset(MMFDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        self.annotation_class = config.get("annotations_parser", "flickr")
        super().__init__("retrieval", config, dataset_type,
                         index=imdb_file_index)

    def build_annotation_db(self):
        annotation_path = self._get_path_based_on_index(
            self.config, "annotations", self._index
        )
        db_class = ANNOTATIONS_DATABASE[self.annotation_class]
        return db_class(self.config, annotation_path, self.dataset_type)

    def init_processors(self):
        super().init_processors()
        if not self._use_images or not hasattr(self, "image_db"):
            return
        # train and eval use different crop pipelines
        if self.dataset_type == "train":
            if hasattr(self, "train_image_processor"):
                self.image_db.transform = self.train_image_processor
        elif hasattr(self, "eval_image_processor"):
            self.image_db.transform = self.eval_image_processor
        elif hasattr(self, "image_processor"):
            self.image_db.transform = self.image_processor

    def _get_sentences(self, sample_info):
        if "captions" in sample_info:
            return sample_info["captions"]
        if "sentences" in sample_info:
            return sample_info["sentences"]
        raise AttributeError("No valid text attribute was found")

    def _process_text(self, sentence):
        processed = self.text_processor({"text": sentence})
        out = {"text": processed["text"]}
        for key in ("input_ids", "input_mask", "segment_ids"):
            if key in processed:
                out[key] = processed[key]
        return out

    def __getitem__(self, idx):
        sample_info = self.annotation_db[idx]
        sentences = self._get_sentences(sample_info)
        sample = Sample()

        if self.dataset_type == "train":
            sentence = random.sample(list(sentences), 1)[0]
            sample.update(self._process_text(sentence))
            sample.ann_idx = np.int64(idx)
        else:
            factor = self.annotation_db.samples_factor
            stacked = [self._process_text(s) for s in sentences[:factor]]
            keys = [k for k in stacked[0] if k != "text"]
            for key in keys:
                sample[key] = np.stack([s[key] for s in stacked])
            sample.text = stacked[0]["text"]
            sample.text_index = np.asarray(
                [idx * factor + i for i in range(len(stacked))], np.int64
            )
            sample.image_index = np.int64(idx)

        if self._use_features:
            sample.update(self.features_db[idx])
        if self._use_images:
            sample.image = self.image_db[idx]["images"][0]
        if self.dataset_type == "train":
            # dummy so the Losses container runs (in-batch contrastive
            # losses ignore it); eval omits targets -> losses skipped,
            # matching the reference's `targets = None`
            sample.targets = np.int64(idx)
        return sample


@registry.register_builder("retrieval")
class RetrievalBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="retrieval",
                 dataset_class=RetrievalDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/retrieval/flickr30k_defaults.yaml"
