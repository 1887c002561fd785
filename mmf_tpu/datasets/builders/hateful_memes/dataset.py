"""Hateful Memes datasets (parity with
mmf/datasets/builders/hateful_memes/dataset.py:15-136): features-based and
raw-image variants, incl. fine-grained label support."""

from __future__ import annotations

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.mmf_dataset import MMFDataset


def generate_binary_prediction(report):
    scores = np.asarray(report["scores"])
    ex = np.exp(scores - scores.max(-1, keepdims=True))
    probs = ex / ex.sum(-1, keepdims=True)
    labels = scores.argmax(axis=1)
    predictions = []
    for idx, id_ in enumerate(report["id"]):
        proba = float(probs[idx, 1])
        predictions.append(
            {"id": int(np.asarray(id_)), "proba": proba,
             "label": int(labels[idx])}
        )
    return predictions


def generate_multilabel_prediction(report):
    scores = 1.0 / (1.0 + np.exp(-np.asarray(report["scores"])))
    predictions = []
    for idx, id_ in enumerate(report["id"]):
        predictions.append(
            {"id": int(np.asarray(id_)), "scores": scores[idx].tolist()}
        )
    return predictions


class HatefulMemesFeaturesDataset(MMFDataset):
    def __init__(self, config, *args, dataset_name="hateful_memes", **kwargs):
        super().__init__(dataset_name, config, *args, **kwargs)
        assert self._use_features, (
            "config's 'use_features' must be true to use features dataset"
        )
        self.is_multilabel = self.config.get("is_multilabel", False)

    def preprocess_sample_info(self, sample_info):
        image_path = sample_info["img"]
        feature_path = image_path.split("/")[-1].split(".")[0]
        sample_info["feature_path"] = f"{feature_path}.npy"
        return sample_info

    def __getitem__(self, idx):
        sample_info = self.annotation_db[idx]
        sample_info = self.preprocess_sample_info(sample_info)

        current_sample = Sample()
        processed_text = self.text_processor({"text": sample_info["text"]})
        current_sample.text = processed_text["text"]
        if "input_ids" in processed_text:
            current_sample.update(processed_text)

        current_sample.id = np.int32(int(sample_info["id"]))
        features = self._process_feature_info(
            self.features_db.get(sample_info)
        )
        current_sample.update(features)

        fg_dataset_type = self.config.get("fg_dataset_type", None)
        if fg_dataset_type:
            current_sample = self.process_fg_labels(
                fg_dataset_type, sample_info, current_sample
            )
        elif "label" in sample_info:
            current_sample.targets = np.int64(sample_info["label"])
        return current_sample

    def process_fg_labels(self, fg_dataset_type, sample_info, current_sample):
        """Fine-grained label variants (reference dataset.py:68-90)."""
        ds_type_to_label = {
            "attack": sample_info["top_attacks"],
            "pc": sample_info["top_protectedcats"],
            "pc_attack": sample_info["top_protectedcats"]
            + sample_info["top_attacks"],
            "hateful_pc_attack": sample_info["top_protectedcats"]
            + sample_info["top_attacks"]
            + ["hateful" if int(sample_info["label"]) == 1 else "not_hateful"],
        }
        processed = self.answer_processor(
            {"answers": ds_type_to_label[fg_dataset_type]}
        )
        current_sample.answers = processed["answers"]
        current_sample.targets = processed["answers_scores"]
        return current_sample

    def format_for_prediction(self, report):
        if self.is_multilabel:
            return generate_multilabel_prediction(report)
        return generate_binary_prediction(report)


class HatefulMemesImageDataset(MMFDataset):
    def __init__(self, config, *args, dataset_name="hateful_memes", **kwargs):
        super().__init__(dataset_name, config, *args, **kwargs)
        assert self._use_images, (
            "config's 'use_images' must be true to use image dataset"
        )
        self.is_multilabel = self.config.get("is_multilabel", False)

    def init_processors(self):
        super().init_processors()
        if hasattr(self, "image_processor"):
            self.image_db.transform = self.image_processor

    def __getitem__(self, idx):
        sample_info = self.annotation_db[idx]
        current_sample = Sample()
        processed_text = self.text_processor({"text": sample_info["text"]})
        current_sample.text = processed_text["text"]
        if "input_ids" in processed_text:
            current_sample.update(processed_text)
        current_sample.id = np.int32(int(sample_info["id"]))
        current_sample.image = self.image_db[idx]["images"][0]
        if "label" in sample_info:
            current_sample.targets = np.int64(sample_info["label"])
        return current_sample

    def format_for_prediction(self, report):
        if self.is_multilabel:
            return generate_multilabel_prediction(report)
        return generate_binary_prediction(report)
