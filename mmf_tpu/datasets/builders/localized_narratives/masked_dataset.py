"""Masked Localized Narratives pretraining dataset
(parity with mmf/datasets/builders/localized_narratives/masked_dataset.py:
12-70): narrative caption -> MLM over region features or raw images. The
mixin also backs masked_coco2017 (reference coco2017/masked_dataset.py)."""

from __future__ import annotations

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.localized_narratives.database import (
    LocalizedNarrativesAnnotationDatabase,
)
from mmf_tpu.datasets.mmf_dataset import MMFDataset


class MaskedLocalizedNarrativesDatasetMixin:
    def build_annotation_db(self) -> LocalizedNarrativesAnnotationDatabase:
        annotation_path = self._get_path_based_on_index(
            self.config, "annotations", self._index
        )
        return LocalizedNarrativesAnnotationDatabase(
            self.config, annotation_path
        )

    def __getitem__(self, idx: int) -> Sample:
        sample_info = self.annotation_db[idx]
        current_sample = Sample()
        processed_caption = self.masked_token_processor(
            {"text_a": sample_info["caption"], "text_b": "",
             "is_correct": True}
        )
        current_sample.update(processed_caption)
        current_sample.image_id = sample_info["image_id"]
        current_sample.feature_path = sample_info["feature_path"]

        if self._use_features:
            features = self.features_db[idx]
            image_info_0 = features.get("image_info_0")
            if image_info_0 and "image_id" in image_info_0:
                image_info_0["feature_path"] = image_info_0.pop("image_id")
            current_sample.update(features)
        elif self._use_images:
            image_id = sample_info["image_id"]
            if "mscoco" in sample_info["dataset_id"]:
                image_id = image_id.rjust(12, "0")
            images = self.image_db.from_path(image_id)["images"]
            assert len(images) != 0, f"image id: {image_id} not found"
            current_sample.image = images[0]

        return current_sample


class MaskedLocalizedNarrativesDataset(
    MaskedLocalizedNarrativesDatasetMixin, MMFDataset
):
    def __init__(self, config, dataset_type, index=0, *args, **kwargs):
        super().__init__(
            "masked_localized_narratives", config, dataset_type, index=index
        )

    def init_processors(self):
        super().init_processors()
        if self._use_images and hasattr(self, "image_processor"):
            self.image_db.transform = self.image_processor
