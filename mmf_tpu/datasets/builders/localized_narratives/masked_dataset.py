"""Masked Localized Narratives pretraining dataset
(parity with mmf/datasets/builders/localized_narratives/masked_dataset.py:
12-70): one narrative caption -> MLM sample over region features or the
raw image. The mixin also backs masked_coco2017 and masked_flickr30k,
mirroring the reference's subclass tree."""

from __future__ import annotations

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.localized_narratives.database import (
    LocalizedNarrativesAnnotationDatabase,
)
from mmf_tpu.datasets.mmf_dataset import MMFDataset


class MaskedLocalizedNarrativesDatasetMixin:
    def build_annotation_db(self) -> LocalizedNarrativesAnnotationDatabase:
        path = self._get_path_based_on_index(
            self.config, "annotations", self._index
        )
        return LocalizedNarrativesAnnotationDatabase(self.config, path)

    def _visual_input(self, idx: int, info: dict, sample: Sample) -> Sample:
        if self._use_features:
            features = self.features_db[idx]
            # feature dbs keyed by image_id expose it under image_info_0;
            # rename so downstream consumers see a feature_path
            info0 = features.get("image_info_0")
            if info0 and "image_id" in info0:
                info0["feature_path"] = info0.pop("image_id")
            sample.update(features)
        elif self._use_images:
            image_id = info["image_id"]
            if "mscoco" in info["dataset_id"]:
                image_id = image_id.rjust(12, "0")
            images = self.image_db.from_path(image_id)["images"]
            assert images, f"image id: {image_id} not found"
            sample.image = images[0]
        return sample

    def __getitem__(self, idx: int) -> Sample:
        info = self.annotation_db[idx]
        sample = Sample()
        sample.update(
            self.masked_token_processor(
                {"text_a": info["caption"], "text_b": "", "is_correct": True}
            )
        )
        sample.image_id = info["image_id"]
        sample.feature_path = info["feature_path"]
        return self._visual_input(idx, info, sample)


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
