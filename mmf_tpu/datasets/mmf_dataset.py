"""MMFDataset: annotation + features + image database composition
(parity with mmf/datasets/mmf_dataset.py)."""

from __future__ import annotations

from typing import Any

from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.datasets.databases.annotation_database import AnnotationDatabase
from mmf_tpu.datasets.databases.features_database import FeaturesDatabase
from mmf_tpu.datasets.databases.image_database import ImageDatabase
from mmf_tpu.utils.general import get_absolute_path


class MMFDataset(BaseDataset):
    """Composes databases driven by config ``use_images``/``use_features``
    (reference mmf_dataset.py:20-89)."""

    def __init__(self, dataset_name, config, dataset_type="train",
                 index=0, *args, **kwargs):
        super().__init__(dataset_name, config, dataset_type)
        self._index = index
        self.annotation_db = self.build_annotation_db()

        self._use_images = self.config.get("use_images", False)
        if self._use_images:
            self.image_db = self.build_image_db()

        self._use_features = self.config.get("use_features", False)
        if self._use_features:
            self.features_db = self.build_features_db()

    def build_annotation_db(self) -> AnnotationDatabase:
        annotation_path = self._get_path_based_on_index(
            self.config, "annotations", self._index
        )
        return AnnotationDatabase(self.config, annotation_path)

    def build_features_db(self) -> FeaturesDatabase:
        features_path = self._get_path_based_on_index(
            self.config, "features", self._index
        )
        return FeaturesDatabase(
            self.config, features_path, annotation_db=self.annotation_db
        )


    def _process_feature_info(self, features):
        """Run the bbox geometry processor over image_info_0 when
        configured — the one shared implementation for every dataset
        (the processor returns a copy; see TransformerBboxProcessor)."""
        if hasattr(self, "transformer_bbox_processor"):
            features["image_info_0"] = self.transformer_bbox_processor(
                features["image_info_0"]
            )
        return features

    def add_masked_features(self, idx, sample):
        """Shared masked-pretraining feature path: fetch region features,
        run the bbox geometry processor, and (when
        ``use_image_feature_masks``) swap in masked features + labels.
        Used by every masked_* dataset."""
        features = self._process_feature_info(self.features_db[idx])
        if self.config.get("use_image_feature_masks", False):
            masked_feat, region_labels = self.masked_region_processor(
                features["image_feature_0"]
            )
            features["image_feature_0"] = masked_feat
            sample["image_labels"] = region_labels
        sample.update(features)
        return sample

    def build_image_db(self) -> ImageDatabase:
        image_path = self._get_path_based_on_index(
            self.config, "images", self._index
        )
        return ImageDatabase(
            self.config, image_path, annotation_db=self.annotation_db
        )

    def _get_path_based_on_index(self, config, attribute, index):
        """Multi-path index selection (reference mmf_dataset.py:60-89)."""
        if attribute not in config:
            raise ValueError(f"{attribute} not present in config")
        config = config.get(attribute, None)
        if (
            self.dataset_type not in config
            or len(config.get(self.dataset_type, [])) == 0
        ):
            raise ValueError(f"No {attribute} present for type {self.dataset_type}")
        paths = config[self.dataset_type]
        if isinstance(paths, str):
            selected_path = paths
        else:
            assert isinstance(paths, (list, tuple))
            selected_path = paths[index]
        return self._add_root_dir(selected_path)

    def _add_root_dir(self, path):
        import os

        path = path.split(",")
        data_dir = self.config.get("data_dir", None)
        for idx, p in enumerate(path):
            if not os.path.isabs(p) and data_dir:
                p = os.path.join(data_dir, p)
            path[idx] = get_absolute_path(p)
        return ",".join(path)

    def __len__(self):
        return len(self.annotation_db)
