"""Localized Narratives annotation database
(parity with mmf/datasets/builders/localized_narratives/database.py:48-74):
jsonl of narratives -> {dataset_id, image_id, caption, feature_path};
mscoco image ids are zero-padded to 12 chars for feature lookup."""

from __future__ import annotations

import json

from mmf_tpu.datasets.databases.annotation_database import AnnotationDatabase


class LocalizedNarrativesAnnotationDatabase(AnnotationDatabase):
    def load_annotation_db(self, path: str):
        data = []
        with open(path) as f:
            for line in f:
                ann = json.loads(line)
                data.append(
                    {
                        "dataset_id": ann["dataset_id"],
                        "image_id": ann["image_id"],
                        "caption": ann["caption"],
                        "feature_path": self._feature_path(
                            ann["dataset_id"], ann["image_id"]
                        ),
                    }
                )
        self.data = data
        self.start_idx = 0

    def _feature_path(self, dataset_id: str, image_id: str) -> str:
        if "mscoco" in dataset_id.lower():
            return image_id.rjust(12, "0") + ".npy"
        return image_id + ".npy"
