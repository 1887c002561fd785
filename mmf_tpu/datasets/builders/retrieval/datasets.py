"""Annotation parsers for the retrieval dataset (parity with
mmf/datasets/builders/retrieval/datasets.py:1-115).

Each parser exposes ``data[idx] -> {"image_path", "sentences"}`` plus a
``samples_factor`` — the fixed number of captions per image, which the
eval fan-out and the retrieval recall metrics rely on."""

from __future__ import annotations

import csv
import gzip
import json


class CaptionsDatabase:
    """Karpathy-split Flickr30k captions JSON."""

    SPLITS = {"train": ["train"], "val": ["val"], "test": ["test"]}

    def __init__(self, config, splits_path, dataset_type="train",
                 *args, **kwargs):
        self.config = config
        self.dataset_type = dataset_type
        self.splits = self.SPLITS[dataset_type]
        self._load_annotation_db(splits_path)

    def _load_annotation_db(self, splits_path):
        with open(splits_path) as f:
            annotations = json.load(f)

        data = []
        for image in annotations["images"]:
            if image["split"] in self.splits:
                data.append(
                    {
                        "image_path": image["filename"],
                        "sentences": [s["raw"] for s in image["sentences"]],
                    }
                )
        if not data:
            raise RuntimeError("Dataset is empty")
        self.samples_factor = len(data[0]["sentences"])
        self.data = data

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


class COCOAnnotationDatabase(CaptionsDatabase):
    """Karpathy COCO split; train additionally uses the restval images."""

    SPLITS = {"train": ["train", "restval"], "val": ["val"], "test": ["test"]}

    _SPLIT_SUBDIR = {
        "train": "../train2014/",
        "restval": "../val2014/",
        "val": "../val2014/",
        "test": "../val2014/",
    }

    def _load_annotation_db(self, splits_path):
        with open(splits_path) as f:
            annotations = json.load(f)

        data = []
        for image in annotations["images"]:
            if image["split"] not in self.splits:
                continue
            subdir = self._SPLIT_SUBDIR.get(image["split"])
            if subdir is None:
                raise NotImplementedError(image["split"])
            data.append(
                {
                    "image_path": subdir + image["filename"],
                    # cap at 5 captions so samples_factor is constant
                    "sentences": [s["raw"] for s in image["sentences"][:5]],
                }
            )
        if not data:
            raise RuntimeError("Dataset is empty")
        self.samples_factor = len(data[0]["sentences"])
        self.data = data


class ConceptualCaptionsDatabase(CaptionsDatabase):
    """Gzipped caption<TAB>file TSV; one caption per image."""

    def _load_annotation_db(self, splits_path):
        data = []
        with gzip.open(splits_path, "rt", newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if len(row) < 2:
                    continue
                data.append({"image_path": row[1], "sentences": [row[0]]})
        if not data:
            raise RuntimeError("Dataset is empty")
        self.samples_factor = 1
        self.data = data


ANNOTATIONS_DATABASE = {
    "flickr": CaptionsDatabase,
    "coco": COCOAnnotationDatabase,
    "cc": ConceptualCaptionsDatabase,
}
