"""Visual Dialog builder (reference mmf/datasets/builders/visual_dialog —
whose database/dataset shipped incomplete; this is a working
implementation of its evident intent over the VisDial 1.0 json format).

Each item is one dialog round: the question (optionally prefixed with the
caption + previous rounds as history), region features by image_id, and
either the ground-truth answer (generative) or the index of the answer
among its 100 options (discriminative)."""

from __future__ import annotations

import json

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class VisualDialogDatabase:
    """VisDial json -> flat per-round access. Accepts both the 1.0 layout
    ({"split", "data": {questions, answers, dialogs}}) and the flat one
    the reference reads ({"split", questions, answers, dialogs})."""

    def __init__(self, imdb_path, config=None, dataset_type="train",
                 *args, **kwargs):
        with open(imdb_path) as f:
            raw = json.load(f)
        data = raw.get("data", raw)
        self._is_test = raw.get("split", "train") == "test"
        self._questions = data["questions"]
        self._answers = data["answers"]
        self._dialogs = data["dialogs"]
        # test dialogs carry a single (unanswered) round
        self._multiplier = 1 if self._is_test else 10
        self.metadata = {}

    def __len__(self):
        return len(self._dialogs) * self._multiplier

    def __getitem__(self, idx):
        dialog_id, round_id = divmod(idx, self._multiplier)
        dialog = self._dialogs[dialog_id]
        rounds = dialog["dialog"]
        round_id = min(round_id, len(rounds) - 1)
        rnd = rounds[round_id]

        history = [dialog.get("caption", "")]
        for prev in rounds[:round_id]:
            history.append(self._questions[prev["question"]])
            if "answer" in prev:
                history.append(self._answers[prev["answer"]])

        item = {
            "id": idx,
            "dialog_id": dialog_id,
            "round_id": round_id,
            "image_id": dialog["image_id"],
            "question": self._questions[rnd["question"]],
            "history": history,
        }
        if "answer" in rnd:
            item["answer"] = self._answers[rnd["answer"]]
        if "answer_options" in rnd:
            item["answer_options"] = [
                self._answers[a] for a in rnd["answer_options"]
            ]
            if "gt_index" in rnd:
                item["gt_index"] = rnd["gt_index"]
        return item


class VisualDialogDataset(MMFDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__("visual_dialog", config, dataset_type,
                         index=imdb_file_index)
        disc = config.get("discriminative", {}) or {}
        self._discriminative = disc.get("enabled", False)
        self._return_history = config.get("return_history", True)
        self._max_options = disc.get("num_options", 100)

    def build_annotation_db(self):
        path = self._get_path_based_on_index(
            self.config, "annotations", self._index
        )
        return VisualDialogDatabase(path)

    def __getitem__(self, idx):
        info = self.annotation_db[idx]
        sample = Sample()

        text = info["question"]
        if self._return_history:
            text = " ".join(info["history"] + [info["question"]])
        processed = self.text_processor({"text": text})
        sample.text = processed["text"]
        for key in ("input_ids", "input_mask", "segment_ids"):
            if key in processed:
                sample[key] = processed[key]

        sample.dialog_id = np.int64(info["dialog_id"])
        sample.round_id = np.int64(info["round_id"])
        sample.image_id = np.int64(info["image_id"])

        if self._use_features:
            # visdial annotations carry only image_id — give the feature
            # reader an explicit path instead of letting it fall back to
            # (missing) image_path/feature_path keys
            sample.update(
                self.features_db.get(
                    {"feature_path": f"{int(info['image_id'])}.npy"}
                )
            )

        if self._discriminative and "answer_options" in info:
            options = info["answer_options"][: self._max_options]
            stacked = [
                self.answer_processor({"text": opt})
                if hasattr(self, "answer_processor")
                else self.text_processor({"text": opt})
                for opt in options
            ]
            keys = [k for k in stacked[0]
                    if isinstance(stacked[0][k], np.ndarray)]
            for key in keys:
                sample[f"option_{key}"] = np.stack(
                    [s[key] for s in stacked]
                )
            if "gt_index" in info:
                sample.targets = np.int64(info["gt_index"])
        elif "answer" in info:
            processed = self.text_processor({"text": info["answer"]})
            if "input_ids" in processed:
                sample.answer_input_ids = processed["input_ids"]
            sample.targets = np.int64(0)
        return sample


@registry.register_builder("visual_dialog")
class VisualDialogBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="visual_dialog",
                 dataset_class=VisualDialogDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_dialog/defaults.yaml"
