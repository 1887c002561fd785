"""CLEVR dataset (parity with mmf/datasets/builders/clevr/dataset.py)."""

from __future__ import annotations

import json
import os

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.utils.distributed import is_main, synchronize
from mmf_tpu.utils.general import get_mmf_root
from mmf_tpu.utils.text import VocabFromText, tokenize

_CONSTANTS = {
    "questions_folder": "questions",
    "dataset_key": "clevr",
    "empty_folder_error": "CLEVR dataset folder is empty.",
    "questions_key": "questions",
    "question_key": "question",
    "answer_key": "answer",
    "train_dataset_key": "train",
    "images_folder": "images",
    "vocabs_folder": "vocabs",
}

_TEMPLATES = {
    "data_folder_missing_error": "Data folder {} for CLEVR is not present.",
    "question_json_file": "CLEVR_{}_questions.json",
    "vocab_file_template": "{}_{}_vocab.txt",
}


class CLEVRDataset(BaseDataset):
    """CLEVR reasoning dataset over rendered 3D-shape scenes."""

    def __init__(self, config, dataset_type, data_folder=None, *args,
                 **kwargs):
        super().__init__(_CONSTANTS["dataset_key"], config, dataset_type)
        self._data_folder = data_folder
        data_dir = config.get("data_dir", "")
        self._data_dir = (
            data_dir if os.path.isabs(data_dir)
            else os.path.join(get_mmf_root(), data_dir)
        )
        if not self._data_folder:
            self._data_folder = os.path.join(
                self._data_dir, config["data_folder"]
            )
        if not os.path.exists(self._data_folder):
            raise RuntimeError(
                _TEMPLATES["data_folder_missing_error"].format(
                    self._data_folder
                )
            )
        if config["data_folder"] in os.listdir(self._data_folder):
            self._data_folder = os.path.join(
                self._data_folder, config["data_folder"]
            )
        if len(os.listdir(self._data_folder)) == 0:
            raise FileNotFoundError(_CONSTANTS["empty_folder_error"])
        self.load()

    def load(self):
        self.image_path = os.path.join(
            self._data_folder, _CONSTANTS["images_folder"], self._dataset_type
        )
        with open(
            os.path.join(
                self._data_folder,
                _CONSTANTS["questions_folder"],
                _TEMPLATES["question_json_file"].format(self._dataset_type),
            )
        ) as f:
            self.questions = json.load(f)[_CONSTANTS["questions_key"]]
            if is_main():
                self._build_vocab(self.questions, _CONSTANTS["question_key"])
                self._build_vocab(self.questions, _CONSTANTS["answer_key"])
            synchronize()

    def __len__(self):
        return len(self.questions)

    def _get_vocab_path(self, attribute):
        return os.path.join(
            self._data_dir, _CONSTANTS["vocabs_folder"],
            _TEMPLATES["vocab_file_template"].format(
                self.dataset_name, attribute
            ),
        )

    def _build_vocab(self, questions, attribute):
        if self._dataset_type != _CONSTANTS["train_dataset_key"]:
            return
        vocab_file = self._get_vocab_path(attribute)
        if os.path.exists(vocab_file):
            return
        os.makedirs(os.path.dirname(vocab_file), exist_ok=True)
        sentences = [q[attribute] for q in questions]
        build_attributes = self.config.get("build_attributes", {})
        kwargs = {
            "min_count": build_attributes.get("min_count", 1),
            "keep": build_attributes.get("keep", [";", ","]),
            "remove": build_attributes.get("remove", ["?", "."]),
        }
        if attribute == _CONSTANTS["answer_key"]:
            kwargs["only_unk_extra"] = False
        vocab = VocabFromText(sentences, **kwargs)
        with open(vocab_file, "w") as f:
            f.write("\n".join(vocab.word_list))

    def __getitem__(self, idx):
        from PIL import Image

        data = self.questions[idx]
        current_sample = Sample()
        question = data["question"]
        tokens = tokenize(question, keep=[";", ","], remove=["?", "."])
        processed = self.text_processor({"tokens": tokens})
        current_sample.text = processed["text"]

        processed = self.answer_processor({"answers": [data["answer"]]})
        current_sample.answers = processed["answers"]
        current_sample.targets = processed["answers_scores"]

        image_path = os.path.join(self.image_path, data["image_filename"])
        image = np.true_divide(
            np.asarray(Image.open(image_path).convert("RGB")), 255
        ).astype(np.float32)
        current_sample.image = image.transpose(2, 0, 1)
        return current_sample
