"""CLEVR dataset (parity with mmf/datasets/builders/clevr/dataset.py):
synthetic 3D-scene reasoning. Questions come from per-split
``CLEVR_<split>_questions.json``; vocabularies for questions and answers
are built once from the train split and cached under ``vocabs/``."""

from __future__ import annotations

import json
import os

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.utils.distributed import is_main, synchronize
from mmf_tpu.utils.general import get_mmf_root
from mmf_tpu.utils.text import VocabFromText, tokenize


class CLEVRDataset(BaseDataset):
    def __init__(self, config, dataset_type, data_folder=None, *args,
                 **kwargs):
        super().__init__("clevr", config, dataset_type)
        data_dir = config.get("data_dir", "")
        if not os.path.isabs(data_dir):
            data_dir = os.path.join(get_mmf_root(), data_dir)
        self._data_dir = data_dir

        folder = data_folder or os.path.join(data_dir, config["data_folder"])
        if not os.path.exists(folder):
            raise RuntimeError(
                f"Data folder {folder} for CLEVR is not present."
            )
        # archives sometimes extract into a nested directory of the same name
        if config["data_folder"] in os.listdir(folder):
            folder = os.path.join(folder, config["data_folder"])
        if not os.listdir(folder):
            raise FileNotFoundError("CLEVR dataset folder is empty.")
        self._data_folder = folder
        self.load()

    def load(self):
        split = self._dataset_type
        self.image_path = os.path.join(self._data_folder, "images", split)
        questions_json = os.path.join(
            self._data_folder, "questions",
            f"CLEVR_{split}_questions.json",
        )
        with open(questions_json) as f:
            self.questions = json.load(f)["questions"]
        if is_main():
            for attribute in ("question", "answer"):
                self._build_vocab(self.questions, attribute)
        synchronize()

    def __len__(self):
        return len(self.questions)

    def _get_vocab_path(self, attribute):
        return os.path.join(
            self._data_dir, "vocabs",
            f"{self.dataset_name}_{attribute}_vocab.txt",
        )

    def _build_vocab(self, questions, attribute):
        # only the train split defines the vocabulary
        if self._dataset_type != "train":
            return
        vocab_file = self._get_vocab_path(attribute)
        if os.path.exists(vocab_file):
            return
        os.makedirs(os.path.dirname(vocab_file), exist_ok=True)

        opts = self.config.get("build_attributes", {})
        vocab = VocabFromText(
            [q[attribute] for q in questions],
            min_count=opts.get("min_count", 1),
            keep=opts.get("keep", [";", ","]),
            remove=opts.get("remove", ["?", "."]),
            only_unk_extra=False,
        )
        with open(vocab_file, "w") as f:
            f.write("\n".join(vocab.word_list))

    def __getitem__(self, idx):
        from PIL import Image

        data = self.questions[idx]
        sample = Sample()

        tokens = tokenize(data["question"], keep=[";", ","],
                          remove=["?", "."])
        sample.text = self.text_processor({"tokens": tokens})["text"]

        answers = self.answer_processor({"answers": [data["answer"]]})
        sample.answers = answers["answers"]
        sample.targets = answers["answers_scores"]

        img = Image.open(
            os.path.join(self.image_path, data["image_filename"])
        ).convert("RGB")
        sample.image = (
            np.asarray(img, np.float32) / 255.0
        ).transpose(2, 0, 1)
        return sample
