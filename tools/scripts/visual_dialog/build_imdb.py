"""Build the VisDial imdb npy from the released visdial jsons
(parity with tools/scripts/visual_dialog/build_imdb.py in the reference).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
from mmf_tpu.utils.text import tokenize  # noqa: E402


class IMDBBuilder:
    def __init__(self, args=None):
        self.args = args or self.get_args()

    def get_args(self):
        parser = argparse.ArgumentParser("Build IMDB for VisDial")
        parser.add_argument("-o", "--out_file", type=str, default="./imdb.npy")
        parser.add_argument("-i", "--image_root", type=str, default="./COCO",
                            help="Directory with per-split COCO feature npys")
        parser.add_argument("-v", "--version", type=float, default=0.9)
        parser.add_argument("-d", "--data_dir", type=str, default="./visdial",
                            help="Directory containing visdial jsons")
        parser.add_argument("-s", "--set_type", type=str, default="train",
                            choices=["train", "val", "test"])
        return parser.parse_args()

    def get_id_to_path_dict(self):
        id2path = {}
        pattern = os.path.join(self.args.image_root, "*", "*.npy")
        for image_path in glob.iglob(pattern):
            path = "/".join(image_path.split("/")[-2:])
            image_id = int(image_path[-16:-4])
            id2path[image_id] = path
        return id2path

    def load_json(self):
        name = f"visdial_{self.args.version}_{self.args.set_type}.json"
        with open(os.path.join(self.args.data_dir, name)) as f:
            return json.load(f)["data"]

    def build(self):
        data = self.load_json()
        id2path = self.get_id_to_path_dict()
        questions = data["questions"]
        answers = data["answers"]

        imdb = [{"dataset_name": "visual_dialog",
                 "version": self.args.version}]
        for dialog in data["dialogs"]:
            image_id = dialog["image_id"]
            entry = {
                "image_id": image_id,
                "feature_path": id2path.get(image_id),
                "caption": dialog["caption"],
                "caption_tokens": tokenize(dialog["caption"]),
                "dialog": [
                    {
                        "question": questions[turn["question"]],
                        "question_tokens": tokenize(
                            questions[turn["question"]]
                        ),
                        "answer": answers[turn["answer"]]
                        if "answer" in turn else None,
                        "answer_options": turn.get("answer_options"),
                        "gt_index": turn.get("gt_index"),
                    }
                    for turn in dialog["dialog"]
                ],
            }
            imdb.append(entry)

        np.save(self.args.out_file, np.array(imdb, dtype=object),
                allow_pickle=True)
        print(f"{len(imdb) - 1} dialogs -> {self.args.out_file}")


if __name__ == "__main__":
    IMDBBuilder().build()
