"""Convert GQA question json + object/spatial h5 features to the imdb npy
layout the gqa builder reads (parity with
tools/scripts/gqa/convert_gqa_to_vqa.py in the reference).

h5py is optional in this image; feature extraction is gated behind it
with a clear error, while the question->imdb conversion is pure json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
from mmf_tpu.utils.text import tokenize  # noqa: E402


def merge_train(train_q_dir: str):
    merged = {}
    for file_name in sorted(os.listdir(train_q_dir)):
        merged.update(json.load(open(os.path.join(train_q_dir, file_name))))
    save_dir = os.path.abspath(os.path.join(train_q_dir, os.pardir))
    out = os.path.join(save_dir, "train_all_questions.json")
    with open(out, "w") as f:
        json.dump(merged, f)
    return out


def get_objects(semantic_str: str):
    result = []
    for match in re.findall(r"\(([^)]+)", semantic_str):
        if "," in match:
            result += [int(x) for x in match.split(",") if x.strip().isdigit()]
        elif match.isdigit():
            result.append(int(match))
    return result


def get_imdb(file_path: str) -> np.ndarray:
    imdb = [{"dataset_name": "gqa"}]
    questions = json.load(open(file_path))
    for qid, item in questions.items():
        entry = {
            "image_name": item["imageId"] + ".jpg",
            "image_id": item["imageId"],
            "feature_path": item["imageId"] + ".npy",
            "question_id": qid,
            "question_str": item["question"],
            "question_tokens": tokenize(item["question"]),
        }
        if "answer" in item:
            entry["all_answers"] = [item["answer"]] * 10
            entry["valid_answers"] = [item["answer"]] * 10
            entry["semantic_string"] = item.get("semanticStr")
            entry["gt_object_ids"] = get_objects(item.get("semanticStr", ""))
            entry["meta_data"] = item.get("types")
        imdb.append(entry)
    return np.array(imdb, dtype=object)


def _h5py():
    try:
        import h5py
        return h5py
    except ImportError as e:
        raise RuntimeError(
            "GQA feature extraction reads the released h5 shards and needs "
            "h5py; install it or convert features elsewhere"
        ) from e


def extract_bbox_feats(feat_dir: str, out_dir: str):
    h5py = _h5py()
    info = json.load(open(os.path.join(feat_dir, "gqa_objects_info.json")))
    by_file = {}
    for image_id, meta in info.items():
        by_file.setdefault(meta["file"], []).append((image_id, meta))
    os.makedirs(out_dir, exist_ok=True)
    for i, entries in sorted(by_file.items()):
        with h5py.File(os.path.join(feat_dir, f"gqa_objects_{i}.h5")) as db:
            for image_id, meta in entries:
                np.save(
                    os.path.join(out_dir, f"{image_id}.npy"),
                    {
                        "image_id": image_id,
                        "boxes": np.asarray(db["bboxes"][meta["idx"]]),
                        "feats": np.asarray(db["features"][meta["idx"]]),
                        "height": meta["height"],
                        "width": meta["width"],
                        "n_objects": meta["objectsNum"],
                    },
                )


def extract_spatial_feats(feat_dir: str, out_dir: str):
    h5py = _h5py()
    info = json.load(open(os.path.join(feat_dir, "gqa_spatial_info.json")))
    by_file = {}
    for image_id, meta in info.items():
        by_file.setdefault(meta["file"], []).append((image_id, meta))
    os.makedirs(out_dir, exist_ok=True)
    for i, entries in sorted(by_file.items()):
        with h5py.File(os.path.join(feat_dir, f"gqa_spatial_{i}.h5")) as db:
            for image_id, meta in entries:
                feat = np.asarray(db["features"][meta["idx"]])
                # gqa_spatial stores CHW (2048,7,7): PERMUTE to HWC — a
                # reshape would reinterpret the buffer and scramble the
                # channel/position layout
                np.save(os.path.join(out_dir, f"{image_id}.npy"),
                        feat.transpose(1, 2, 0)[None])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", required=True,
                        choices=["merge_train", "imdb", "bbox_feats",
                                 "spatial_feats"])
    parser.add_argument("--input", required=True,
                        help="questions dir/json or features dir")
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.mode == "merge_train":
        print(merge_train(args.input))
    elif args.mode == "imdb":
        imdb = get_imdb(args.input)
        base = os.path.splitext(os.path.basename(args.input))[0]
        out = os.path.join(args.out_dir, f"imdb_{base}.npy")
        np.save(out, imdb, allow_pickle=True)
        print(f"{len(imdb) - 1} entries -> {out}")
    elif args.mode == "bbox_feats":
        extract_bbox_feats(args.input, args.out_dir)
    else:
        extract_spatial_feats(args.input, args.out_dir)


if __name__ == "__main__":
    main()
