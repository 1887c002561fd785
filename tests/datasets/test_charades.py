"""Charades frames-edition dataset over a synthetic layout."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()


@pytest.fixture(scope="module")
def charades_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("charades")
    rng = np.random.RandomState(0)
    (root / "frames").mkdir()
    with open(root / "train.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "script", "actions"])
        w.writeheader()
        for i in range(3):
            vid = f"VID{i:03d}"
            (root / "frames" / vid).mkdir()
            for j in range(20):
                Image.fromarray(
                    rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
                ).save(root / "frames" / vid / f"{j:04d}.jpg")
            w.writerow({"id": vid, "script": f"someone does thing {i}",
                        "actions": "c092 11.9 21.2;c147 0.0 12.6"})
        w.writerow({"id": "MISSING", "script": "gone",
                    "actions": "c092 0 1"})
    (root / "classes.txt").write_text(
        "c092 someone is cooking\nc147 someone runs\nc001 someone sits\n"
    )
    return root


def _config(root):
    return omega.create({
        "data_dir": str(root),
        "frames_per_clip": 8,
        "classes_file": "classes.txt",
        "annotations": {"train": ["train.csv"]},
        "videos": {"train": ["frames"]},
        "processors": {
            "text_processor": {"type": "bert_tokenizer", "params": {
                "max_seq_length": 12,
                "tokenizer_config": {"type": "bert-base-uncased",
                                     "vocab_file": "tests/data/vocab.txt"}}},
            "video_processor": {"type": "video_transforms", "params": {
                "transforms": [
                    {"type": "video_resize", "params": {"size": 32}},
                    "video_to_tensor"]}},
        }})


def test_charades_items(charades_data):
    from mmf_tpu.datasets.builders.charades.dataset import CharadesDataset

    ds = CharadesDataset(_config(charades_data), "train")
    ds.init_processors()
    assert len(ds) == 3  # MISSING (no frames dir) skipped
    s = ds[0]
    assert s["video"].shape == (8, 3, 32, 32)
    # classes sorted: [c001, c092, c147]; actions c092+c147 -> [0,1,1]
    assert s["targets"].tolist() == [0.0, 1.0, 1.0]
    assert s["input_ids"].shape == (12,)


def test_charades_prediction_format(charades_data):
    from mmf_tpu.datasets.builders.charades.dataset import CharadesDataset

    ds = CharadesDataset(_config(charades_data), "train")
    pred = ds.format_for_prediction(
        {"scores": np.array([[5.0, -5.0, 4.0]]), "id": np.array([0])}
    )
    assert pred == [{"id": 0, "labels": ["c001", "c147"]}]


def test_charades_empty_frames_dir_errors(tmp_path):
    from mmf_tpu.datasets.builders.charades.dataset import CharadesDataset

    (tmp_path / "frames").mkdir()
    with open(tmp_path / "train.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "script", "actions"])
        w.writeheader()
        w.writerow({"id": "X", "script": "s", "actions": ""})
    (tmp_path / "classes.txt").write_text("c001 x\n")
    with pytest.raises(RuntimeError, match="decode videos offline"):
        CharadesDataset(_config(tmp_path), "train")
