"""Masked-pretraining datasets over synthetic data: MLM/ITM sampling,
masked-region labels, and the detection stack (COCO-json, no pycocotools)."""

import json

import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()

VOCAB = "tests/data/vocab.txt"


def _masked_token_processor():
    return {
        "type": "masked_token",
        "params": {
            "max_seq_length": 16,
            "mask_probability": 0.15,
            "tokenizer_config": {
                "type": "bert-base-uncased",
                "vocab_file": VOCAB,
            },
        },
    }


@pytest.fixture(scope="module")
def caption_data(tmp_path_factory):
    """COCO-caption-format npy annotations + npy region features."""
    root = tmp_path_factory.mktemp("masked_data")
    feat_dir = root / "features"
    feat_dir.mkdir()
    rng = np.random.RandomState(3)
    entries = []
    for i in range(6):
        fp = f"{i:05d}.npy"
        np.save(feat_dir / fp, rng.randn(9, 32).astype(np.float32))
        entries.append(
            {
                "image_id": i,
                "image_name": f"{i:05d}",
                "feature_path": fp,
                "captions": [f"a red apple number {i}",
                             f"the color of item {i}"],
            }
        )
    np.save(root / "annotations.npy",
            np.array(entries, dtype=object), allow_pickle=True)
    return root


def _masked_coco_config(root, **over):
    cfg = {
        "data_dir": str(root),
        "use_images": False,
        "use_features": True,
        "annotations": {"train": [str(root / "annotations.npy")]},
        "features": {"train": [str(root / "features")]},
        "max_features": 9,
        "two_sentence": True,
        "two_sentence_probability": 0.5,
        "false_caption": True,
        "false_caption_probability": 0.5,
        "use_image_feature_masks": True,
        "processors": {
            "masked_token_processor": _masked_token_processor(),
            "masked_region_processor": {
                "type": "masked_region",
                "params": {"mask_probability": 0.15,
                           "mask_region_probability": 0.9},
            },
        },
    }
    cfg.update(over)
    return omega.create(cfg)


def test_masked_coco_dataset_item(caption_data):
    from mmf_tpu.datasets.builders.coco.masked_dataset import (
        MaskedCOCODataset,
    )

    ds = MaskedCOCODataset(_masked_coco_config(caption_data), "train")
    ds.init_processors()
    sample = ds[0]
    assert "input_ids" in sample and sample["input_ids"].shape == (16,)
    assert "lm_label_ids" in sample
    assert "image_labels" in sample  # masked-region labels
    assert sample["image_labels"].shape == (9,)
    assert "is_correct" in sample  # ITM target
    assert "image_feature_0" in sample


def test_masked_coco_single_sentence_mode(caption_data):
    from mmf_tpu.datasets.builders.coco.masked_dataset import (
        MaskedCOCODataset,
    )

    ds = MaskedCOCODataset(
        _masked_coco_config(caption_data, two_sentence=False), "train"
    )
    ds.init_processors()
    seen = {int(ds[i]["is_correct"]) for i in range(6) for _ in range(4)}
    # false_caption sampling must produce both matched and mismatched pairs
    assert seen == {0, 1}


@pytest.fixture(scope="module")
def vqa_style_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("masked_vqa_data")
    feat_dir = root / "features"
    feat_dir.mkdir()
    rng = np.random.RandomState(5)
    entries = []
    for i in range(4):
        fp = f"{i:05d}.npy"
        np.save(feat_dir / fp, rng.randn(7, 16).astype(np.float32))
        entries.append(
            {
                "image_id": i,
                "image_name": f"{i:05d}",
                "feature_path": fp,
                "question_id": 100 + i,
                "question_str": f"what color is the apple {i}",
                "all_answers": ["red", "green"],
            }
        )
    np.save(root / "annotations.npy",
            np.array(entries, dtype=object), allow_pickle=True)
    return root


def test_masked_vqa2_dataset_item(vqa_style_data):
    from mmf_tpu.datasets.builders.vqa2.masked_dataset import (
        MaskedVQA2Dataset,
    )

    root = vqa_style_data
    cfg = omega.create(
        {
            "data_dir": str(root),
            "use_images": False,
            "use_features": True,
            "add_answer": False,
            "annotations": {"train": [str(root / "annotations.npy")]},
            "features": {"train": [str(root / "features")]},
            "max_features": 7,
            "use_image_feature_masks": False,
            "processors": {
                "masked_token_processor": _masked_token_processor(),
            },
        }
    )
    ds = MaskedVQA2Dataset(cfg, "train")
    ds.init_processors()
    sample = ds[1]
    assert sample["input_ids"].shape == (16,)
    assert "segment_ids" in sample
    # question + answer -> both segments present
    assert sample["segment_ids"].max() == 1


@pytest.fixture(scope="module")
def detection_data(tmp_path_factory):
    """COCO instances JSON + images on disk."""
    from PIL import Image

    root = tmp_path_factory.mktemp("det_data")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(11)
    images, annotations = [], []
    ann_id = 1
    for i in range(3):
        fn = f"{i:06d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
        ).save(img_dir / fn)
        images.append({"id": i, "file_name": fn, "height": 80, "width": 100})
        for b in range(2):
            x, y, w, h = 5 + 10 * b, 6 + 8 * b, 30, 25
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": b + 1,
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    (root / "instances.json").write_text(json.dumps(coco))
    return root


def _detection_config(root):
    return omega.create(
        {
            "data_dir": str(root),
            "use_images": True,
            "use_features": False,
            "images": {"val": ["images"]},
            "annotations": {"val": ["instances.json"]},
            "load_attributes": False,
            "max_target_enc_size": 16382,
            "processors": {
                "detection_image_and_target_processor": {
                    "type": "detr_image_and_target",
                    "params": {
                        "train_image_sizes": [64],
                        "train_resize_random_sizes": [48, 64],
                        "train_crop_size": [32, 48],
                        "test_image_size": 64,
                        "max_size": 96,
                    },
                }
            },
        }
    )


def test_detection_coco_dataset(detection_data):
    from mmf_tpu.datasets.builders.coco.detection_dataset import (
        DetectionCOCODataset,
    )
    from mmf_tpu.utils.distributed import byte_tensor_to_object

    ds = DetectionCOCODataset(_detection_config(detection_data), "val")
    ds.init_processors()
    assert len(ds) == 3
    sample = ds[0]
    assert sample["image"].ndim == 3  # CHW float
    assert sample["orig_size"].tolist() == [80, 100]
    target = byte_tensor_to_object(sample["targets_enc"], max_size=16382)
    assert target["boxes"].shape == (2, 4)
    assert target["labels"].tolist() == [1, 2]
    # fixed-pad fields for the jitted DETR loss
    assert sample["labels"].shape[0] >= 2
    assert sample["labels"][:2].tolist() == [1, 2]
    assert (sample["labels"][2:] == -1).all()
    assert sample["boxes"].shape == (sample["labels"].shape[0], 4)
    # padded boxes are normalized cxcywh in [0, 1]
    assert 0.0 <= sample["boxes"][:2].min() and sample["boxes"][:2].max() <= 1.0


def test_detection_postprocess(detection_data):
    from mmf_tpu.datasets.builders.coco.detection_dataset import PostProcess

    B, Q, C = 2, 5, 4  # last class column = no-object
    rng = np.random.RandomState(0)
    outputs = {
        "pred_logits": rng.randn(B, Q, C).astype(np.float32),
        "pred_boxes": np.tile(
            np.array([0.5, 0.5, 0.2, 0.4], np.float32), (B, Q, 1)
        ),
    }
    sizes = np.array([[80, 100], [60, 50]], np.int64)
    results = PostProcess()(outputs, sizes)
    assert len(results) == 2
    # cxcywh (0.5,0.5,0.2,0.4) on 100x80 -> xyxy (40,24,60,56) — wait:
    # x: (0.5 +/- 0.1)*100 = 40..60 ; y: (0.5 +/- 0.2)*80 = 24..56
    np.testing.assert_allclose(
        results[0]["boxes"][0], [40.0, 24.0, 60.0, 56.0], atol=1e-4
    )
    assert results[0]["labels"].max() < C - 1  # no-object column dropped
