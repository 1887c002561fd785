"""End-to-end dataset stack tests: synthetic hateful-memes data on disk ->
annotation db -> image db -> processors -> MMFDataset -> batches."""

import json
import os

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()


@pytest.fixture(scope="module")
def hm_data(tmp_path_factory):
    """Create a synthetic hateful-memes layout: jsonl + images + vocab."""
    from PIL import Image

    root = tmp_path_factory.mktemp("hm_data")
    img_dir = root / "images" / "img"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(7)
    entries = []
    texts = ["a funny meme", "a mean meme about dogs", "cats are great",
             "this is fine", "totally harmless joke", "bad meme here",
             "wholesome content", "questionable humor"]
    for i in range(16):
        img = Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        )
        img.save(img_dir / f"{i:05d}.png")
        entries.append(
            {"id": i, "img": f"img/{i:05d}.png", "label": i % 2,
             "text": texts[i % len(texts)]}
        )
    for split in ("train", "dev", "test"):
        with open(root / f"{split}.jsonl", "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")
    vocab = ["<pad>", "<s>", "</s>", "<unk>"] + sorted(
        {w for t in texts for w in t.split()}
    )
    (root / "vocab.txt").write_text("\n".join(vocab))
    return root


def _hm_config(root):
    return omega.create(
        {
            "data_dir": str(root),
            "use_images": True,
            "use_features": False,
            "annotations": {
                "train": [str(root / "train.jsonl")],
                "val": [str(root / "dev.jsonl")],
                "test": [str(root / "test.jsonl")],
            },
            "images": {
                "train": [str(root / "images")],
                "val": [str(root / "images")],
                "test": [str(root / "images")],
            },
            "max_features": 100,
            "processors": {
                "text_processor": {
                    "type": "vocab",
                    "params": {
                        "max_length": 8,
                        "vocab": {
                            "type": "random",
                            "vocab_file": str(root / "vocab.txt"),
                            "embedding_dim": 16,
                        },
                        "preprocessor": {"type": "simple_sentence",
                                         "params": {}},
                    },
                },
                "image_processor": {
                    "type": "torchvision_transforms",
                    "params": {
                        "transforms": [
                            {"type": "Resize", "params": {"size": [32, 32]}},
                            "ToTensor",
                        ]
                    },
                },
            },
        }
    )


def test_hateful_memes_image_dataset(hm_data):
    from mmf_tpu.datasets.builders.hateful_memes.dataset import (
        HatefulMemesImageDataset,
    )

    cfg = _hm_config(hm_data)
    ds = HatefulMemesImageDataset(cfg, "train")
    ds.init_processors()
    assert len(ds) == 16
    sample = ds[0]
    assert sample.image.shape == (3, 32, 32)
    assert sample.text.shape == (8,)
    assert int(sample.targets) in (0, 1)


def test_hateful_memes_through_loader(hm_data):
    from mmf_tpu.common.batch_collator import BatchCollator
    from mmf_tpu.datasets.builders.hateful_memes.dataset import (
        HatefulMemesImageDataset,
    )
    from mmf_tpu.datasets.loader import DataLoader

    cfg = _hm_config(hm_data)
    ds = HatefulMemesImageDataset(cfg, "train")
    ds.init_processors()
    loader = DataLoader(
        ds, batch_size=4,
        collate_fn=BatchCollator("hateful_memes", "train"),
        num_workers=0,
    )
    batch = next(iter(loader))
    assert batch.image.shape == (4, 3, 32, 32)
    assert batch.text.shape == (4, 8)
    assert batch.targets.shape == (4,)
    assert batch.dataset_name == "hateful_memes"


def test_annotation_database_jsonl(hm_data):
    from mmf_tpu.datasets.databases.annotation_database import (
        AnnotationDatabase,
    )

    db = AnnotationDatabase({}, str(hm_data / "train.jsonl"))
    assert len(db) == 16
    assert db[0]["id"] == 0


def test_features_database_npy(tmp_path):
    from mmf_tpu.datasets.databases.features_database import FeaturesDatabase

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.RandomState(0)
    np.save(feat_dir / "00001.npy", rng.randn(7, 16).astype(np.float32))
    db = FeaturesDatabase(
        omega.create({"max_features": 10, "return_features_info": True}),
        str(feat_dir),
    )
    item = db.from_path("00001.npy")
    assert item["image_feature_0"].shape == (10, 16)
    assert int(item["image_info_0"]["max_features"]) == 7
    # padded rows must be zero
    assert item["image_feature_0"][7:].sum() == 0


def test_split_train(hm_data):
    from mmf_tpu.datasets.builders.hateful_memes.builder import (
        HatefulMemesBuilder,
    )

    cfg = _hm_config(hm_data)
    with omega.open_dict(cfg):
        cfg["split_train"] = {"val": 0.25, "seed": 1}
    builder = HatefulMemesBuilder()
    train = builder.load(cfg, "train")
    val = builder.load(cfg, "val")
    assert len(val) == 4
    assert len(train) == 12
