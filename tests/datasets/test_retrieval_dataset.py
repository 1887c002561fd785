"""Retrieval dataset: annotation parsers, train random-caption pairing,
eval caption fan-out (reference datasets/builders/retrieval)."""

import csv
import gzip
import json

import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()

VOCAB = "tests/data/vocab.txt"


@pytest.fixture(scope="module")
def flickr_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("retrieval")
    img_dir = root / "flickr30k_images"
    img_dir.mkdir()
    rng = np.random.RandomState(5)
    images = []
    for i, split in enumerate(["train", "train", "val", "test"]):
        fn = f"img_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(img_dir / fn)
        images.append(
            {
                "filename": fn,
                "split": split,
                "sentences": [
                    {"raw": f"sentence {j} about image {i}"} for j in range(5)
                ],
            }
        )
    (root / "dataset_flickr30k.json").write_text(
        json.dumps({"images": images})
    )
    # cc-style gzipped tsv
    with gzip.open(root / "cc.tsv.gz", "wt", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for i in range(3):
            w.writerow([f"a caption {i}", f"img_{i}.jpg"])
    return root


def _config(root, dataset_type="train", parser="flickr",
            annotation="dataset_flickr30k.json"):
    return omega.create(
        {
            "data_dir": str(root),
            "use_images": True,
            "use_features": False,
            "annotations_parser": parser,
            "images": {t: ["flickr30k_images"] for t in
                       ("train", "val", "test")},
            "annotations": {t: [annotation] for t in
                            ("train", "val", "test")},
            "processors": {
                "text_processor": {
                    "type": "bert_tokenizer",
                    "params": {
                        "max_seq_length": 12,
                        "tokenizer_config": {"type": "bert-base-uncased",
                                             "vocab_file": VOCAB},
                    },
                },
                "train_image_processor": {
                    "type": "torchvision_transforms",
                    "params": {"transforms": [
                        {"type": "Resize", "params": {"size": [32, 32]}},
                        "ToTensor",
                    ]},
                },
                "eval_image_processor": {
                    "type": "torchvision_transforms",
                    "params": {"transforms": [
                        {"type": "Resize", "params": {"size": [32, 32]}},
                        "ToTensor",
                    ]},
                },
            },
        }
    )


def _make(root, dataset_type, **kw):
    from mmf_tpu.datasets.builders.retrieval.builder import RetrievalDataset

    ds = RetrievalDataset(_config(root, dataset_type, **kw), dataset_type)
    ds.init_processors()
    return ds


def test_train_item_single_caption(flickr_data):
    ds = _make(flickr_data, "train")
    assert len(ds) == 2
    sample = ds[0]
    assert sample["input_ids"].shape == (12,)
    assert sample["image"].shape == (3, 32, 32)
    assert int(sample["ann_idx"]) == 0


def test_eval_item_fans_out_captions(flickr_data):
    ds = _make(flickr_data, "val")
    assert len(ds) == 1
    sample = ds[0]
    # all 5 captions stacked along a leading axis
    assert sample["input_ids"].shape == (5, 12)
    assert sample["text_index"].tolist() == [0, 1, 2, 3, 4]
    assert int(sample["image_index"]) == 0
    assert sample["image"].shape == (3, 32, 32)


def test_cc_parser(flickr_data):
    ds = _make(flickr_data, "train", parser="cc", annotation="cc.tsv.gz")
    assert len(ds) == 3
    assert ds.annotation_db.samples_factor == 1
    sample = ds[0]
    assert sample["input_ids"].shape == (12,)


def test_alignment_model_flattens_eval_fanout(flickr_data):
    import jax
    import jax.numpy as jnp

    from mmf_tpu.common.registry import registry

    mc = omega.create({
        "final_hidden_size": 16,
        "num_attention_heads": 2,
        "text_encoder": {"type": "transformer",
                         "params": {"hidden_size": 16, "num_hidden_layers": 1,
                                    "num_attention_heads": 2,
                                    "intermediate_size": 32,
                                    "vocab_size": 50}},
        "dtype": "float32",
    })
    model = registry.get_model_class("cm_shared_transformer")(config=mc)
    B, F, L = 2, 3, 8
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 50, (B, F, L))),
        "input_mask": jnp.ones((B, F, L), jnp.int32),
        "image_feature_0": jnp.asarray(rng.randn(B, 4, 16),
                                       jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 16)          # images
    assert out["targets"].shape == (B * F, 16)     # flattened texts


# --------------------------- visual dialog ---------------------------------
@pytest.fixture(scope="module")
def visdial_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("visdial")
    feat_dir = root / "features"
    feat_dir.mkdir()
    rng = np.random.RandomState(4)
    questions = [f"question number {i}" for i in range(6)]
    answers = [f"answer number {i}" for i in range(8)]
    dialogs = []
    for d in range(2):
        np.save(feat_dir / f"{d}.npy", rng.randn(5, 8).astype(np.float32))
        rounds = [
            {"question": (d + r) % 6, "answer": (d * 3 + r) % 8,
             "answer_options": list(range(8))[:4], "gt_index": r % 4}
            for r in range(10)
        ]
        dialogs.append({"image_id": d, "caption": f"a photo {d}",
                        "dialog": rounds})
    (root / "visdial.json").write_text(json.dumps({
        "split": "train",
        "data": {"questions": questions, "answers": answers,
                 "dialogs": dialogs},
    }))
    return root


def _visdial_config(root, **over):
    cfg = {
        "data_dir": str(root),
        "use_images": False,
        "use_features": False,
        "annotations": {"train": ["visdial.json"]},
        "return_history": True,
        "discriminative": {"enabled": False, "num_options": 4},
        "processors": {
            "text_processor": {
                "type": "bert_tokenizer",
                "params": {
                    "max_seq_length": 24,
                    "tokenizer_config": {"type": "bert-base-uncased",
                                         "vocab_file": VOCAB},
                },
            },
        },
    }
    cfg.update(over)
    return omega.create(cfg)


def test_visual_dialog_rounds_and_history(visdial_data):
    from mmf_tpu.datasets.builders.visual_dialog.builder import (
        VisualDialogDataset,
    )

    ds = VisualDialogDataset(_visdial_config(visdial_data), "train")
    ds.init_processors()
    assert len(ds) == 20  # 2 dialogs x 10 rounds
    s0 = ds[0]
    assert s0["input_ids"].shape == (24,)
    assert int(s0["round_id"]) == 0
    s5 = ds[15]
    assert int(s5["dialog_id"]) == 1 and int(s5["round_id"]) == 5


def test_visual_dialog_discriminative_options(visdial_data):
    from mmf_tpu.datasets.builders.visual_dialog.builder import (
        VisualDialogDataset,
    )

    ds = VisualDialogDataset(
        _visdial_config(visdial_data,
                        discriminative={"enabled": True, "num_options": 4}),
        "train",
    )
    ds.init_processors()
    s = ds[3]
    assert s["option_input_ids"].shape == (4, 24)
    assert 0 <= int(s["targets"]) < 4
