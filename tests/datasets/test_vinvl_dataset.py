"""VinVL tag-augmented dataset: base-dataset delegation, label-map tag
strings, random caption/label draws, contrastive corruption, and an
end-to-end VinVL-model train step on synthetic data (VERDICT r1 item 4;
reference mmf/datasets/builders/vinvl/dataset.py:12-110)."""

import json

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample, SampleList
from mmf_tpu.config import omega
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from mmf_tpu.utils.env import setup_imports

setup_imports()

VOCAB = "tests/data/vocab.txt"
N = 6


class VinVLBaseStub(BaseDataset):
    """Synthetic base dataset: raw caption text + region features +
    detected object/attribute class ids."""

    def __init__(self, dataset_type="train"):
        super().__init__("vinvl_base_stub", {}, dataset_type)
        self._rng = np.random.RandomState(7)
        self._feats = self._rng.randn(N, 5, 16).astype(np.float32)

    def load_item(self, idx):
        s = Sample()
        s["text"] = f"a photo of item number {idx}"
        s["image_feature_0"] = self._feats[idx]
        s["image_info_0"] = {"labels": [1, 2], "attr_labels": [3]}
        s["targets"] = np.eye(4, dtype=np.float32)[idx % 4]
        return s

    def __len__(self):
        return N


if registry.get_builder_class("vinvl_base_stub") is None:

    @registry.register_builder("vinvl_base_stub")
    class VinVLBaseStubBuilder(BaseDatasetBuilder):
        def __init__(self):
            super().__init__("vinvl_base_stub")

        def build(self, config, dataset_type="train", *a, **kw):
            return

        def load(self, config, dataset_type="train", *a, **kw):
            return VinVLBaseStub(dataset_type)


@pytest.fixture(scope="module")
def vinvl_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("vinvl")
    with open(root / "ann.jsonl", "w") as f:
        for i in range(N):
            f.write(json.dumps({"id": i}) + "\n")
    label_map = {
        "idx_to_label": {"1": "dog", "2": "cat"},
        "idx_to_attribute": {"3": "red"},
    }
    (root / "label_map.json").write_text(json.dumps(label_map))
    return root


def _vinvl_config(root, dataset_type="train", **processor_over):
    params = {
        "tokenizer_config": {"type": "bert-base-uncased",
                             "vocab_file": VOCAB},
        "max_seq_length": 24,
        "mask_probability": 0.15,
        "corrupt_probability": 0,
        **processor_over,
    }
    return omega.create(
        {
            "data_dir": str(root),
            "use_images": False,
            "use_features": False,
            "base_dataset_name": "vinvl_base_stub",
            "label_map": str(root / "label_map.json"),
            "annotations": {dataset_type: [str(root / "ann.jsonl")]},
            "base_dataset": {
                "data_dir": str(root),
                "use_images": False,
                "use_features": False,
                "annotations": {dataset_type: [str(root / "ann.jsonl")]},
                "processors": {},
            },
            "processors": {
                "text_processor": {
                    "type": "vinvl_text_tokenizer",
                    "params": params,
                }
            },
        }
    )


def _load(config, dataset_type="train"):
    builder_cls = registry.get_builder_class("vinvl")
    builder = builder_cls()
    return builder.load_dataset(config, dataset_type)


def test_vinvl_dataset_augments_base_samples(vinvl_data):
    # mask_probability=0 so the tag tokens are deterministically visible
    dataset = _load(_vinvl_config(vinvl_data, mask_probability=0))
    assert len(dataset) == N
    sample = dataset[2]
    # base fields survive
    assert sample["text"] is not None
    np.testing.assert_allclose(
        sample["image_feature_0"],
        VinVLBaseStub().load_item(2)["image_feature_0"],
    )
    # tokenized pair: caption (segment 0) + tags (segment 1)
    assert sample["input_ids"].shape == (24,)
    assert sample["input_ids_masked"].shape == (24,)
    assert sample["segment_ids"].max() == 1
    # tag string drawn through the label map
    tags = [t for t in sample["tokens_masked"] if t in
            ("dog", "cat", "red")]
    assert set(tags) == {"dog", "cat", "red"}


def test_vinvl_test_split_skips_tags(vinvl_data):
    dataset = _load(_vinvl_config(vinvl_data, dataset_type="test"), "test")
    sample = dataset[0]
    # no tags at test time -> single-segment input
    assert sample["segment_ids"].max() == 0


def test_vinvl_contrastive_corruption(vinvl_data):
    dataset = _load(
        _vinvl_config(vinvl_data, corrupt_probability=1.0,
                      corrupt_caption_probability=0.5)
    )
    np.random.seed(0)
    labels = set()
    for _ in range(12):
        sample = dataset[1]
        assert sample["input_ids_corrupt"].shape == (24,)
        assert sample["input_mask_corrupt"].shape == (24,)
        assert sample["segment_ids_corrupt"].shape == (24,)
        labels.add(int(sample["contrastive_label"]))
        assert int(sample["contrastive_labels"]) == int(
            sample["contrastive_label"]
        )
    # corruption probability 1 -> label is never 0, both corruption kinds
    # appear over 12 draws at p=0.5
    assert labels == {1, 2}


def test_vinvl_model_trains_a_step_on_dataset(vinvl_data):
    """The parity-tested VinVL model consumes a real batch from the
    dataset and takes one optimizer step (the r1 gap: model without a
    data path)."""
    import jax

    from mmf_tpu.config.configuration import load_yaml
    from mmf_tpu.modules.losses import Losses
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.trainers.core.train_state import (
        create_train_state,
        make_train_step,
    )

    dataset = _load(_vinvl_config(vinvl_data))
    samples = [dataset[i] for i in range(4)]
    batch = SampleList(samples)

    cfg = load_yaml("configs/models/vinvl/defaults.yaml")
    mc = cfg["model_config"]["vinvl"]
    mc.update(
        {
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "num_labels": 4,
            "max_position_embeddings": 64,
        }
    )
    model_cls = registry.get_model_class("vinvl")
    model = model_cls(config=mc)

    feed = {
        "input_ids": np.stack([s["input_ids"] for s in samples]),
        "input_mask": np.stack([s["input_mask"] for s in samples]),
        "segment_ids": np.stack([s["segment_ids"] for s in samples]),
        "image_feature_0": np.stack(
            [s["image_feature_0"] for s in samples]
        ),
        "targets": np.stack([s["targets"] for s in samples]),
    }
    meta = {"dataset_name": "vinvl", "dataset_type": "train"}
    variables = model.init(jax.random.PRNGKey(0), dict(feed, **meta), False)
    losses = Losses([{"type": "logit_bce"}])
    tx = build_optimizer_transform(
        {"optimizer": {"type": "adam_w", "params": {"lr": 1e-3}},
         "training": {"max_updates": 4}},
        max_grad_norm=1.0,
    )
    step = make_train_step(model.apply, losses, tx, update_frequency=1,
                           meta=meta)
    state = create_train_state(variables, tx, jax.random.PRNGKey(1))
    new_state, report = jax.jit(step, donate_argnums=(0,))(state, feed)
    assert np.isfinite(float(report["total_loss"]))
    assert int(new_state.step) == 1
