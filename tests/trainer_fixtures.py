"""Test fixtures mirroring the reference's tests/test_utils.py pattern:
a synthetic NumbersDataset + a registered SimpleModel driving the REAL
trainer for loop-accounting tests."""

from __future__ import annotations

import flax.linen as nn
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.config import omega
from mmf_tpu.config.configuration import Configuration
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from mmf_tpu.models.base_model import BaseModel

DATA_ITEM_KEY = "data"


if registry.get_model_class("simple_model") is None:

    @registry.register_model("simple_model")
    class SimpleModel(BaseModel):
        """Linear regression model (reference tests/test_utils.py:194)."""

        config: dict = None

        @nn.compact
        def __call__(self, sample_list, train=False):
            size = self.config.get("in_dim", 1) if self.config else 1
            x = sample_list[DATA_ITEM_KEY]
            scores = nn.Dense(size, name="classifier")(x)
            return {"scores": scores}


class NumbersDataset(BaseDataset):
    """i -> (x=i*ones, y=x) identity regression
    (reference tests/test_utils.py:167)."""

    def __init__(self, num_examples=100, data_item_key=DATA_ITEM_KEY,
                 dataset_type="train", in_dim=1):
        super().__init__("numbers", {}, dataset_type)
        self.num_examples = num_examples
        self.data_item_key = data_item_key
        self.in_dim = in_dim

    def load_item(self, idx):
        s = Sample()
        s[self.data_item_key] = np.full((self.in_dim,), idx, np.float32)
        s["targets"] = np.full((self.in_dim,), idx, np.float32)
        return s

    def __len__(self):
        return self.num_examples


if registry.get_builder_class("numbers") is None:

    @registry.register_builder("numbers")
    class NumbersDatasetBuilder(BaseDatasetBuilder):
        def __init__(self):
            super().__init__("numbers")
            self.num_examples = 100
            self.in_dim = 1

        @classmethod
        def config_path(cls):
            return None

        def build(self, config, dataset_type="train", *args, **kwargs):
            return

        def load(self, config, dataset_type="train", *args, **kwargs):
            num = (config or {}).get("num_examples", self.num_examples)
            in_dim = (config or {}).get("in_dim", self.in_dim)
            return NumbersDataset(num, dataset_type=dataset_type, in_dim=in_dim)


def make_config(**overrides):
    opts = [
        "model=simple_model",
        "datasets=numbers",
        "training.batch_size=8",
        "training.max_updates=6",
        "training.max_epochs=null",
        "training.log_interval=2",
        "training.checkpoint_interval=1000000",
        "training.evaluation_interval=1000000",
        "training.num_workers=0",
        "training.seed=1",
        "optimizer.type=sgd",
        "optimizer.params.lr=0.00001",
        "run_type=train",
    ]
    for k, v in overrides.items():
        opts.append(f"{k}={v}")
    config = Configuration(opts).get_config()
    with omega.open_dict(config):
        config["model_config"]["simple_model"] = {
            "in_dim": 1,
            "losses": [{"type": "mse"}],
        }
        config["dataset_config"]["numbers"] = {
            "num_examples": overrides.get("num_examples", 100),
            "in_dim": 1,
        }
        for k, v in overrides.items():
            if k.startswith("model_config") or k.startswith("dataset_config"):
                continue
        config["env"]["save_dir"] = overrides.get(
            "save_dir", "/tmp/mmf_tpu_test_save"
        )
    registry.register("config", config)
    return config


def make_trainer(**overrides):
    from mmf_tpu.trainers.mmf_trainer import build_trainer

    config = make_config(**overrides)
    trainer = build_trainer(config)
    trainer.load()
    return trainer
