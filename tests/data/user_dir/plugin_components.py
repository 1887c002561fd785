"""Plugin registered from outside the package via env.user_dir
(parity with reference tests/data/user_dir: a model + dataset registered
from a user plugin directory)."""
import flax.linen as nn
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from mmf_tpu.models.base_model import BaseModel


@registry.register_model("always_one")
class AlwaysOne(BaseModel):
    config: dict = None

    @nn.compact
    def __call__(self, sample_list, train=False):
        x = sample_list["data"]
        return {"scores": nn.Dense(1, name="classifier")(x) * 0 + 1.0}


@registry.register_model("plugin_linear")
class PluginLinear(BaseModel):
    """Trainable linear model for end-to-end CLI runs."""

    config: dict = None

    @nn.compact
    def __call__(self, sample_list, train=False):
        return {"scores": nn.Dense(1, name="classifier")(sample_list["data"])}


class PluginNumbers(BaseDataset):
    def __init__(self, dataset_type="train"):
        super().__init__("plugin_numbers", {}, dataset_type)

    def load_item(self, idx):
        s = Sample()
        s["id"] = np.int64(idx)
        s["data"] = np.full((2,), idx, np.float32)
        s["targets"] = np.ones((1,), np.float32)
        return s

    def __len__(self):
        return 16

    def format_for_prediction(self, report):
        scores = np.asarray(report["scores"]).reshape(-1)
        ids = np.asarray(report["id"]).reshape(-1)
        return [
            {"id": int(i), "answer": float(s)}
            for i, s in zip(ids.tolist(), scores.tolist())
        ]


@registry.register_builder("plugin_numbers")
class PluginNumbersBuilder(BaseDatasetBuilder):
    def __init__(self):
        super().__init__("plugin_numbers")

    @classmethod
    def config_path(cls):
        return None

    def build(self, config, dataset_type="train", *a, **kw):
        return

    def load(self, config, dataset_type="train", *a, **kw):
        return PluginNumbers(dataset_type)
