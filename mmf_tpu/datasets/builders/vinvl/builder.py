"""VinVL tag-augmented dataset + builder (parity with
mmf/datasets/builders/vinvl/dataset.py:12-110 and builder.py:14-87).

VinVL (Oscar+) augments an *existing* MMF dataset: every sample from the
base dataset gains object-detection tag text (``text_b``) and — during
pretraining — randomly drawn captions/labels so the vinvl text processor
can emit contrastive-corruption inputs. The builder therefore instantiates
two datasets: the configured base dataset, and the VinVL wrapper that
delegates item loading to it.

Config contract (configs/datasets/vinvl/defaults.yaml):
  base_dataset_name: vqa2
  label_map: <path to {idx_to_label, idx_to_attribute} json>
  base_dataset: ${dataset_config.vqa2}
  processors.text_processor.type: vinvl_text_tokenizer
"""

import json
import random

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class VinVLDataset(MMFDataset):
    """Wraps a base dataset; returns its samples augmented with OD-tag
    strings and random caption/label draws for the vinvl tokenizer."""

    def __init__(self, config, dataset_type, index=0, *args, **kwargs):
        name = kwargs.pop("name", None) or kwargs.pop(
            "dataset_name", None
        ) or "vinvl"
        super().__init__(name, config, dataset_type, index, *args, **kwargs)
        # tags/corruption only augment train/val items
        self.add_tags = self._dataset_type != "test"
        self.label_map = self.load_label_map(config.get("label_map"))
        self.base_dataset = None

    def set_base_dataset(self, base_dataset):
        self.base_dataset = base_dataset

    def __len__(self):
        return len(self.annotation_db)

    def __getitem__(self, idx):
        return self.load_item(idx)

    def load_item(self, idx):
        base_sample = self.base_dataset.load_item(idx)
        # base datasets must expose the raw caption under "text"
        text_processor_argument = {"text": base_sample["text"]}
        if self.add_tags:
            text_processor_argument["text_b"] = self.get_label_str(base_sample)
            rand_cap_idx = random.randint(0, len(self.annotation_db) - 1)
            rand_cap_sample = self.base_dataset.load_item(rand_cap_idx)
            text_processor_argument["random_captions"] = [
                rand_cap_sample["text"]
            ]
            rand_lab_idx = random.randint(0, len(self.annotation_db) - 1)
            rand_lab_sample = self.base_dataset.load_item(rand_lab_idx)
            text_processor_argument["random_labels"] = [
                self.get_label_str(rand_lab_sample)
            ]
        processed = self.text_processor(text_processor_argument)
        base_sample.update(processed)
        return base_sample

    def load_label_map(self, map_path):
        if map_path is None:
            return {}
        with open(map_path) as f:
            return json.load(f)

    def get_label_str(self, sample):
        """Detected object + attribute class ids -> space-joined label
        text via the VG label map."""
        image_info = sample.get("image_info_0", {}) or {}
        label_map = self.label_map.get("idx_to_label", {})
        label_str = " ".join(
            label_map.get(str(int(i)), "")
            for i in image_info.get("labels", [])
        )
        attr_map = self.label_map.get("idx_to_attribute", {})
        attr_str = " ".join(
            attr_map.get(str(int(i)), "")
            for i in image_info.get("attr_labels", [])
        )
        return label_str + " " + attr_str


@registry.register_builder("vinvl")
class VinVLBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="vinvl", dataset_class=VinVLDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/vinvl/defaults.yaml"

    def load(self, config, dataset_type, *args, **kwargs):
        """Build the base dataset, then the VinVL wrapper around it
        (reference vinvl/builder.py:26-87): the wrapper reuses the base
        dataset's config (so annotation/feature DB paths line up) but
        swaps in the vinvl text processor and the label map."""
        base_dataset_name = config.get("base_dataset_name", "vqa2")
        base_dataset_config = config.get("base_dataset", config)

        base_builder_class = registry.get_builder_class(base_dataset_name)
        assert base_builder_class is not None, (
            f"No builder registered for VinVL base dataset "
            f"'{base_dataset_name}'"
        )
        base_builder = base_builder_class()
        base_builder.build_dataset(base_dataset_config, dataset_type)
        base_dataset = base_builder.load_dataset(
            base_dataset_config, dataset_type
        )
        if hasattr(base_builder, "update_registry_for_model"):
            base_builder.update_registry_for_model(base_dataset_config)

        vinvl_text_processor = config["processors"]["text_processor"]
        with omega.open_dict(base_dataset_config):
            base_dataset_config["processors"]["text_processor"] = (
                vinvl_text_processor
            )
            base_dataset_config["label_map"] = config.get("label_map")

        vinvl_dataset = super().load(
            base_dataset_config, dataset_type, *args, **kwargs
        )
        # super().load returns an MMFConcatDataset over per-imdb instances
        wrapped = getattr(vinvl_dataset, "datasets", [vinvl_dataset])
        for dataset in wrapped:
            dataset.set_base_dataset(base_dataset)
        return vinvl_dataset
