"""MMFDatasetBuilder (parity with mmf/datasets/mmf_dataset_builder.py):
zoo download in ``build``, per-imdb dataset instances concatenated in
``load``, and deterministic ``split_train`` re-splitting."""

from __future__ import annotations

import copy
import os
import warnings
from typing import Any, Optional, Type

import numpy as np

from mmf_tpu.config import omega
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from mmf_tpu.datasets.concat_dataset import MMFConcatDataset, MMFSubset
from mmf_tpu.utils import download
from mmf_tpu.utils.general import get_absolute_path


class MMFDatasetBuilder(BaseDatasetBuilder):
    def __init__(self, dataset_name=None, dataset_class=None,
                 zoo_variation="defaults", *args, **kwargs):
        super().__init__(dataset_name)
        self.dataset_class = dataset_class
        self.zoo_type = "datasets"
        self.zoo_variation = zoo_variation

    @property
    def dataset_class(self):
        return self._dataset_class

    @dataset_class.setter
    def dataset_class(self, dataset_class):
        self._dataset_class = dataset_class

    @property
    def zoo_variation(self):
        return self._zoo_variation

    @zoo_variation.setter
    def zoo_variation(self, zoo_variation):
        self._zoo_variation = zoo_variation

    @property
    def zoo_config_path(self):
        if getattr(self, "_zoo_config_path", None) is None:
            from mmf_tpu.config.configuration import get_global_config

            self._zoo_config_path = get_global_config("env.dataset_zoo")
        return self._zoo_config_path

    @zoo_config_path.setter
    def zoo_config_path(self, zoo_config_path):
        self._zoo_config_path = zoo_config_path

    def set_dataset_class(self, dataset_cls):
        self.dataset_class = dataset_cls

    # ------------------------------------------------------------------
    def build(self, config, dataset_type="train", *args, **kwargs):
        """(reference mmf_dataset_builder.py:63-123)"""
        requirements = config.get("zoo_requirements", [])
        if len(requirements) == 0:
            self._download_requirement(
                config, self.dataset_name, self.zoo_variation
            )
        else:
            for requirement in requirements:
                self._download_requirement(config, requirement)

    def _download_requirement(self, config, requirement_key,
                              requirement_variation="defaults"):
        from mmf_tpu.config.configuration import get_mmf_env, get_zoo_config

        version, resources = get_zoo_config(
            requirement_key, requirement_variation, self.zoo_config_path,
            self.zoo_type,
        )
        if resources is None:
            return
        requirement_split = requirement_key.split(".")
        dataset_name = requirement_split[0]
        download_path = os.path.join(
            get_mmf_env("data_dir"), "datasets", dataset_name
        )
        download_path = get_absolute_path(download_path)

        if not isinstance(resources, dict):
            self._download_resources(resources, download_path, version)
        else:
            use_features = config.get("use_features", False)
            use_images = config.get("use_images", False)
            if use_features:
                self._download_based_on_attribute(
                    resources, download_path, version, "features"
                )
            if use_images:
                self._download_based_on_attribute(
                    resources, download_path, version, "images"
                )
            self._download_based_on_attribute(
                resources, download_path, version, "annotations"
            )
            self._download_resources(
                resources.get("extras", []), download_path, version
            )

    # ------------------------------------------------------------------
    def load(self, config, dataset_type, *args, **kwargs):
        """(reference mmf_dataset_builder.py:125-147)"""
        self.config = config
        split_dataset_from_train = config.get("split_train", False)
        if split_dataset_from_train:
            config = self._modify_dataset_config_for_split(config)

        annotations = self._read_annotations(config, dataset_type)
        if annotations is None:
            return None

        datasets = []
        for imdb_idx in range(len(annotations)):
            dataset_class = self.dataset_class
            dataset = dataset_class(config, dataset_type, imdb_idx)
            datasets.append(dataset)

        dataset = MMFConcatDataset(datasets)
        if split_dataset_from_train:
            dataset = self._split_dataset_from_train(dataset, dataset_type)
        self.dataset = dataset
        return self.dataset

    def load_dataset(self, config, dataset_type="train", *args, **kwargs):
        dataset = self.load(config, dataset_type, *args, **kwargs)
        if dataset is not None and hasattr(dataset, "datasets"):
            for d in dataset.datasets:
                if hasattr(d, "init_processors"):
                    d.init_processors()
        elif dataset is not None and hasattr(dataset, "init_processors"):
            dataset.init_processors()
        return dataset

    # ------------------------------------------------------------------
    def _split_dataset_from_train(self, dataset, dataset_type):
        split_train = self.config.get("split_train", {})
        if dataset_type in split_train or dataset_type == "train":
            start, end = self._calculate_split_for_dataset_type(dataset_type)
            n = len(dataset)
            start, end = round(start * n), round(end * n)
            if start > end:
                raise ValueError(
                    f"Train split ratio for {dataset_type} must be positive."
                )
            indices = self._generate_permuted_indexes(n)[start:end]
            dataset = MMFSubset(dataset, indices.tolist())
        return dataset

    def _generate_permuted_indexes(self, dataset_length):
        seed = self.config.get("split_train", {}).get("seed", 123456)
        rng = np.random.default_rng(seed)
        return rng.permutation(dataset_length)

    def _modify_dataset_config_for_split(self, config):
        with omega.open_dict(config):
            for data_type in config["split_train"]:
                if data_type == "seed":
                    continue
                if config.get("use_images", False):
                    config["images"][data_type] = copy.deepcopy(
                        config["images"]["train"]
                    )
                if config.get("use_features", False):
                    config["features"][data_type] = copy.deepcopy(
                        config["features"]["train"]
                    )
                config["annotations"][data_type] = copy.deepcopy(
                    config["annotations"]["train"]
                )
        return config

    def _read_annotations(self, config, dataset_type):
        annotations = config.get("annotations", {}).get(dataset_type, [])
        if isinstance(annotations, str):
            annotations = [annotations]
        if len(annotations) == 0:
            warnings.warn(
                f"Dataset type {dataset_type} is not present or empty in "
                "annotations of dataset config or either annotations key "
                "is not present. Returning None. This dataset won't be used."
            )
            return None
        return annotations

    def _calculate_split_for_dataset_type(self, dataset_type):
        split_train = self.config.get("split_train", {})
        start = 0.0
        for data_type in split_train:
            if data_type == "seed":
                continue
            if dataset_type == data_type:
                return (start, start + split_train[data_type])
            start += split_train[data_type]
        if start > 1.0:
            raise ValueError(
                "Ratios of val plus test should not exceed 100%. Need to "
                "leave some percentage for training."
            )
        elif start == 1.0:
            warnings.warn(
                "All data in training set is used for val and/or test."
            )
        if dataset_type == "train":
            return (start, 1.0)

    def _download_based_on_attribute(self, resources, download_path,
                                     version, attribute):
        path = os.path.join(download_path, attribute)
        self._download_resources(resources.get(attribute, []), path, version)

    def _download_resources(self, resources, path, version):
        download.download_resources(resources, path, version)
