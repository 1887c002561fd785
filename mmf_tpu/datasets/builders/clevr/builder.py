"""CLEVR builder (parity with mmf/datasets/builders/clevr/builder.py)."""

from __future__ import annotations

import logging
import os

from mmf_tpu.common.constants import CLEVR_DOWNLOAD_URL
from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder
from mmf_tpu.datasets.builders.clevr.dataset import CLEVRDataset
from mmf_tpu.utils.download import decompress, download
from mmf_tpu.utils.general import get_mmf_root

logger = logging.getLogger(__name__)


@registry.register_builder("clevr")
class CLEVRBuilder(BaseDatasetBuilder):
    def __init__(self):
        super().__init__("clevr")
        self.dataset_class = CLEVRDataset

    @classmethod
    def config_path(cls):
        return "configs/datasets/clevr/defaults.yaml"

    def build(self, config, dataset_type="train"):
        data_dir = config.get("data_dir", "")
        root = data_dir if os.path.isabs(data_dir) else os.path.join(
            get_mmf_root(), data_dir
        )
        download_folder = os.path.join(root, config["data_folder"])
        file_name = CLEVR_DOWNLOAD_URL.split("/")[-1]
        local_filename = os.path.join(download_folder, file_name)
        extraction_folder = os.path.join(
            download_folder, ".".join(file_name.split(".")[:-1])
        )
        self.data_folder = extraction_folder

        if os.path.exists(local_filename):
            logger.info("CLEVR dataset is already present. Skipping download.")
            return
        if os.path.exists(extraction_folder) and len(
            os.listdir(extraction_folder)
        ) != 0:
            return
        logger.info("Downloading the CLEVR dataset now")
        download(CLEVR_DOWNLOAD_URL, download_folder, file_name)
        logger.info("Extracting the CLEVR dataset now")
        decompress(download_folder, file_name, delete_original=False)

    def load(self, config, dataset_type="train", *args, **kwargs):
        self.dataset = CLEVRDataset(
            config, dataset_type, data_folder=getattr(self, "data_folder", None)
        )
        return self.dataset

    def update_registry_for_model(self, config):
        dataset = getattr(self, "dataset", None)
        if dataset is None:
            return
        registry.register(
            self.dataset_name + "_text_vocab_size",
            dataset.text_processor.get_vocab_size(),
        )
        registry.register(
            self.dataset_name + "_num_final_outputs",
            dataset.answer_processor.get_vocab_size(),
        )
