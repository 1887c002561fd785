"""Retrieval builder (parity with
mmf/datasets/builders/retrieval): image-text retrieval over
caption-per-image annotations."""

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.mmf_dataset import MMFDataset
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class RetrievalDataset(MMFDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__("retrieval", config, dataset_type,
                         index=imdb_file_index)

    def init_processors(self):
        super().init_processors()
        if self._use_images and hasattr(self, "image_processor"):
            self.image_db.transform = self.image_processor

    def __getitem__(self, idx):
        info = self.annotation_db[idx]
        sample = Sample()
        caption = info.get("caption", info.get("sentences", [""])[0]
                           if "sentences" in info else "")
        if isinstance(caption, list):
            caption = caption[0]
        processed = self.text_processor({"text": caption})
        sample.text = processed["text"]
        if "input_ids" in processed:
            sample.update(processed)
        if self._use_features:
            sample.update(self.features_db[idx])
        elif self._use_images:
            sample.image = self.image_db[idx]["images"][0]
        sample.targets = np.int64(idx)
        return sample


@registry.register_builder("retrieval")
class RetrievalBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="retrieval",
                 dataset_class=RetrievalDataset, *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/retrieval/defaults.yaml"
