"""NLVR2 dataset (parity with
mmf/datasets/builders/nlvr2/dataset.py): sentence + paired images."""

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.builders.vqa2.dataset import VQA2Dataset


class NLVR2Dataset(VQA2Dataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args, **kwargs):
        super().__init__(config, dataset_type, imdb_file_index,
                         dataset_name="nlvr2", *args, **kwargs)

    def load_item(self, idx):
        sample_info = self.annotation_db[idx]
        current_sample = Sample()
        processed_sentence = self.text_processor(
            {"text": sample_info["sentence"]})
        current_sample.text = processed_sentence["text"]
        if "input_ids" in processed_sentence:
            current_sample.update(processed_sentence)

        if self._use_features:
            identifier = "-".join(sample_info["identifier"].split("-")[:-1])
            for img_key in ("img0", "img1"):
                sample_info["feature_path"] = f"{identifier}-{img_key}.npy"
                features = self._process_feature_info(
                    self.features_db.get(sample_info))
                img = Sample()
                img.update(features)
                current_sample[img_key] = img

        is_correct = 1 if sample_info["label"] == "True" else 0
        current_sample.targets = np.int64(is_correct)
        return current_sample
