"""MM-IMDb datasets (parity with
mmf/datasets/builders/mmimdb/dataset.py): movie plot -> multilabel genre
classification, over either region features or raw posters. The plot/
genre handling is shared; subclasses differ only in the visual input."""

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.mmf_dataset import MMFDataset


class _MMIMDbBase(MMFDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__("mmimdb", config, dataset_type,
                         index=imdb_file_index)

    def _plot_and_genres(self, sample_info, sample):
        plot = sample_info["plot"]
        if isinstance(plot, list):
            plot = plot[0]
        encoded = self.text_processor({"text": plot})
        sample.text = encoded["text"]
        if "input_ids" in encoded:
            sample.update(encoded)

        genres = self.answer_processor({"answers": sample_info["genres"]})
        sample.answers = genres["answers"]
        sample.targets = genres["answers_scores"]
        return sample

    def __getitem__(self, idx):
        sample = self._plot_and_genres(self.annotation_db[idx], Sample())
        return self._add_visual(idx, sample)

    def _add_visual(self, idx, sample):
        raise NotImplementedError


class MMIMDbFeaturesDataset(_MMIMDbBase):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__(config, dataset_type, imdb_file_index)
        assert self._use_features, (
            "config's 'use_features' must be true to use feature dataset")

    def _add_visual(self, idx, sample):
        features = self._process_feature_info(self.features_db[idx])
        sample.update(features)
        return sample


class MMIMDbImageDataset(_MMIMDbBase):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__(config, dataset_type, imdb_file_index)
        assert self._use_images, (
            "config's 'use_images' must be true to use image dataset")

    def init_processors(self):
        super().init_processors()
        if hasattr(self, "image_processor"):
            self.image_db.transform = self.image_processor

    def _add_visual(self, idx, sample):
        sample.image = self.image_db[idx]["images"][0]
        return sample
