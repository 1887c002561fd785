"""VinVL builder (parity with
mmf/datasets/builders/vinvl): wraps a base dataset and adds VinVL tag
features."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class VinVLDataset:
    """Delegates to a base dataset and augments samples with tags."""

    def __init__(self, config, dataset_type, *args, **kwargs):
        from mmf_tpu.datasets.multi_datamodule import build_datamodules

        base = config.get("base_dataset_name", "vqa2")
        raise NotImplementedError(
            f"VinVL wrapping of base dataset '{base}' requires its "
            "tag-augmented imdb; pre-populate data and extend this class")


@registry.register_builder("vinvl")
class VinVLBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="vinvl", dataset_class=VinVLDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/vinvl/defaults.yaml"
