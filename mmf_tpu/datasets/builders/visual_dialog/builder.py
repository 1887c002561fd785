"""visual_dialog builder (registered; dataset loading
requires visdial dialog database, which is unavailable in this environment —
raises a clear error at load time; parity with
mmf/datasets/builders/visual_dialog)."""

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.mmf_dataset_builder import MMFDatasetBuilder


class VisualDialogDataset:
    def __init__(self, config, dataset_type, *args, **kwargs):
        raise NotImplementedError(
            "visual_dialog requires visdial dialog database, which is not available in this "
            "environment")


@registry.register_builder("visual_dialog")
class VisualDialogBuilder(MMFDatasetBuilder):
    def __init__(self, dataset_name="visual_dialog", dataset_class=VisualDialogDataset,
                 *args, **kwargs):
        super().__init__(dataset_name, dataset_class)

    @classmethod
    def config_path(cls):
        return "configs/datasets/visual_dialog/defaults.yaml"
