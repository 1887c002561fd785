from mmf_tpu.datasets.builders.visual_dialog import builder  # noqa
