from mmf_tpu.datasets.builders.conceptual_captions import builder  # noqa
