from mmf_tpu.datasets.builders.gqa import builder  # noqa
