from mmf_tpu.datasets.builders.charades import builder  # noqa
