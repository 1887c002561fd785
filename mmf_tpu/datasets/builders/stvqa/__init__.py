from mmf_tpu.datasets.builders.stvqa import builder  # noqa
