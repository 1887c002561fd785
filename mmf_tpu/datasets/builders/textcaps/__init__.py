from mmf_tpu.datasets.builders.textcaps import builder  # noqa
