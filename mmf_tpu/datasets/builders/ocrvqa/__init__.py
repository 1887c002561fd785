from mmf_tpu.datasets.builders.ocrvqa import builder  # noqa
