from mmf_tpu.datasets.builders.mmimdb import builder  # noqa
