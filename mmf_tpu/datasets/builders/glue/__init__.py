from mmf_tpu.datasets.builders.glue import builder  # noqa
