from mmf_tpu.datasets.builders.vinvl import builder  # noqa
