from mmf_tpu.datasets.builders.nlvr2 import builder  # noqa
