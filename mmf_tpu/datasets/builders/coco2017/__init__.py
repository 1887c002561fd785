from mmf_tpu.datasets.builders.coco2017 import builder  # noqa
