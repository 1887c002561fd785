from mmf_tpu.datasets.builders.coco import builder  # noqa
