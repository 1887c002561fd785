from mmf_tpu.datasets.builders.okvqa import builder  # noqa
