from mmf_tpu.datasets.builders.airstore import builder  # noqa
