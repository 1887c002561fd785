from mmf_tpu.datasets.builders.vizwiz import builder  # noqa
