from mmf_tpu.datasets.builders.visual_genome import builder  # noqa
