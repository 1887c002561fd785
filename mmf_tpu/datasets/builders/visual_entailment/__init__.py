from mmf_tpu.datasets.builders.visual_entailment import builder  # noqa
