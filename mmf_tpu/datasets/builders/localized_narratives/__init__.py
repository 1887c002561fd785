from mmf_tpu.datasets.builders.localized_narratives import builder  # noqa
