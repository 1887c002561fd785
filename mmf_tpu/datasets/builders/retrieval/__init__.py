from mmf_tpu.datasets.builders.retrieval import builder  # noqa
