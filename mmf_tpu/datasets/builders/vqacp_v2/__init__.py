from mmf_tpu.datasets.builders.vqacp_v2 import builder  # noqa
