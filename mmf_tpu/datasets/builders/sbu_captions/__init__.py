from mmf_tpu.datasets.builders.sbu_captions import builder  # noqa
