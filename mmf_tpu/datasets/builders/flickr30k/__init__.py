from mmf_tpu.datasets.builders.flickr30k import builder  # noqa
