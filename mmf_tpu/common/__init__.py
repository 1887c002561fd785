from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample, SampleList, convert_batch_to_sample_list

__all__ = ["registry", "Sample", "SampleList", "convert_batch_to_sample_list"]
