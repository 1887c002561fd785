"""Collate function stamping dataset identity onto each batch.

Parity with mmf/common/batch_collator.py:5-14.
"""

from mmf_tpu.common.sample import SampleList


class BatchCollator:
    def __init__(self, dataset_name: str, dataset_type: str):
        self._dataset_name = dataset_name
        self._dataset_type = dataset_type

    def __call__(self, batch):
        sample_list = SampleList(batch) if not isinstance(batch, SampleList) else batch
        sample_list.dataset_name = self._dataset_name
        sample_list.dataset_type = self._dataset_type
        return sample_list
