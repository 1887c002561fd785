"""GeneralizedRCNN for on-the-fly region features
(parity with mmf/models/frcnn.py:263).

The reference ports a caffe2-style Faster R-CNN for the interactive
Inference pipeline. In this framework precomputed features are the
supported path (tools/scripts/features); the on-the-fly extractor needs
the full RPN/ROI stack and its pretrained weights, which are not
available in this environment — the registered model raises with that
guidance rather than silently degrading.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel


@registry.register_model("frcnn")
class FRCNN(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/frcnn/defaults.yaml"

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        raise NotImplementedError(
            "On-the-fly FRCNN feature extraction is not ported; use "
            "precomputed region features (tools/scripts/features) — the "
            "path every training config in this framework uses."
        )
