"""Interactive inference pipeline (parity with mmf/utils/inference.py:15-76).

Loads a pretrained model from the zoo (or local path), builds the dataset's
processors, and answers questions about a local image. On-the-fly region
features require the FRCNN port; grid-feature models (MMBT) work
end-to-end today.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample, SampleList

logger = logging.getLogger(__name__)


class Inference:
    def __init__(self, checkpoint_path: str = None):
        self.checkpoint = checkpoint_path
        assert self.checkpoint is not None
        self.processor, self.model, self.variables = self._build_model()

    def _build_model(self):
        from mmf_tpu.models.base_model import build_model
        from mmf_tpu.utils.checkpoint import load_pretrained_model

        self.model_items = load_pretrained_model(self.checkpoint)
        config = self.model_items["config"]
        dataset_name = list(config["dataset_config"].keys())[0]
        processor = config["dataset_config"][dataset_name]["processors"]
        full = dict(config)
        model = build_model(full)
        variables = self.model_items["checkpoint"].get("variables", None)
        return processor, model, variables

    def forward(self, image_path: str, text: dict, image_format: str = "path"):
        from mmf_tpu.datasets.processors.processors import Processor
        from PIL import Image
        import jax

        text_processor = Processor(self.processor["text_processor"])
        text_output = text_processor(text)

        sample = Sample(
            {k: v for k, v in text_output.items()
             if isinstance(v, np.ndarray)}
        )
        if image_format == "path":
            img = np.asarray(Image.open(image_path).convert("RGB"),
                             np.float32) / 255.0
            sample.image = img.transpose(2, 0, 1)
        elif image_format == "url":
            raise RuntimeError(
                "URL loading requires network egress; pass a local path"
            )

        sample_list = SampleList([sample])
        batch = sample_list.pytree()
        batch["dataset_name"] = "inference"
        batch["dataset_type"] = "test"
        if self.variables is None:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), batch, False
            )
        output = self.model.apply(self.variables, batch, False)
        scores = jax.nn.softmax(output["scores"], axis=1)
        scores = np.asarray(scores)
        top = scores.argmax(1)[0]
        return {"label": int(top), "confidence": float(scores[0, top])}
