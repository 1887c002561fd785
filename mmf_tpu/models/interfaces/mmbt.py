"""Hub interface for MMBT on Hateful Memes
(parity with mmf/models/interfaces/mmbt.py:26-85):
``MMBTGridHMInterface.classify(image_or_path, text)``."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample, SampleList


class MMBTGridHMInterface:
    def __init__(self, model, config, variables=None):
        self.model = model
        self.config = config
        self.variables = variables
        self._init_processors()

    def _init_processors(self):
        from mmf_tpu.datasets.processors.processors import Processor

        dataset_config = self.config["dataset_config"]["hateful_memes"]
        processors = dataset_config.get("processors", {})
        extra = {"data_dir": dataset_config.get("data_dir", None)}
        self.text_processor = Processor(
            processors["text_processor"], **extra
        )
        self.image_processor = Processor(
            processors["image_processor"], **extra
        )

    def _load_image(self, image_or_path):
        from PIL import Image

        if isinstance(image_or_path, str):
            if image_or_path.startswith("http"):
                raise RuntimeError(
                    "URL image loading requires network egress; pass a "
                    "local path or PIL image"
                )
            return Image.open(image_or_path).convert("RGB")
        return image_or_path

    def classify(self, image_or_path, text: str) -> Dict[str, Any]:
        image = self._load_image(image_or_path)
        image = self.image_processor(image)

        sample = Sample()
        processed = self.text_processor({"text": text})
        sample.update({k: v for k, v in processed.items()
                       if isinstance(v, np.ndarray)})
        sample.image = np.asarray(image, np.float32)
        sample_list = SampleList([sample])
        sample_list.dataset_name = "hateful_memes"
        sample_list.dataset_type = "test"

        batch = sample_list.pytree()
        batch["dataset_name"] = "hateful_memes"
        batch["dataset_type"] = "test"
        if self.variables is None:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), batch, False
            )
        output = self.model.apply(self.variables, batch, False)
        scores = np.asarray(
            jax.nn.softmax(output["scores"], axis=1)
        )
        label = int(scores.argmax(1)[0])
        return {"label": label, "confidence": float(scores[0, label])}
