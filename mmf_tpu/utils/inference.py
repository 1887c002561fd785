"""Interactive inference pipeline (parity with mmf/utils/inference.py:15-76).

Loads a pretrained model from the zoo (or local path), builds the dataset's
processors, and answers questions about a local image. Region-feature
models get on-the-fly features from the in-repo GeneralizedRCNN
(models/frcnn.py) via the ``frcnn_preprocess`` processor — the reference's
feature_extraction path (inference.py:42-54); pass ``frcnn_checkpoint``
to load converted detector weights, otherwise grid-feature models (MMBT)
work without it.
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
    def __init__(self, checkpoint_path: str = None,
                 frcnn_checkpoint: str = None):
        self.checkpoint = checkpoint_path
        assert self.checkpoint is not None
        self.frcnn_checkpoint = frcnn_checkpoint
        self._frcnn = None  # (model, variables), built lazily
        self.processor, self.model, self.variables = self._build_model()

    def _region_features(self, image_path: str, max_regions: int = 100):
        """On-the-fly FRCNN region features (reference inference.py:42-54:
        feature extraction through the in-repo detector)."""
        import jax

        from mmf_tpu.datasets.processors.frcnn_processor import (
            FRCNNPreprocess,
        )
        from mmf_tpu.config import omega

        preprocess = FRCNNPreprocess(
            omega.create({"input": {"min_size_test": 800,
                                    "max_size_test": 1333},
                          "model": {}})
        )
        images, sizes, _ = preprocess(image_path, single_image=True)
        batch = {
            "image": np.asarray(images)[None].transpose(0, 2, 3, 1),
            "image_shape": np.asarray(sizes, np.float32)[None],
        }
        if self._frcnn is None:
            frcnn_cls = registry.get_model_class("frcnn")
            frcnn = frcnn_cls(config={"post_nms_topk": max_regions})
            if self.frcnn_checkpoint:
                from mmf_tpu.utils.checkpoint import load_pretrained_model

                loaded = load_pretrained_model(self.frcnn_checkpoint)
                variables = loaded["checkpoint"]["variables"]
            else:
                logger.warning(
                    "No frcnn_checkpoint given: extracting region features "
                    "with randomly-initialized detector weights"
                )
                variables = frcnn.init(jax.random.PRNGKey(0), batch, False)
            self._frcnn = (frcnn, variables)
        frcnn, variables = self._frcnn
        out = frcnn.apply(variables, batch, False)
        return np.asarray(out["roi_features"][0])

    def _build_model(self):
        from mmf_tpu.models.base_model import build_model
        from mmf_tpu.utils.checkpoint import load_pretrained_model

        self.model_items = load_pretrained_model(self.checkpoint)
        config = self.model_items["config"]
        # models registered from a user plugin dir (env.user_dir in the
        # checkpoint's config snapshot) must be importable before
        # build_model resolves the registry key
        user_dir = (config.get("env") or {}).get("user_dir")
        if user_dir:
            from mmf_tpu.utils.env import import_user_module

            import_user_module(user_dir)
        dataset_name = list(config["dataset_config"].keys())[0]
        # processors are optional (e.g. raw-array models/plugins); text
        # requests then require pre-processed fields
        processor = config["dataset_config"][dataset_name].get("processors")
        full = dict(config)
        model = build_model(full)
        variables = self.model_items["checkpoint"].get("variables", None)
        return processor, model, variables

    def forward(self, image_path: str, text: dict, image_format: str = "path"):
        from mmf_tpu.datasets.processors.processors import Processor
        from PIL import Image
        import jax

        if not self.processor or "text_processor" not in self.processor:
            raise RuntimeError(
                "This checkpoint's dataset config defines no text_processor; "
                "interactive inference needs one to tokenize the question. "
                "Pass pre-processed fields through the library API instead "
                "(mirrors serving's default_prepare requirement)."
            )
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
        elif image_format == "features":
            sample.image_feature_0 = self._region_features(image_path)
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
