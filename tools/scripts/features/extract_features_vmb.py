"""Extract region features in the maskrcnn-benchmark layout.

Parity with tools/scripts/features/extract_features_vmb.py in the
reference, which wraps the external `maskrcnn_benchmark` CUDA detector.
Here the detector is the in-repo XLA GeneralizedRCNN
(mmf_tpu/models/frcnn.py); the script keeps the reference's CLI and its
two-file output layout — ``<image>.npy`` holding the [N, 2048] fc
features and ``<image>_info.npy`` holding boxes/classes/scores — which is
what PaddedFasterRCNNFeatureReader consumes.

Usage:
  python extract_features_vmb.py --image_dir <dir> --output_folder <dir>
      [--model_name X-101] [--num_features 100] [--checkpoint ckpt]
      [--partition N --max_partition M]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "frcnn"))
sys.path.insert(0, os.path.dirname(__file__))
# allow running from anywhere without installing the package
sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
)

from extraction_utils import chunks, get_image_files  # noqa: E402

logger = logging.getLogger(__name__)


class FeatureExtractor:
    MAX_SIZE = 1333
    MIN_SIZE = 800

    def __init__(self, args=None):
        self.args = args or self.get_parser().parse_args()
        os.makedirs(self.args.output_folder, exist_ok=True)
        self._build()

    def get_parser(self):
        parser = argparse.ArgumentParser()
        parser.add_argument("--model_name", default="X-101",
                            help="Kept for CLI compat (detector is in-repo)")
        parser.add_argument("--image_dir", type=str, required=True)
        parser.add_argument("--output_folder", type=str, required=True)
        parser.add_argument("--checkpoint", type=str, default=None,
                            help="Converted detector checkpoint")
        parser.add_argument("--num_features", type=int, default=100)
        parser.add_argument("--exclude_list", type=str, default="")
        parser.add_argument("--confidence_threshold", type=float, default=0)
        parser.add_argument("--batch_size", type=int, default=1)
        parser.add_argument("--partition", type=int, default=None)
        parser.add_argument("--max_partition", type=int, default=None)
        parser.add_argument("--start_index", type=int, default=0)
        parser.add_argument("--end_index", type=int, default=None)
        parser.add_argument("--background", action="store_true")
        return parser

    def _build(self):
        import jax

        from mmf_tpu.common.registry import registry
        from mmf_tpu.config import omega
        from mmf_tpu.datasets.processors.frcnn_processor import (
            FRCNNPreprocess,
        )
        from mmf_tpu.utils.env import setup_imports

        setup_imports()
        self.preprocess = FRCNNPreprocess(
            omega.create({"input": {"min_size_test": self.MIN_SIZE,
                                    "max_size_test": self.MAX_SIZE},
                          "model": {}})
        )
        model_cls = registry.get_model_class("frcnn")
        self.model = model_cls(
            config={"post_nms_topk": self.args.num_features}
        )
        self.variables = None
        if self.args.checkpoint:
            from mmf_tpu.utils.checkpoint import load_pretrained_model

            self.variables = load_pretrained_model(
                self.args.checkpoint
            )["checkpoint"]["variables"]
        self._apply = jax.jit(lambda v, b: self.model.apply(v, b, False))

    def _extract_one(self, path):
        import jax

        images, sizes, _ = self.preprocess(path, single_image=True)
        batch = {
            "image": np.asarray(images)[None].transpose(0, 2, 3, 1),
            "image_shape": np.asarray(sizes, np.float32)[None],
        }
        if self.variables is None:
            logger.warning("No --checkpoint: random detector weights")
            self.variables = self.model.init(
                jax.random.PRNGKey(0), batch, False
            )
        out = jax.device_get(self._apply(self.variables, batch))
        num_boxes = int(np.asarray(out["valid"][0]).sum())
        feature = np.asarray(out["roi_features"][0], np.float32)
        scores = np.asarray(out["objectness"][0], np.float32)
        info = {
            "bbox": np.asarray(out["boxes"][0], np.float32),
            "num_boxes": num_boxes,
            "objects": scores.argmax(-1) if scores.ndim > 1
            else np.zeros((len(feature),), np.int64),
            "cls_prob": scores,
            "image_height": float(sizes[0]),
            "image_width": float(sizes[1]),
        }
        return feature, info

    def _save_feature(self, file_name, feature, info):
        base = os.path.splitext(os.path.basename(file_name))[0]
        np.save(os.path.join(self.args.output_folder, f"{base}.npy"),
                feature)
        np.save(os.path.join(self.args.output_folder, f"{base}_info.npy"),
                info, allow_pickle=True)

    def extract_features(self):
        files = get_image_files(
            self.args.image_dir,
            exclude_list=self.args.exclude_list,
            partition=self.args.partition,
            max_partition=self.args.max_partition,
            start_index=self.args.start_index,
            end_index=self.args.end_index,
            output_folder=self.args.output_folder,
        )
        for batch, idx in chunks(files, self.args.batch_size):
            for path in batch:
                feature, info = self._extract_one(path)
                self._save_feature(path, feature, info)
                logger.info(f"{path}: {info['num_boxes']} regions")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    FeatureExtractor().extract_features()
