"""Extract FRCNN region features with the in-repo TPU GeneralizedRCNN.

Parity with tools/scripts/features/frcnn/extract_features_frcnn.py in the
reference (torch/CUDA modeling_frcnn.py); here the detector is
mmf_tpu/models/frcnn.py and the whole per-image pipeline is one jitted
XLA program. Outputs one ``<image>_info.npy`` dict per image with the
keys the FeatureReaders and visualizers consume (features, boxes,
obj_probs, num_boxes, image_height/width).

Usage:
  python extract_features_frcnn.py --image_dir <dir> --output_folder <dir>
      [--checkpoint <converted frcnn ckpt>] [--num_features 100]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


class FeatureExtractor:
    def __init__(self, args=None):
        self.args = args or self.get_parser().parse_args()
        os.makedirs(self.args.output_folder, exist_ok=True)
        self._build()

    def get_parser(self):
        parser = argparse.ArgumentParser()
        parser.add_argument("--image_dir", type=str, required=True,
                            help="Image directory or single file")
        parser.add_argument("--output_folder", type=str, required=True,
                            help="Output directory for .npy feature files")
        parser.add_argument("--checkpoint", type=str, default=None,
                            help="Converted FRCNN checkpoint (optional)")
        parser.add_argument("--num_features", type=int, default=100,
                            help="Regions kept per image (post-NMS)")
        parser.add_argument("--start_index", type=int, default=0)
        parser.add_argument("--end_index", type=int, default=None)
        parser.add_argument("--exclude_list", type=str, default=None,
                            help="File with image ids to skip, one per line")
        parser.add_argument("--background", action="store_true",
                            help="Kept for config compat (unused)")
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
            omega.create({"input": {"min_size_test": 800,
                                    "max_size_test": 1333},
                          "model": {}})
        )
        frcnn_cls = registry.get_model_class("frcnn")
        self.model = frcnn_cls(
            config={"post_nms_topk": self.args.num_features}
        )
        self.variables = None
        if self.args.checkpoint:
            from mmf_tpu.utils.checkpoint import load_pretrained_model

            loaded = load_pretrained_model(self.args.checkpoint)
            self.variables = loaded["checkpoint"]["variables"]
        self._apply = jax.jit(
            lambda v, b: self.model.apply(v, b, False)
        )

    def _image_paths(self):
        if os.path.isfile(self.args.image_dir):
            return [self.args.image_dir]
        files = sorted(
            os.path.join(self.args.image_dir, f)
            for f in os.listdir(self.args.image_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        end = self.args.end_index or len(files)
        files = files[self.args.start_index : end]
        if self.args.exclude_list and os.path.exists(self.args.exclude_list):
            with open(self.args.exclude_list) as f:
                excluded = {line.strip() for line in f if line.strip()}
            files = [
                p for p in files
                if os.path.splitext(os.path.basename(p))[0] not in excluded
            ]
        return files

    def extract_features(self):
        import jax

        for path in self._image_paths():
            images, sizes, scales = self.preprocess(path, single_image=True)
            batch = {
                "image": np.asarray(images)[None].transpose(0, 2, 3, 1),
                "image_shape": np.asarray(sizes, np.float32)[None],
            }
            if self.variables is None:
                logger.warning(
                    "No --checkpoint: extracting with randomly-initialized "
                    "detector weights"
                )
                self.variables = self.model.init(
                    jax.random.PRNGKey(0), batch, False
                )
            out = jax.device_get(self._apply(self.variables, batch))
            base = os.path.splitext(os.path.basename(path))[0]
            info = {
                "features": np.asarray(out["roi_features"][0], np.float32),
                "boxes": np.asarray(out["boxes"][0], np.float32),
                "obj_probs": np.asarray(out["objectness"][0], np.float32),
                "num_boxes": int(np.asarray(out["valid"][0]).sum()),
                "image_height": float(sizes[0]),
                "image_width": float(sizes[1]),
            }
            np.save(
                os.path.join(self.args.output_folder, f"{base}_info.npy"),
                info, allow_pickle=True,
            )
            logger.info(f"{base}: {info['num_boxes']} regions")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    FeatureExtractor().extract_features()
