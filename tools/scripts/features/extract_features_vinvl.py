"""Extract VinVL-style region features (box_features ++ 6-dim normalized
box geometry) with the in-repo XLA detector.

Parity with tools/scripts/features/extract_features_vinvl.py in the
reference, which wraps the external `scene_graph_benchmark` AttrRCNN.
Output layout matches: ``<image>.npy`` holds [N, 2048+6] features where
the last six dims are (x1/w, y1/h, x2/w, y2/h, w_box, h_box);
``<image>_info.npy`` holds bbox/labels/scores per region — the format the
vinvl dataset's feature readers expect.

Usage:
  python extract_features_vinvl.py --image_dir <dir> --output_folder <dir>
      [--checkpoint <converted detector ckpt>] [--num_features 100]
"""

from __future__ import annotations

import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from extract_features_vmb import FeatureExtractor as _VMBExtractor  # noqa: E402

logger = logging.getLogger(__name__)


def norm_box(bbox: np.ndarray, w: float, h: float) -> np.ndarray:
    """[N,4] xyxy -> [N,6] (x1/w, y1/h, x2/w, y2/h, box_w, box_h)
    (reference extract_features_vinvl.py:173-183)."""
    out = np.zeros((bbox.shape[0], 6), np.float32)
    out[:, 0] = bbox[:, 0] / w
    out[:, 1] = bbox[:, 1] / h
    out[:, 2] = bbox[:, 2] / w
    out[:, 3] = bbox[:, 3] / h
    out[:, 4] = out[:, 2] - out[:, 0]
    out[:, 5] = out[:, 3] - out[:, 1]
    return out


class FeatureExtractor(_VMBExtractor):
    def _extract_one(self, path):
        feature, info = super()._extract_one(path)
        w = info["image_width"]
        h = info["image_height"]
        bbox_aug = norm_box(np.asarray(info["bbox"], np.float32), w, h)
        # VinVL concatenates the fc features with the box geometry
        feature = np.concatenate([feature, bbox_aug], axis=1)
        info = {
            "bbox": bbox_aug,
            "num_boxes": info["num_boxes"],
            "labels": info["objects"],
            "scores": (info["cls_prob"].max(-1)
                       if np.asarray(info["cls_prob"]).ndim > 1
                       else info["cls_prob"]),
            "image_width": w,
            "image_height": h,
        }
        return feature, info


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    FeatureExtractor().extract_features()
