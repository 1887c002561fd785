"""DETR-style paired image+target transforms
(parity with mmf/datasets/processors/detection_transforms.py:152-236).
PIL/numpy implementation; boxes in xyxy absolute coords in targets."""

from __future__ import annotations

import random
from typing import Any, Dict, Optional

import numpy as np

from mmf_tpu.datasets.processors.image_processors import (
    _resize_chw,
    _to_chw_float,
)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, target=None):
        for t in self.transforms:
            img, target = t(img, target)
        return img, target


class ToTensor:
    def __call__(self, img, target=None):
        return _to_chw_float(img), target


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(-1, 1, 1)

    def __call__(self, img, target=None):
        img = _to_chw_float(img)
        img = (img - self.mean) / self.std
        if target is not None and "boxes" in target:
            # normalize boxes to cxcywh in [0,1] (DETR convention)
            h, w = img.shape[1:]
            boxes = np.asarray(target["boxes"], np.float32)
            cx = (boxes[:, 0] + boxes[:, 2]) / 2 / w
            cy = (boxes[:, 1] + boxes[:, 3]) / 2 / h
            bw = (boxes[:, 2] - boxes[:, 0]) / w
            bh = (boxes[:, 3] - boxes[:, 1]) / h
            target = dict(target)
            target["boxes"] = np.stack([cx, cy, bw, bh], axis=1)
        return img, target


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, target=None):
        if random.random() < self.p:
            img = _to_chw_float(img)[:, :, ::-1].copy()
            if target is not None and "boxes" in target:
                w = img.shape[2]
                boxes = np.asarray(target["boxes"], np.float32)
                flipped = boxes.copy()
                flipped[:, 0] = w - boxes[:, 2]
                flipped[:, 2] = w - boxes[:, 0]
                target = dict(target)
                target["boxes"] = flipped
            return img, target
        return _to_chw_float(img), target


class RandomResize:
    def __init__(self, sizes, max_size=None):
        self.sizes = list(sizes)
        self.max_size = max_size

    def _get_size(self, h, w, size):
        if self.max_size is not None:
            mn, mx = float(min(h, w)), float(max(h, w))
            if mx / mn * size > self.max_size:
                size = int(round(self.max_size * mn / mx))
        if h < w:
            oh, ow = size, int(size * w / h)
        else:
            ow, oh = size, int(size * h / w)
        return oh, ow

    def __call__(self, img, target=None):
        img = _to_chw_float(img)
        h, w = img.shape[1:]
        size = random.choice(self.sizes)
        oh, ow = self._get_size(h, w, size)
        out = _resize_chw(img, (oh, ow))
        if target is not None and "boxes" in target:
            sx, sy = ow / w, oh / h
            boxes = np.asarray(target["boxes"], np.float32)
            boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
            target = dict(target)
            target["boxes"] = boxes
            if "size" in target:
                target["size"] = np.asarray([oh, ow], np.int64)
        return out, target


class RandomSizeCrop:
    def __init__(self, min_size, max_size):
        self.min_size = min_size
        self.max_size = max_size

    def __call__(self, img, target=None):
        img = _to_chw_float(img)
        h, w = img.shape[1:]
        th = random.randint(self.min_size, min(h, self.max_size))
        tw = random.randint(self.min_size, min(w, self.max_size))
        i = random.randint(0, h - th)
        j = random.randint(0, w - tw)
        out = img[:, i:i + th, j:j + tw]
        if target is not None and "boxes" in target:
            boxes = np.asarray(target["boxes"], np.float32)
            boxes = boxes - np.asarray([j, i, j, i], np.float32)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, tw)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, th)
            target = dict(target)
            target["boxes"] = boxes
        return out, target


class RandomSelect:
    def __init__(self, t1, t2, p=0.5):
        self.t1, self.t2, self.p = t1, t2, p

    def __call__(self, img, target=None):
        if random.random() < self.p:
            return self.t1(img, target)
        return self.t2(img, target)


# registered processor keys (reference detection_transforms.py:152-236) so
# detection pipelines can be assembled from YAML
from mmf_tpu.common.registry import registry  # noqa: E402

registry.register_processor("detection_compose")(Compose)
registry.register_processor("detection_to_tensor")(ToTensor)
registry.register_processor("detection_normalize")(Normalize)
registry.register_processor("detection_random_horizontal_flip")(
    RandomHorizontalFlip
)
registry.register_processor("detection_random_resize")(RandomResize)
registry.register_processor("detection_random_size_crop")(RandomSizeCrop)
registry.register_processor("detection_random_select")(RandomSelect)
