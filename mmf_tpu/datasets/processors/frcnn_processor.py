"""FRCNN image preprocessing (parity with
mmf/datasets/processors/frcnn_processor.py:34-187): shortest-edge resize,
RGB->BGR flip, mean/std normalization, pad-to-max and stack — numpy/PIL
edition feeding the frcnn feature extractor at fixed NCHW shapes."""

from __future__ import annotations

import os
import sys
from typing import List, Union

import numpy as np
from PIL import Image

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.processors.processors import BaseProcessor


class ResizeShortestEdge:
    """(reference frcnn_processor.py:34-78)"""

    def __init__(self, short_edge_length: List[int],
                 max_size: int = sys.maxsize):
        self.max_size = max_size
        self.short_edge_length = short_edge_length

    def __call__(self, imgs: List[np.ndarray]) -> List[np.ndarray]:
        out = []
        for img in imgs:
            h, w = img.shape[:2]
            size = np.random.randint(
                self.short_edge_length[0], self.short_edge_length[1] + 1
            )
            if size == 0:
                out.append(img)
                continue
            scale = size * 1.0 / min(h, w)
            if h < w:
                newh, neww = size, scale * w
            else:
                newh, neww = scale * h, size
            if max(newh, neww) > self.max_size:
                scale = self.max_size * 1.0 / max(newh, neww)
                newh, neww = newh * scale, neww * scale
            newh, neww = int(newh + 0.5), int(neww + 0.5)
            pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
            pil = pil.resize((neww, newh), Image.BILINEAR)
            out.append(np.asarray(pil, np.float32))
        return out


def img_tensorize(im: str) -> np.ndarray:
    """Path -> HWC RGB float array (reference frcnn_processor.py:177-187;
    URLs need egress and raise here)."""
    assert isinstance(im, str)
    if not os.path.isfile(im):
        raise RuntimeError(
            f"{im} is not a local file; URL loading requires network egress"
        )
    return np.asarray(Image.open(im).convert("RGB"), np.float32)


@registry.register_processor("frcnn_preprocess")
class FRCNNPreprocess(BaseProcessor):
    def __init__(self, config, *args, **kwargs):
        config_input = config.get("input", None)
        assert config_input is not None
        min_size_test = config_input.get("min_size_test", 800)
        max_size_test = config_input.get("max_size_test", 1333)
        self.aug = ResizeShortestEdge(
            [min_size_test, min_size_test], max_size_test
        )
        self.input_format = config_input.get("format", "BGR")
        self.size_divisibility = config.get("size_divisibility", 0)
        self.pad_value = config.get("pad_value", 0)
        config_model = config.get("model", None)
        assert config_model is not None
        pixel_std = np.asarray(
            config_model.get("pixel_std", [1.0, 1.0, 1.0]), np.float32
        ).reshape(-1, 1, 1)
        pixel_mean = np.asarray(
            config_model.get("pixel_mean", [102.9801, 115.9465, 122.7717]),
            np.float32,
        ).reshape(-1, 1, 1)
        self.normalizer = lambda x: (x - pixel_mean) / pixel_std

    def pad(self, images: List[np.ndarray]):
        """CHW list -> (N,C,maxH,maxW) + per-image (h, w)."""
        max_size = tuple(max(s) for s in zip(*[im.shape for im in images]))
        image_sizes = [im.shape[-2:] for im in images]
        padded = []
        for im in images:
            pad_h = max_size[-2] - im.shape[-2]
            pad_w = max_size[-1] - im.shape[-1]
            padded.append(
                np.pad(
                    im, [(0, 0), (0, pad_h), (0, pad_w)],
                    constant_values=self.pad_value,
                )
            )
        return np.stack(padded), np.asarray(image_sizes, np.float32)

    def __call__(self, images: Union[str, np.ndarray, list],
                 single_image: bool = False):
        if not isinstance(images, list):
            images = [images]
        if single_image:
            assert len(images) == 1
        images = [
            img_tensorize(im) if isinstance(im, str)
            else np.asarray(im, np.float32)
            for im in images
        ]

        raw_sizes = np.asarray([im.shape[:2] for im in images], np.float32)
        images = self.aug(images)
        # HWC RGB -> CHW BGR, normalize before pad
        images = [
            self.normalizer(im[:, :, ::-1].transpose(2, 0, 1))
            for im in images
        ]
        images, sizes = self.pad(images)
        if self.size_divisibility > 0:
            raise NotImplementedError()
        scales_yx = raw_sizes / sizes
        if single_image:
            return images[0], sizes[0], scales_yx[0]
        return images, sizes, scales_yx
