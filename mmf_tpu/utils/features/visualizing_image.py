"""Detection-box visualizer over PIL.

Parity with the reference's SingleImageViz
(mmf/utils/features/visualizing_image.py:57-305), which renders FRCNN
boxes/labels with a matplotlib Agg canvas. Rebuilt on PIL.ImageDraw — no
matplotlib/torch dependency, same API surface (draw_boxes, add_box,
draw_labels, save, _get_buffer).
"""

from __future__ import annotations

import colorsys
import os
from typing import List, Optional, Union

import numpy as np
from PIL import Image, ImageDraw

_SMALL_OBJ = 1000


class SingleImageViz:
    def __init__(
        self,
        img: Union[str, np.ndarray],
        scale: float = 1.2,
        edgecolor: str = "green",
        alpha: float = 0.5,
        linestyle: str = "-",
        saveas: str = "test_out.jpg",
        rgb: bool = True,
        pynb: bool = False,
        id2obj: Optional[List[str]] = None,
        id2attr: Optional[List[str]] = None,
        pad: float = 0.7,
    ):
        """img: an RGB uint8 image of shape (H, W, 3) or a path to one."""
        if isinstance(img, str):
            img = np.asarray(Image.open(img).convert("RGB"))
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if not rgb:
            img = img[:, :, ::-1]

        self.height, self.width = img.shape[:2]
        self.scale = scale
        self.saveas = saveas
        self.id2obj = id2obj
        self.id2attr = id2attr
        self.edgecolor = edgecolor
        self.font_size = max(int(np.sqrt(self.height * self.width) // 50), 10)
        self._rng = np.random.default_rng(0)

        if scale != 1.0:
            new_size = (int(self.width * scale), int(self.height * scale))
            pil = Image.fromarray(img).resize(new_size, Image.BILINEAR)
        else:
            pil = Image.fromarray(img)
        self.image = pil
        self.draw = ImageDraw.Draw(self.image, "RGBA")

    # -- drawing ----------------------------------------------------------
    def add_box(self, box: np.ndarray, color=None):
        """box: (x0, y0, x1, y1) in original-image coords."""
        if color is None:
            color = self.edgecolor
        x0, y0, x1, y1 = (np.asarray(box, np.float64) * self.scale).tolist()
        width = max(int(self.font_size / 4), 1)
        self.draw.rectangle(
            [x0, y0, x1, y1], outline=self._to_rgb(color), width=width
        )

    def draw_boxes(self, boxes, obj_ids=None, obj_scores=None, attr_ids=None,
                   attr_scores=None):
        boxes = np.asarray(boxes)
        if boxes.ndim == 1:
            boxes = boxes[None]
        if self.id2obj is not None and obj_ids is not None:
            if attr_ids is not None and self.id2attr is not None:
                labels = self._create_text_labels_attr(
                    obj_ids, obj_scores, attr_ids, attr_scores
                )
            else:
                labels = self._create_text_labels(obj_ids, obj_scores)
        else:
            labels = [None] * len(boxes)

        # draw big boxes first so small ones stay visible (reference :137)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        order = np.argsort(-areas)
        for i in order:
            color = self._random_color()
            self.add_box(boxes[i], color)
            if labels[i] is not None:
                self.draw_labels(labels[i], boxes[i], color)

    def draw_labels(self, label: str, box: np.ndarray, color):
        x0, y0, _, _ = (np.asarray(box, np.float64) * self.scale).tolist()
        self.draw_text(label, (x0, y0), color)

    def draw_text(self, text: str, position, color):
        x, y = position
        bbox = self.draw.textbbox((x, y), text)
        self.draw.rectangle(bbox, fill=(0, 0, 0, 160))
        bright = self._change_color_brightness(self._to_rgb(color), 0.7)
        self.draw.text((x, y), text, fill=bright)

    # -- output ------------------------------------------------------------
    def save(self, saveas: Optional[str] = None):
        saveas = saveas or self.saveas
        os.makedirs(os.path.dirname(os.path.abspath(saveas)), exist_ok=True)
        self.image.save(saveas)

    def _get_buffer(self) -> np.ndarray:
        return np.asarray(self.image).astype(np.float64)

    # -- label helpers (reference :228-261) ---------------------------------
    def _create_text_labels_attr(self, classes, scores, attr_classes,
                                 attr_scores):
        labels = self._create_text_labels(classes, scores)
        attr_classes = np.asarray(attr_classes).tolist()
        attr_scores = np.asarray(attr_scores).tolist()
        return [
            f"{self.id2attr[int(a)]} {lab} {s:.2f}"
            for lab, a, s in zip(labels, attr_classes, attr_scores)
        ]

    def _create_text_labels(self, classes, scores):
        classes = np.asarray(classes).tolist()
        labels = [self.id2obj[int(c)] for c in classes]
        if scores is not None:
            scores = np.asarray(scores).tolist()
            labels = [
                f"{lab} {s * 100:.0f}%" for lab, s in zip(labels, scores)
            ]
        return labels

    # -- colors --------------------------------------------------------------
    def _random_color(self):
        h = float(self._rng.uniform(0, 1))
        r, g, b = colorsys.hsv_to_rgb(h, 0.9, 0.9)
        return (int(r * 255), int(g * 255), int(b * 255))

    @staticmethod
    def _to_rgb(color):
        if isinstance(color, tuple):
            return color
        named = {
            "g": (0, 200, 0), "green": (0, 200, 0), "r": (220, 0, 0),
            "red": (220, 0, 0), "b": (0, 0, 220), "blue": (0, 0, 220),
            "w": (255, 255, 255), "white": (255, 255, 255),
        }
        return named.get(color, (0, 200, 0))

    @staticmethod
    def _change_color_brightness(color, brightness_factor):
        h, l, s = colorsys.rgb_to_hls(*[c / 255.0 for c in color])
        l = min(max(l + brightness_factor * (1.0 - l), 0.0), 1.0)
        r, g, b = colorsys.hls_to_rgb(h, l, s)
        return (int(r * 255), int(g * 255), int(b * 255))
