"""Box utilities for UniT (parity with mmf/utils/box_ops.py): cxcywh/xyxy
conversion and generalized IoU, in jnp (jit-safe)."""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x):
    x_c, y_c, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [x_c - 0.5 * w, y_c - 0.5 * h, x_c + 0.5 * w, y_c + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x):
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU: [N,4],[M,4] -> iou [N,M], union [N,M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-6), union


def generalized_box_iou(boxes1, boxes2):
    """GIoU from https://giou.stanford.edu/ (reference box_ops.py)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-6)
