"""Detection primitives: box coding, greedy NMS, ROIAlign — XLA-native.

These back the in-repo GeneralizedRCNN (models/frcnn.py). Everything is
static-shape by construction: NMS returns a fixed number of indices
(padded), ROIAlign takes a fixed box count — so the whole region-feature
extractor compiles to one TPU program (the reference's detectron2 stack
is dynamic-shape CUDA; mmf/models/frcnn.py:203-263).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# detectron2's default delta clamp: log(1000/16)
_DELTA_CLAMP = 4.135166556742356


def box_decode(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Faster R-CNN box decoding: anchors [N,4] xyxy + deltas [N,4]
    (dx,dy,dw,dh) -> boxes [N,4] xyxy."""
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights

    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    dw = jnp.clip(dw, max=_DELTA_CLAMP)
    dh = jnp.clip(dh, max=_DELTA_CLAMP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=1,
    )


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    x0 = jnp.clip(boxes[:, 0], 0, width)
    y0 = jnp.clip(boxes[:, 1], 0, height)
    x1 = jnp.clip(boxes[:, 2], 0, width)
    y1 = jnp.clip(boxes[:, 3], 0, height)
    return jnp.stack([x0, y0, x1, y1], axis=1)


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N,4] xyxy -> [N,N] IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    topk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a FIXED output count.

    Returns (indices [topk], valid [topk] bool). Slots past the number of
    surviving boxes hold index 0 with valid=False. O(topk·N) vectorized —
    the precomputed [N,N] IoU keeps each step a masked argmax + row
    gather, which XLA fuses well for N up to a few thousand.
    """
    n = boxes.shape[0]
    iou = _iou_matrix(boxes)

    def body(state, _):
        alive_scores, = state
        idx = jnp.argmax(alive_scores)
        best = alive_scores[idx]
        valid = best > -jnp.inf
        # suppress the chosen box and everything overlapping it
        suppress = iou[idx] > iou_threshold
        suppress = suppress | (jnp.arange(n) == idx)
        alive_scores = jnp.where(
            valid & suppress, -jnp.inf, alive_scores
        )
        return (alive_scores,), (idx, valid)

    (_,), (indices, valid) = jax.lax.scan(
        body, (scores,), None, length=topk
    )
    return indices, valid


def _bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """feat [H,W,C]; y/x [...]-shaped sample coords -> [..., C]."""
    h, w = feat.shape[0], feat.shape[1]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign over ONE image: features [H,W,C], boxes [R,4] xyxy in
    image coords -> [R, output_size, output_size, C].

    Matches detectron2's aligned=False variant (the caffe2 lineage the
    reference FRCNN weights expect): no half-pixel offset, bin-uniform
    sample grid averaged per bin.
    """
    boxes = boxes * spatial_scale
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = jnp.maximum(x1 - x0, 1.0) / output_size  # [R]
    bin_h = jnp.maximum(y1 - y0, 1.0) / output_size

    s = sampling_ratio
    # sample offsets within a bin: (k + 0.5)/s for k in [0, s)
    offs = (jnp.arange(s) + 0.5) / s  # [s]
    grid = jnp.arange(output_size)  # [P]

    # y coords: [R, P, s] ; x coords: [R, P, s]
    ys = y0[:, None, None] + (grid[None, :, None] + offs[None, None, :]) \
        * bin_h[:, None, None]
    xs = x0[:, None, None] + (grid[None, :, None] + offs[None, None, :]) \
        * bin_w[:, None, None]

    # full sample lattice [R, P, s, P, s]
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    sampled = _bilinear_sample(features, yy, xx)  # [R,P,s,P,s,C]
    return sampled.mean(axis=(2, 4))  # average samples per bin
