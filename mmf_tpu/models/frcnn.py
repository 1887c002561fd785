"""GeneralizedRCNN: in-repo region-feature extractor, XLA edition.

Parity with mmf/models/frcnn.py:103-263, which wraps detectron2's
caffe2-lineage Faster R-CNN (ResNet-C4 backbone -> RPN -> Res5 ROI heads,
mean-pooled 2048-d region features for the interactive Inference
pipeline). That stack is dynamic-shape CUDA; this one is a single static
TPU program:

  - FrozenBatchNorm (inference extractor; BN folded to scale/shift);
  - caffe-style bottlenecks (stride in the 1x1 conv, detectron2
    resnet.py lineage);
  - fixed proposal counts: top-k pre-NMS, greedy NMS with a fixed output
    slot count (ops/detection.py), padded with a validity mask instead of
    ragged lists;
  - ROIAlign as vectorized bilinear gathers.

Inference-only, like the reference (frcnn.py:218 raises on training).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.bottleneck import FrozenBatchNorm2d
from mmf_tpu.ops.detection import (
    box_decode,
    clip_boxes,
    nms_fixed,
    roi_align,
)

_BLOCKS_PER_DEPTH = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3],
                     152: [3, 8, 36, 3]}


class CaffeBottleneck(nn.Module):
    """Bottleneck with the stride on the 1x1 conv and frozen BN
    (detectron2 caffe2-compatible variant)."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.bottleneck_channels, (1, 1),
                    strides=self.stride, use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm2d(self.bottleneck_channels, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.bottleneck_channels, (3, 3), strides=1,
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm2d(self.bottleneck_channels, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = FrozenBatchNorm2d(self.out_channels, name="bn3")(y)
        if residual.shape[-1] != self.out_channels or self.stride != 1:
            residual = nn.Conv(self.out_channels, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="shortcut")(residual)
            residual = FrozenBatchNorm2d(self.out_channels,
                                         name="shortcut_bn")(residual)
        return nn.relu(y + residual)


class Stem(nn.Module):
    """conv7x7/2 + frozen BN + caffe ceil-mode maxpool
    (reference BasicStem, frcnn.py:108-150)."""

    out_channels: int = 64
    caffe_maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (7, 7), strides=2, padding=3,
                    use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm2d(self.out_channels, name="bn1")(x)
        x = nn.relu(x)
        if self.caffe_maxpool:
            # ceil mode: pad bottom/right so the 3x3/2 window covers edges
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)))
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        return x


class RPNHead(nn.Module):
    """3x3 conv trunk + objectness/deltas 1x1 heads
    (reference _fix_proposal_generator, frcnn.py:166-190)."""

    num_anchors: int
    hidden_channels: int

    @nn.compact
    def __call__(self, x):
        t = nn.relu(nn.Conv(self.hidden_channels, (3, 3), padding=1,
                            name="conv")(x))
        logits = nn.Conv(self.num_anchors, (1, 1),
                         name="objectness_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         name="anchor_deltas")(t)
        return logits, deltas


def generate_anchors(feat_h: int, feat_w: int, stride: int,
                     sizes: Sequence[float],
                     aspect_ratios: Sequence[float]) -> jnp.ndarray:
    """Dense anchor grid [H*W*A, 4] xyxy, cell-centered."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = (area / ar) ** 0.5
            h = w * ar
            cell.append([-w / 2, -h / 2, w / 2, h / 2])
    cell = jnp.asarray(cell, jnp.float32)  # [A,4]
    shift_x = (jnp.arange(feat_w) + 0.5) * stride
    shift_y = (jnp.arange(feat_h) + 0.5) * stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # [H,W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # [H,W,4]
    anchors = shifts[:, :, None, :] + cell[None, None, :, :]
    return anchors.reshape(-1, 4)


class GeneralizedRCNN(nn.Module):
    """images NHWC -> (region features, boxes, scores, valid mask)."""

    depth: int = 50
    stride_hw: int = 16  # C4 feature stride
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 1000
    post_nms_topk: int = 100
    nms_threshold: float = 0.7
    rpn_hidden_channels: int = 512
    res5_halve: bool = True
    roi_output_size: int = 14

    def _stage(self, x, num_blocks, bottleneck, out, first_stride,
               name, dilation=1):
        for i in range(num_blocks):
            x = CaffeBottleneck(
                bottleneck_channels=bottleneck,
                out_channels=out,
                stride=first_stride if i == 0 else 1,
                dilation=dilation,
                name=f"{name}_{i}",
            )(x)
        return x

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 image_shapes: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """images [N,H,W,3] (preprocessed), image_shapes [N,2] (h, w)."""
        blocks = _BLOCKS_PER_DEPTH[self.depth]

        x = Stem(name="stem")(images)
        x = self._stage(x, blocks[0], 64, 256, 1, "res2")
        x = self._stage(x, blocks[1], 128, 512, 2, "res3")
        res4 = self._stage(x, blocks[2], 256, 1024, 2, "res4")

        fh, fw = res4.shape[1], res4.shape[2]
        num_anchors = len(self.anchor_sizes) * len(self.anchor_aspect_ratios)
        anchors = generate_anchors(
            fh, fw, self.stride_hw, self.anchor_sizes,
            self.anchor_aspect_ratios,
        )  # [HWA, 4]

        logits, deltas = RPNHead(
            num_anchors=num_anchors,
            hidden_channels=self.rpn_hidden_channels,
            name="rpn_head",
        )(res4)
        logits = logits.reshape(logits.shape[0], -1)  # [N, HWA]
        deltas = deltas.reshape(deltas.shape[0], -1, 4)

        # res5 ROI transform, shared across images in the batch
        res5_stride = 2 if self.res5_halve else 1
        res5_dilation = 1 if self.res5_halve else 2

        def res5(feat):
            return self._stage(
                feat, blocks[3], 512, 2048, res5_stride, "res5",
                dilation=res5_dilation,
            )

        outs = {"roi_features": [], "boxes": [], "scores": [], "valid": []}
        for img_idx in range(images.shape[0]):
            h = image_shapes[img_idx, 0]
            w = image_shapes[img_idx, 1]
            # top-k pre-NMS proposals (fixed k -> static shapes)
            k = min(self.pre_nms_topk, logits.shape[1])
            top_scores, top_idx = jax.lax.top_k(logits[img_idx], k)
            top_boxes = box_decode(
                anchors[top_idx], deltas[img_idx][top_idx]
            )
            top_boxes = clip_boxes(top_boxes, h, w)
            # drop degenerate boxes before NMS
            wh_ok = (top_boxes[:, 2] > top_boxes[:, 0]) & (
                top_boxes[:, 3] > top_boxes[:, 1]
            )
            top_scores = jnp.where(wh_ok, top_scores, -jnp.inf)
            keep, valid = nms_fixed(
                top_boxes, top_scores, self.nms_threshold,
                self.post_nms_topk,
            )
            boxes = top_boxes[keep] * valid[:, None]
            scores = jax.nn.sigmoid(top_scores[keep]) * valid

            pooled = roi_align(
                res4[img_idx], boxes,
                output_size=self.roi_output_size,
                spatial_scale=1.0 / self.stride_hw,
            )  # [R, P, P, 1024]
            feats = res5(pooled)  # [R, p, p, 2048]
            feats = feats.mean(axis=(1, 2))  # [R, 2048]
            feats = feats * valid[:, None]

            outs["roi_features"].append(feats)
            outs["boxes"].append(boxes)
            outs["scores"].append(scores)
            outs["valid"].append(valid)

        return {k: jnp.stack(v) for k, v in outs.items()}


@registry.register_model("frcnn")
class FRCNN(BaseModel):
    """Registered wrapper (reference frcnn.py:103): consumes preprocessed
    ``image`` [N,H,W,3] + ``image_shape`` [N,2] (from frcnn_preprocess,
    NCHW input also accepted) and returns padded region features."""

    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/frcnn/defaults.yaml"

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        if train:
            # inference-only extractor, like the reference (frcnn.py:218)
            raise NotImplementedError(
                "GeneralizedRCNN is an inference feature extractor; "
                "training the detector is out of scope (so too in the "
                "reference)."
            )
        c = self.config or {}
        images = sample_list["image"]
        if images.ndim == 3:
            images = images[None]
        if images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        default_shape = jnp.tile(
            jnp.asarray(images.shape[1:3], jnp.float32)[None],
            (images.shape[0], 1),
        )
        image_shapes = sample_list.get("image_shape", default_shape)
        core = GeneralizedRCNN(
            depth=c.get("depth", 50),
            pre_nms_topk=c.get("pre_nms_topk", 1000),
            post_nms_topk=c.get("post_nms_topk", 100),
            nms_threshold=c.get("nms_threshold", 0.7),
            res5_halve=c.get("res5_halve", True),
            name="generalized_rcnn",
        )
        out = core(images, image_shapes)
        out["objectness"] = out["scores"]
        out["scores"] = out["roi_features"]  # BaseModel contract
        return out
