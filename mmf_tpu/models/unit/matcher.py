"""Hungarian matcher for UniT's detection losses
(parity with mmf/models/unit/matcher.py:124).

The cost matrix (class + L1 + GIoU) is computed in-graph; the assignment
itself runs through ``jax.pure_callback`` to scipy's
linear_sum_assignment with fixed [num_queries]-shaped outputs, keeping the
training step jittable."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou


def _assign_host(cost: np.ndarray, num_targets: np.ndarray) -> np.ndarray:
    """cost [B, Q, T_max]; returns for each query the matched target index
    or -1 (host-side scipy)."""
    from scipy.optimize import linear_sum_assignment

    B, Q, _ = cost.shape
    out = np.full((B, Q), -1, np.int32)
    for b in range(B):
        t = int(num_targets[b])
        if t == 0:
            continue
        row, col = linear_sum_assignment(cost[b, :, :t])
        out[b, row] = col
    return out


class HungarianMatcher:
    def __init__(self, cost_class: float = 1.0, cost_bbox: float = 5.0,
                 cost_giou: float = 2.0):
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou

    def __call__(self, pred_logits, pred_boxes, tgt_labels, tgt_boxes,
                 num_targets):
        """pred_logits [B,Q,C], pred_boxes [B,Q,4] (cxcywh), tgt_labels
        [B,T] int, tgt_boxes [B,T,4], num_targets [B]. Returns match [B,Q]
        with target index or -1."""
        prob = jax.nn.softmax(pred_logits, axis=-1)

        def per_batch(p, boxes, labels, tboxes):
            cost_class = -jnp.take_along_axis(
                p, labels[None, :].astype(jnp.int32).repeat(p.shape[0], 0),
                axis=1,
            )
            cost_bbox = jnp.sum(
                jnp.abs(boxes[:, None, :] - tboxes[None, :, :]), axis=-1
            )
            cost_giou = -generalized_box_iou(
                box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(tboxes)
            )
            return (
                self.cost_class * cost_class
                + self.cost_bbox * cost_bbox
                + self.cost_giou * cost_giou
            )

        cost = jax.vmap(per_batch)(prob, pred_boxes, tgt_labels, tgt_boxes)
        # the assignment is discrete — no gradient flows through the
        # matcher (reference matcher.py runs under @torch.no_grad())
        match = jax.pure_callback(
            _assign_host,
            jax.ShapeDtypeStruct(pred_logits.shape[:2], jnp.int32),
            jax.lax.stop_gradient(cost), num_targets,
        )
        return match
