"""Self-contained COCO bbox detection evaluation (the COCOeval protocol
in numpy — IoU thresholds 0.5:0.05:0.95, 101-point interpolated AP,
maxDets=100, greedy score-ordered matching with crowd handling). Used by
the detection_mean_ap metric when pycocotools is not installed.

Implements the metric definition from the COCO detection challenge; the
headline number returned equals pycocotools' ``stats[0]``
(AP@[.50:.95] | area=all | maxDets=100).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Any, Dict, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _xywh_iou(dets: np.ndarray, gts: np.ndarray,
              iscrowd: np.ndarray) -> np.ndarray:
    """IoU between [D,4] and [G,4] xywh boxes; crowd GTs use intersection
    over detection area (pycocotools semantics)."""
    D, G = len(dets), len(gts)
    out = np.zeros((D, G), np.float64)
    for g in range(G):
        gx, gy, gw, gh = gts[g]
        garea = gw * gh
        for d in range(D):
            dx, dy, dw, dh = dets[d]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            if iw <= 0:
                continue
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[g] else dw * dh + garea - inter
            if union > 0:
                out[d, g] = inter / union
    return out


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, gt_crowd):
    """Greedy COCOeval matching for one (image, category).

    Returns (tp[T,D], dt_ignore[T,D]) with detections in score order.
    GTs are visited non-ignored first; a det locked to an ignored GT is
    excluded from scoring at that threshold (pycocotools evaluateImg)."""
    T = len(IOU_THRS)
    D = len(det_boxes)
    G = len(gt_boxes)
    tp = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    if G == 0:
        return tp, dt_ig

    order_g = np.argsort(gt_ignore, kind="mergesort")  # non-ignored first
    ious = _xywh_iou(det_boxes, gt_boxes, gt_crowd)
    for t, thr in enumerate(IOU_THRS):
        gt_matched = np.zeros(G, bool)
        for d in range(D):
            best = -1
            best_iou = float(thr)
            for g in order_g:
                if gt_matched[g] and not gt_crowd[g]:
                    continue
                # after a real match, ignored GTs can't improve it
                if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best = g
            if best == -1:
                continue
            if gt_ignore[best]:
                dt_ig[t, d] = True
            else:
                gt_matched[best] = True
                tp[t, d] = True
    return tp, dt_ig


class CocoBboxEvaluator:
    """Evaluate predictions against a COCO instances json."""

    def __init__(self, gt_json_path: str):
        with open(gt_json_path) as f:
            gt = json.load(f)
        self.cat_ids = sorted(c["id"] for c in gt.get("categories", []))
        self.img_ids = [im["id"] for im in gt.get("images", [])]
        self._gt = defaultdict(list)  # (img, cat) -> anns
        for ann in gt.get("annotations", []):
            self._gt[(ann["image_id"], ann["category_id"])].append(ann)

    def evaluate(self, predictions: Sequence[Dict[str, Any]]) -> float:
        """predictions: [{image_id, category_id, bbox xywh, score}].
        Returns mean AP@[.50:.95] over categories with ground truth."""
        dts = defaultdict(list)
        for p in predictions:
            dts[(p["image_id"], p["category_id"])].append(p)

        T = len(IOU_THRS)
        ap_per_cat = []
        for cat in self.cat_ids:
            tp_list, ig_list, score_list = [], [], []
            n_gt = 0
            has_gt = False
            for img in self.img_ids:
                gts = self._gt.get((img, cat), [])
                det = sorted(dts.get((img, cat), []),
                             key=lambda d: -d["score"])[:MAX_DETS]
                if gts:
                    has_gt = True
                gt_crowd = np.asarray(
                    [int(g.get("iscrowd", 0)) for g in gts], bool
                )
                gt_ignore = np.asarray(
                    [bool(g.get("ignore", 0)) or bool(g.get("iscrowd", 0))
                     for g in gts], bool,
                )
                n_gt += int((~gt_ignore).sum()) if len(gts) else 0
                if not det:
                    continue
                tp, dt_ig = _match_image(
                    np.asarray([d["bbox"] for d in det], np.float64),
                    np.asarray([d["score"] for d in det]),
                    np.asarray([g["bbox"] for g in gts], np.float64)
                    if gts else np.zeros((0, 4)),
                    gt_ignore, gt_crowd,
                )
                tp_list.append(tp)
                ig_list.append(dt_ig)
                score_list.extend(d["score"] for d in det)

            if not has_gt:
                continue  # category absent from GT: excluded from the mean
            if not score_list or n_gt == 0:
                ap_per_cat.append(0.0)
                continue

            order = np.argsort(-np.asarray(score_list), kind="mergesort")
            tp_all = np.concatenate(tp_list, axis=1)[:, order]
            ig_all = np.concatenate(ig_list, axis=1)[:, order]

            ap_t = []
            for t in range(T):
                keep = ~ig_all[t]
                tps = tp_all[t][keep]
                tp_cum = np.cumsum(tps)
                fp_cum = np.cumsum(~tps)
                recall = tp_cum / n_gt
                precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
                for i in range(len(precision) - 1, 0, -1):
                    precision[i - 1] = max(precision[i - 1], precision[i])
                if len(precision):
                    idx = np.searchsorted(recall, RECALL_THRS, side="left")
                    q = np.where(
                        idx < len(precision),
                        precision[np.minimum(idx, len(precision) - 1)],
                        0.0,
                    )
                else:
                    q = np.zeros_like(RECALL_THRS)
                ap_t.append(q.mean())
            ap_per_cat.append(float(np.mean(ap_t)))

        return float(np.mean(ap_per_cat)) if ap_per_cat else -1.0
