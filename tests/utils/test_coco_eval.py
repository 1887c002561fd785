"""In-repo COCO bbox evaluator: analytically-known AP cases following the
COCOeval protocol (101-pt interpolation, IoU 0.5:0.95, crowd handling)."""

import json

import numpy as np
import pytest

from mmf_tpu.utils.coco_eval import CocoBboxEvaluator, IOU_THRS


@pytest.fixture()
def gt_json(tmp_path):
    def write(annotations, categories=({"id": 1, "name": "cat"},),
              images=({"id": 0},)):
        p = tmp_path / "gt.json"
        p.write_text(json.dumps({
            "images": list(images),
            "annotations": list(annotations),
            "categories": list(categories),
        }))
        return str(p)

    return write


def _ann(aid, img, cat, bbox, **kw):
    return dict(id=aid, image_id=img, category_id=cat, bbox=bbox,
                area=bbox[2] * bbox[3], iscrowd=0, **kw)


def test_perfect_predictions_give_ap_1(gt_json):
    gt = gt_json([_ann(1, 0, 1, [10, 10, 20, 20]),
                  _ann(2, 0, 1, [50, 50, 10, 10])])
    preds = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 10, 10],
         "score": 0.8},
    ]
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(1.0)


def test_no_predictions_give_ap_0(gt_json):
    gt = gt_json([_ann(1, 0, 1, [10, 10, 20, 20])])
    assert CocoBboxEvaluator(gt).evaluate([]) == pytest.approx(0.0)


def test_miss_localized_prediction_scores_by_iou(gt_json):
    """A det with IoU 0.6 counts as TP only at thresholds <= 0.6:
    3 of 10 thresholds -> AP = 3/10 (single GT, perfect P/R there)."""
    gt = gt_json([_ann(1, 0, 1, [0, 0, 10, 10])])
    # overlap 6x10 over union 14x10 -> wait: shift x by 4 -> inter 6*10=60,
    # union 100+100-60=140 -> IoU ~0.4286. Use y-shift 2 instead:
    # inter 10*8=80, union 120 -> IoU 0.6667 -> thresholds .5,.55,.6,.65
    preds = [{"image_id": 0, "category_id": 1, "bbox": [0, 2, 10, 10],
              "score": 0.9}]
    expected = np.mean(IOU_THRS <= 80 / 120)
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(
        float(expected), abs=1e-9
    )


def test_false_positive_halves_precision_curve(gt_json):
    """One TP (rank 1) + one FP (rank 2) on a single GT: at every IoU
    threshold recall reaches 1.0 at precision 1.0 -> AP 1.0 still (the FP
    ranks after the TP)."""
    gt = gt_json([_ann(1, 0, 1, [0, 0, 10, 10])])
    preds = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [80, 80, 5, 5],
         "score": 0.1},
    ]
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(1.0)


def test_fp_ranked_first_caps_precision(gt_json):
    """FP at rank 1, TP at rank 2: precision at full recall is 1/2, and
    the 101-pt envelope gives AP = (100 recall points >0 at p=0.5 + r=0
    point at 0.5)... concretely: recall jumps 0->1 at det2; envelope
    precision = 0.5 everywhere -> AP = 0.5."""
    gt = gt_json([_ann(1, 0, 1, [0, 0, 10, 10])])
    preds = [
        {"image_id": 0, "category_id": 1, "bbox": [80, 80, 5, 5],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
         "score": 0.5},
    ]
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(0.5)


def test_crowd_gt_not_counted_not_penalized(gt_json):
    """A det matching only a crowd GT is ignored (not FP); crowd GTs do
    not add to n_gt."""
    gt = gt_json([
        _ann(1, 0, 1, [0, 0, 10, 10]),
        dict(id=2, image_id=0, category_id=1, bbox=[50, 50, 30, 30],
             area=900, iscrowd=1),
    ])
    preds = [
        {"image_id": 0, "category_id": 1, "bbox": [55, 55, 20, 20],
         "score": 0.95},  # inside the crowd region -> ignored
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
         "score": 0.9},   # TP on the real GT
    ]
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(1.0)


def test_mean_over_categories(gt_json):
    gt = gt_json(
        [_ann(1, 0, 1, [0, 0, 10, 10]), _ann(2, 0, 2, [30, 30, 10, 10])],
        categories=[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    )
    preds = [  # perfect on cat 1, nothing on cat 2
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
         "score": 0.9},
    ]
    assert CocoBboxEvaluator(gt).evaluate(preds) == pytest.approx(0.5)
