"""Detection primitives: box coding round-trip, NMS vs a numpy reference,
ROIAlign analytics, and the full GeneralizedRCNN forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.ops.detection import (
    box_decode,
    clip_boxes,
    nms_fixed,
    roi_align,
)


def test_box_decode_zero_deltas_identity():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [5, 5, 25, 15]], jnp.float32
    )
    out = box_decode(anchors, jnp.zeros((2, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors),
                               atol=1e-5)


def test_box_decode_shift():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    # dx = 0.5 -> center moves by 0.5 * width = 5
    out = box_decode(anchors, jnp.asarray([[0.5, 0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out[0]), [5, 0, 15, 10],
                               atol=1e-4)


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 100.0, 100.0]])
    out = clip_boxes(boxes, 30, 40)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 0, 40, 30])


def _nms_numpy(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] == -np.inf:
            continue
        keep.append(i)
        x0 = np.maximum(boxes[i, 0], boxes[:, 0])
        y0 = np.maximum(boxes[i, 1], boxes[:, 1])
        x1 = np.minimum(boxes[i, 2], boxes[:, 2])
        y1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-9)
        suppressed |= iou > thr
    return keep


def test_nms_matches_numpy_reference():
    rng = np.random.RandomState(0)
    n = 60
    xy = rng.rand(n, 2) * 50
    wh = rng.rand(n, 2) * 30 + 2
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)

    expected = _nms_numpy(boxes, scores.copy(), 0.5)
    idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                           topk=n)
    got = np.asarray(idx)[np.asarray(valid)]
    assert got.tolist() == expected


def test_nms_fixed_output_padding():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [0.5, 0.5, 10, 10], [40, 40, 60, 60]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = nms_fixed(boxes, scores, 0.5, topk=5)
    assert valid.shape == (5,)
    assert int(valid.sum()) == 2  # box 1 suppressed by box 0
    kept = np.asarray(idx)[np.asarray(valid)]
    assert set(kept.tolist()) == {0, 2}


def test_roi_align_constant_field():
    feat = jnp.full((8, 8, 3), 7.0)
    boxes = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])  # full image at scale 1/16... -> 4x4 in feat
    out = roi_align(feat, boxes, output_size=2, spatial_scale=1.0 / 16)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_linear_ramp():
    # f(y, x) = x: bilinear sampling of a linear field is exact
    xs = jnp.tile(jnp.arange(16.0)[None, :, None], (16, 1, 1))
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])  # feat coords (scale=1)
    out = roi_align(xs, boxes, output_size=2, spatial_scale=1.0,
                    sampling_ratio=2)
    # bins span x in [4, 8] and [8, 12]; mean of samples = bin center
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :, 0]), [6.0, 10.0], atol=1e-4
    )


def test_generalized_rcnn_forward():
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    from mmf_tpu.common.registry import registry

    cls = registry.get_model_class("frcnn")
    model = cls(config={"depth": 50, "pre_nms_topk": 32,
                        "post_nms_topk": 6})
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32
        )
    }
    v = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(v, batch, False)
    assert out["roi_features"].shape == (1, 6, 2048)
    assert out["boxes"].shape == (1, 6, 4)
    assert out["valid"].dtype == jnp.bool_

    with pytest.raises(NotImplementedError):
        model.apply(v, batch, True, rngs={"dropout": jax.random.PRNGKey(0)})
