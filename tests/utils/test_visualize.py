import os

import numpy as np
import pytest
from PIL import Image

from mmf_tpu.utils.features.visualizing_image import SingleImageViz
from mmf_tpu.utils.visualize import (
    make_grid,
    visualize_frcnn_features,
    visualize_images,
)


def _rand_img(h=48, w=36):
    return Image.fromarray(
        np.random.randint(0, 255, (h, w, 3), dtype=np.uint8)
    )


def test_visualize_images_grid():
    grid = visualize_images([_rand_img() for _ in range(5)], (32, 32))
    assert grid.dtype == np.uint8
    # 5 images, one row of 5 + padding
    assert grid.shape == (32 + 2 * 2, 5 * (32 + 2) + 2, 3)


def test_visualize_images_requires_size_for_multiple():
    with pytest.raises(AssertionError):
        visualize_images([_rand_img(), _rand_img()], size=None)


def test_make_grid_wraps_rows():
    imgs = [np.zeros((8, 8, 3), np.uint8) for _ in range(10)]
    grid = make_grid(imgs, nrow=4, padding=1)
    # 10 images at 4 per row -> 3 rows
    assert grid.shape == (3 * 9 + 1, 4 * 9 + 1, 3)


def test_single_image_viz_draws_and_saves(tmp_path):
    img = np.random.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    viz = SingleImageViz(img, id2obj=["cat", "dog"], id2attr=["red", "blue"])
    viz.draw_boxes(
        np.array([[4, 4, 40, 50], [10, 12, 30, 30]], np.float32),
        obj_ids=np.array([0, 1]),
        obj_scores=np.array([0.9, 0.6]),
        attr_ids=np.array([1, 0]),
        attr_scores=np.array([0.5, 0.7]),
    )
    out = str(tmp_path / "viz.jpg")
    viz.save(out)
    assert os.path.exists(out)
    buf = viz._get_buffer()
    assert buf.shape[2] == 3


def test_visualize_frcnn_features(tmp_path):
    ip = str(tmp_path / "img.jpg")
    _rand_img(64, 48).save(ip)
    feats = {
        "boxes": np.array([[2, 2, 30, 40]], np.float32),
        "obj_ids": np.array([0]),
        "obj_probs": np.array([0.9]),
        "attr_ids": np.array([1]),
        "attr_probs": np.array([0.5]),
    }
    fp = str(tmp_path / "f.npy")
    np.save(fp, feats, allow_pickle=True)
    out = visualize_frcnn_features(ip, fp, ["cat"], ["red", "blue"])
    assert out.shape[2] == 3
