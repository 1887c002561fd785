"""Image/feature visualization helpers.

Parity with mmf/utils/visualize.py:14-77 (torchvision make_grid +
matplotlib imshow) rebuilt on numpy/PIL: ``visualize_images`` tiles PIL
images into a grid array and shows it via matplotlib when available,
``visualize_frcnn_features`` renders extracted FRCNN boxes over the image
with SingleImageViz.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np
from PIL import Image

from mmf_tpu.utils.features.visualizing_image import SingleImageViz


def make_grid(
    images: List[np.ndarray], nrow: int = 8, padding: int = 2
) -> np.ndarray:
    """Tile a list of equal-shaped HWC uint8 arrays into one grid image
    (the numpy analog of torchvision.utils.make_grid)."""
    n = len(images)
    h, w = images[0].shape[:2]
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, 3),
        dtype=np.uint8,
    )
    for idx, img in enumerate(images):
        r, c = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = c * (w + padding) + padding
        grid[y : y + h, x : x + w] = img
    return grid


def visualize_images(
    images: List[Any],
    size: Optional[Tuple[int, int]] = (224, 224),
    *args,
    **kwargs,
):
    """Visualize a set of images in a grid. Expects PIL images (or HWC
    arrays), optionally resized to ``size``; if ``size`` is None only a
    single image is accepted (reference visualize.py:14-51).

    Returns the grid as an HWC uint8 numpy array; also shows it with
    matplotlib when matplotlib is importable (optional on TPU hosts).
    """
    assert size is not None or len(images) == 1, (
        "If size is not passed, only one image can be visualized"
    )

    arrays = []
    for image in images:
        if isinstance(image, np.ndarray):
            image = Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))
        if size is not None:
            image = image.resize((size[1], size[0]), Image.BILINEAR)
        arrays.append(np.asarray(image.convert("RGB")))

    grid = make_grid(arrays, *args, **kwargs)

    try:
        import matplotlib.pyplot as plt

        plt.axis("off")
        plt.imshow(grid)
    except ImportError:
        pass  # headless TPU host: caller uses the returned array
    return grid


def visualize_frcnn_features(
    image_path: str, features_path: str, objids: List[str], attrids: List[str]
):
    """Draw extracted FRCNN boxes/labels over the source image
    (reference visualize.py:54-77). ``features_path`` is an .npy dict with
    boxes / obj_ids / obj_probs / attr_ids / attr_probs."""
    img = np.asarray(Image.open(image_path).convert("RGB"))

    output_dict = np.load(features_path, allow_pickle=True).item()

    frcnn_visualizer = SingleImageViz(img, id2obj=objids, id2attr=attrids)
    frcnn_visualizer.draw_boxes(
        output_dict.get("boxes"),
        output_dict.pop("obj_ids"),
        output_dict.pop("obj_probs"),
        output_dict.pop("attr_ids"),
        output_dict.pop("attr_probs"),
    )

    height, width, _ = img.shape
    buffer = frcnn_visualizer._get_buffer()
    array = np.uint8(np.clip(buffer, 0, 255))
    return visualize_images([Image.fromarray(array)], (height, width))
