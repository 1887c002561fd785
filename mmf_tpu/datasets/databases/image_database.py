"""Image database (parity with
mmf/datasets/databases/image_database.py): image-folder loading with a
transform hook; PIL loader."""

from __future__ import annotations

import os
from typing import Any, Optional

from mmf_tpu.utils.general import get_absolute_path


def get_possible_image_paths(path):
    image_path = path.split(".")
    if len(image_path) == 1 or image_path[-1] not in (
        "jpg", "jpeg", "png", "gif", "bmp",
    ):
        image_path = [
            ".".join(image_path) + ext
            for ext in [".jpg", ".jpeg", ".png"]
        ]
    else:
        image_path = [path]
    return image_path


def default_loader(path):
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


class ImageDatabase:
    """Map-style image loader keyed by annotation entries."""

    def __init__(self, config, path, annotation_db=None, transform=None,
                 loader=default_loader, is_valid_file=None, image_key=None,
                 *args, **kwargs):
        self.config = config
        self.base_path = get_absolute_path(path)
        self._transform = transform
        self._annotation_db = annotation_db
        self.loader = loader
        self.image_key = config.get("image_key", None)
        self.image_key = image_key if image_key else self.image_key
        self.is_valid_file = is_valid_file

    @property
    def annotation_db(self):
        return self._annotation_db

    @annotation_db.setter
    def annotation_db(self, annotation_db):
        self._annotation_db = annotation_db

    @property
    def transform(self):
        return self._transform

    @transform.setter
    def transform(self, transform):
        if isinstance(transform, (list, tuple)):
            from mmf_tpu.datasets.processors.image_processors import Compose

            transform = Compose(transform)
        self._transform = transform

    def _check_annotation_db_present(self):
        if not self.annotation_db:
            raise AttributeError(
                "'annotation_db' must be set to use __getitem__."
            )

    def __len__(self):
        self._check_annotation_db_present()
        return len(self.annotation_db)

    def __getitem__(self, idx):
        self._check_annotation_db_present()
        item = self.annotation_db[idx]
        return self.get(item)

    def get(self, item):
        possible_images = self._get_attrs(item)
        return self.from_path(possible_images)

    def from_path(self, paths, use_transforms=True):
        if isinstance(paths, str):
            paths = [paths]
        assert isinstance(paths, (list, tuple))
        loaded_images = []
        for image in paths:
            image_path = self._get_absolute_path(image)
            if os.path.exists(image_path):
                image = self.open_image(image_path)
                if self.transform and use_transforms:
                    image = self.transform(image)
                loaded_images.append(image)
        if not loaded_images:
            raise RuntimeError(
                f"Image not found from possible paths {paths} under "
                f"{self.base_path}"
            )
        return {"images": loaded_images}

    def open_image(self, path):
        return self.loader(path)

    def _get_attrs(self, item):
        """Extract possible image names (reference image_database.py)."""
        image = None
        pick = None
        attrs = self._get_possible_attrs()
        for attr in attrs:
            image = item.get(attr, None)
            if image is not None:
                pick = attr
                break
        if pick == "identifier" and "left_url" in item and "right_url" in item:
            return [image + "-img0", image + "-img1"]
        return get_possible_image_paths(image)

    def _get_possible_attrs(self):
        return [
            self.image_key, "flickr_30k_id", "Flikr30kID", "Flickr30kID",
            "identifier", "image_path", "image_name", "img", "image_id",
        ]

    def _get_absolute_path(self, image):
        if os.path.isabs(str(image)):
            return image
        return os.path.join(self.base_path, str(image))
