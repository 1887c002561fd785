"""COCO-format detection datasets for UniT.

Parity with mmf/datasets/builders/coco/detection_dataset.py:14-205 and
visual_genome/detection_builder.py — but the COCO instance JSON is parsed
directly with the ``json`` module (the reference goes through
torchvision.datasets.CocoDetection, which needs pycocotools; the
annotation format itself is plain JSON). Images load via PIL; the DETR
transform pipeline is the registered ``detr_image_and_target`` processor;
targets are pickled into fixed-size byte tensors so batches stay
static-shape for XLA.
"""

from __future__ import annotations

import json
import logging
import os
from collections import defaultdict
from typing import Any, Dict, List

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.utils.box_ops import box_cxcywh_to_xyxy
from mmf_tpu.utils.distributed import object_to_byte_tensor

logger = logging.getLogger(__name__)

# attribute annotations (Visual Genome): -1 = ignore, padded to 16 slots
# following vqa-maskrcnn-benchmark (reference detection_dataset.py:135-144)
MAX_ATTR_NUM = 16


class _CocoJson:
    """Minimal CocoDetection replacement: instances JSON -> (image, anns)."""

    def __init__(self, image_dir: str, json_path: str):
        self.image_dir = image_dir
        with open(json_path) as f:
            data = json.load(f)
        self.images = data.get("images", [])
        anns_by_image: Dict[Any, List[dict]] = defaultdict(list)
        for ann in data.get("annotations", []):
            anns_by_image[ann["image_id"]].append(ann)
        self.anns_by_image = anns_by_image
        self.ids = [img["id"] for img in self.images]
        self._file_names = {img["id"]: img["file_name"] for img in self.images}

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        from PIL import Image

        image_id = self.ids[idx]
        path = os.path.join(self.image_dir, self._file_names[image_id])
        img = Image.open(path).convert("RGB")
        return img, self.anns_by_image.get(image_id, [])


class DetectionCOCODataset(BaseDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        name = kwargs.get("name", kwargs.get("dataset_name",
                                             "detection_coco"))
        super().__init__(name, config, dataset_type)

        image_dir = self.config["images"][self._dataset_type][imdb_file_index]
        self.image_dir = os.path.join(self.config["data_dir"], image_dir)
        coco_json = self.config["annotations"][self._dataset_type][
            imdb_file_index
        ]
        self.coco_json = os.path.join(self.config["data_dir"], coco_json)
        self.coco_dataset = _CocoJson(self.image_dir, self.coco_json)
        self.postprocessors = {"bbox": PostProcess()}

    def __len__(self):
        return len(self.coco_dataset)

    def __getitem__(self, idx):
        img, anno = self.coco_dataset[idx]
        image_id = self.coco_dataset.ids[idx]
        img, target = self._load_coco_annotations(
            img, image_id, anno,
            load_attributes=self.config.get("load_attributes", False),
        )
        out = self.detection_image_and_target_processor(
            {"img": img, "target": target,
             "dataset_type": self._dataset_type}
        )
        img, target = out["img"], out["target"]

        current_sample = Sample()
        current_sample.image_id = np.int64(image_id)
        current_sample.image = np.asarray(img, np.float32)
        current_sample.targets_enc = object_to_byte_tensor(
            target, max_size=self.config.get("max_target_enc_size", 16382)
        )
        current_sample.orig_size = np.asarray(target["orig_size"], np.int64)

        # fixed-pad labels/boxes so the DETR loss consumes them under jit
        # (-1 label = padding; the reference decodes targets_enc host-side
        # inside forward, which cannot cross an XLA trace)
        max_objects = self.config.get("max_objects", 100)
        labels = np.full((max_objects,), -1, np.int64)
        padded_boxes = np.zeros((max_objects, 4), np.float32)
        n = min(len(target["labels"]), max_objects)
        labels[:n] = np.asarray(target["labels"])[:n]
        padded_boxes[:n] = np.asarray(target["boxes"], np.float32)[:n]
        current_sample.labels = labels
        current_sample.boxes = padded_boxes
        return current_sample

    def _load_coco_annotations(self, image, image_id, anno,
                               load_attributes=False):
        w, h = image.size
        anno = [
            obj for obj in anno
            if "iscrowd" not in obj or obj["iscrowd"] == 0
        ]

        boxes = np.asarray(
            [obj["bbox"] for obj in anno], np.float32
        ).reshape(-1, 4)
        boxes[:, 2:] += boxes[:, :2]  # xywh -> xyxy
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        classes = np.asarray(
            [obj["category_id"] for obj in anno], np.int64
        )
        attributes = None
        if load_attributes:
            attributes = -np.ones((len(classes), MAX_ATTR_NUM), np.int64)
            for n_obj, obj in enumerate(anno):
                attributes[n_obj] = np.asarray(
                    obj["attribute_ids_max16"], np.int64
                )

        keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
        boxes = boxes[keep]
        classes = classes[keep]
        if attributes is not None:
            attributes = attributes[keep]

        area = np.asarray([obj["area"] for obj in anno], np.float32)
        iscrowd = np.asarray(
            [obj.get("iscrowd", 0) for obj in anno], np.int64
        )
        target = {
            "boxes": boxes,
            "orig_boxes": boxes,
            "labels": classes,
            "image_id": np.asarray([image_id], np.int64),
            "area": area[keep] if len(area) else area,
            "orig_area": area[keep] if len(area) else area,
            "iscrowd": iscrowd[keep] if len(iscrowd) else iscrowd,
            "orig_size": np.asarray([int(h), int(w)], np.int64),
            "size": np.asarray([int(h), int(w)], np.int64),
        }
        if attributes is not None:
            target["attributes"] = attributes
        return image, target

    def format_for_prediction(self, report):
        """COCO-json detection entries grouped by image_id
        (reference detection_dataset.py:62-110); cross-process gathering is
        unnecessary — eval reports are already host-accumulated."""
        outputs = {
            "pred_logits": np.asarray(report["pred_logits"]),
            "pred_boxes": np.asarray(report["pred_boxes"]),
        }
        if "attr_logits" in report:
            outputs["attr_logits"] = np.asarray(report["attr_logits"])
        orig_size = np.asarray(report["orig_size"])
        image_ids = np.asarray(report["image_id"]).tolist()
        results = self.postprocessors["bbox"](outputs, orig_size)

        predictions = []
        for image_id, r in zip(image_ids, results):
            boxes = r["boxes"]
            # xyxy -> xywh for the COCO api
            boxes_xywh = np.stack(
                [boxes[:, 0], boxes[:, 1], boxes[:, 2] - boxes[:, 0],
                 boxes[:, 3] - boxes[:, 1]],
                axis=1,
            ).tolist()
            entries = [
                {
                    "image_id": image_id,
                    "category_id": int(r["labels"][k]),
                    "bbox": box_xywh,
                    "score": float(r["scores"][k]),
                }
                for k, box_xywh in enumerate(boxes_xywh)
            ]
            if "attr_scores" in r:
                for k in range(len(entries)):
                    entries[k]["attr_score"] = float(r["attr_scores"][k])
                    entries[k]["attr_label"] = int(r["attr_labels"][k])
            predictions.append((image_id, entries))
        return predictions

    def on_prediction_end(self, predictions):
        """De-duplicate by image_id (duplication comes from padded/repeated
        sampling; reference detection_dataset.py:112-120)."""
        prediction_dict = {img_id: entries for img_id, entries in predictions}
        unique_entries = []
        for image_id in sorted(prediction_dict):
            unique_entries.extend(prediction_dict[image_id])
        return unique_entries


class DetectionVisualGenomeDataset(DetectionCOCODataset):
    """(reference visual_genome/detection_dataset.py:5-14)"""

    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        kwargs.setdefault("dataset_name", "detection_visual_genome")
        super().__init__(config, dataset_type, imdb_file_index, *args,
                         **kwargs)
        self.dataset_name = kwargs["dataset_name"]


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


class PostProcess:
    """DETR box postprocessor, numpy edition
    (reference detection_dataset.py:171-205): model-relative cxcywh ->
    absolute xyxy + per-box class scores, dropping the no-object column."""

    def __call__(self, outputs: Dict[str, np.ndarray],
                 target_sizes: np.ndarray) -> List[Dict[str, np.ndarray]]:
        out_logits = np.asarray(outputs["pred_logits"], np.float32)
        out_bbox = np.asarray(outputs["pred_boxes"], np.float32)
        assert len(out_logits) == len(target_sizes)
        assert target_sizes.shape[1] == 2

        prob = _softmax(out_logits, -1)
        scores = prob[..., :-1].max(-1)
        labels = prob[..., :-1].argmax(-1)

        boxes = np.asarray(box_cxcywh_to_xyxy(out_bbox))
        img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
        scale = np.stack([img_w, img_h, img_w, img_h], axis=1)
        boxes = boxes * scale[:, None, :]

        results = [
            {"scores": s, "labels": l, "boxes": b}
            for s, l, b in zip(scores, labels, boxes)
        ]
        if "attr_logits" in outputs:
            attr_logits = np.asarray(outputs["attr_logits"], np.float32)
            assert len(attr_logits) == len(results)
            for idx, r in enumerate(results):
                r["attr_scores"] = attr_logits[idx].max(-1)
                r["attr_labels"] = attr_logits[idx].argmax(-1)
        return results
