"""Charades action-recognition dataset, frames edition.

Parity with mmf/datasets/builders/charades/dataset.py:16-200, with one
TPU-first substitution: the reference decodes raw .mp4s at load time
through torchvision VideoClips; here videos are pre-decoded into frame
directories (``<frames_dir>/<video_id>/*.jpg``) — the standard offline
pipeline for accelerator training (no video codec on the host's hot
path, fixed frames_per_clip keeps shapes static for XLA).

Annotations are the released Charades csv (id, script, actions as
"c092 11.9 21.2;..."); ``classes_file`` maps class ids to names; targets
are multi-hot over the 157 classes.
"""

from __future__ import annotations

import csv
import os
from typing import List

import numpy as np

from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset


def parse_charades_csv(csv_path: str):
    """-> list of {id, script, actions: [class ids]}"""
    entries = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            actions = row.get("actions", "") or ""
            labels = [
                seg.split(" ")[0]
                for seg in actions.split(";")
                if seg.strip()
            ]
            entries.append(
                {
                    "id": row["id"],
                    "script": row.get("script", ""),
                    "labels": labels,
                }
            )
    return entries


def load_classes(classes_file: str) -> List[str]:
    """classes file lines look like 'c092 someone is cooking'."""
    classes = []
    with open(classes_file) as f:
        for line in f:
            line = line.strip()
            if line:
                classes.append(line.split(" ")[0])
    return sorted(classes)


class CharadesDataset(BaseDataset):
    def __init__(self, config, dataset_type, imdb_file_index=0, *args,
                 **kwargs):
        super().__init__("charades", config, dataset_type)
        self.frames_per_clip = config.get("frames_per_clip", 16)
        self.prediction_threshold = config.get("prediction_threshold", 0.5)

        data_dir = config.get("data_dir", "")
        csv_path = os.path.join(
            data_dir, config["annotations"][dataset_type][imdb_file_index]
        )
        self.frames_dir = os.path.join(
            data_dir, config["videos"][dataset_type][imdb_file_index]
        )
        self.entries = parse_charades_csv(csv_path)
        self.classes = load_classes(
            os.path.join(data_dir, config["classes_file"])
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        # keep only entries with at least one decoded frame on disk (an
        # empty dir — e.g. a failed decode job — would crash frame
        # sampling mid-epoch)
        def _has_frames(video_id):
            folder = os.path.join(self.frames_dir, video_id)
            if not os.path.isdir(folder):
                return False
            return any(
                f.lower().endswith((".jpg", ".jpeg", ".png"))
                for f in os.listdir(folder)
            )

        self.entries = [e for e in self.entries if _has_frames(e["id"])]
        if not self.entries:
            raise RuntimeError(
                f"No frame directories under {self.frames_dir}; decode "
                "videos offline into <frames_dir>/<video_id>/*.jpg first "
                "(the reference decodes mp4s inline via torchvision, which "
                "needs a video codec backend)"
            )

    def __len__(self):
        return len(self.entries)

    def _load_clip(self, video_id: str) -> np.ndarray:
        """Uniformly sample frames_per_clip frames -> [T, H, W, C] f32."""
        from PIL import Image

        folder = os.path.join(self.frames_dir, video_id)
        frames = sorted(
            f for f in os.listdir(folder)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        idx = np.linspace(
            0, len(frames) - 1, self.frames_per_clip
        ).astype(np.int64)
        clip = [
            np.asarray(
                Image.open(os.path.join(folder, frames[i])).convert("RGB"),
                np.float32,
            )
            for i in idx
        ]
        return np.stack(clip)

    def __getitem__(self, idx):
        info = self.entries[idx]
        sample = Sample()
        sample.id = np.int64(idx)

        processed = self.text_processor({"text": info["script"]})
        if "input_ids" in processed:
            sample.update(processed)
        else:
            sample.text = processed["text"]

        clip = self._load_clip(info["id"])  # THWC
        video = clip.transpose(0, 3, 1, 2)  # TCHW for the video processors
        if hasattr(self, "video_processor"):
            video = self.video_processor(video)
        sample.video = np.asarray(video, np.float32)

        # optional audio sidecars: <audio_dir>/<video_id>.npy waveforms
        # (the reference decodes audio from the mp4 inline; offline
        # extraction is the codec-free equivalent)
        audio_dir = self.config.get("audio_dir", None)
        if audio_dir:
            path = os.path.join(
                self.config.get("data_dir", ""), audio_dir,
                info["id"] + ".npy",
            )
            if os.path.exists(path):
                audio = np.load(path).astype(np.float32)
                if getattr(self, "audio_processor", None) is not None:
                    audio = self.audio_processor(audio)
                sample.audio = np.asarray(audio, np.float32)

        targets = np.zeros(len(self.classes), np.float32)
        for label in info["labels"]:
            if label in self.class_to_idx:
                targets[self.class_to_idx[label]] = 1.0
        sample.targets = targets
        return sample

    def format_for_prediction(self, report):
        scores = 1 / (1 + np.exp(-np.asarray(report["scores"])))
        predictions = []
        for i, sid in enumerate(np.asarray(report["id"]).tolist()):
            above = np.nonzero(scores[i] > self.prediction_threshold)[0]
            predictions.append(
                {
                    "id": int(sid),
                    "labels": [self.classes[j] for j in above.tolist()],
                }
            )
        return predictions
