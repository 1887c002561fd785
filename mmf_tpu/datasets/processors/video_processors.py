"""Video transform processors (parity with
mmf/datasets/processors/video_processors.py:19-153).

Numpy implementations over TCHW float video tensors (pytorchvideo is not
installed; these cover the registered keys with equivalent math)."""

from __future__ import annotations

import random

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.processors.processors import BaseProcessor


def _video(item):
    v = item["video"] if isinstance(item, dict) else item
    return np.asarray(v, np.float32)


def _wrap(item, video):
    if isinstance(item, dict):
        out = dict(item)
        out["video"] = video
        return out
    return video


@registry.register_processor("video_random_crop")
class VideoRandomCrop(BaseProcessor):
    def __init__(self, *args, size=None, **kwargs):
        if size is None:
            raise TypeError("Parameter 'size' is required")
        self.size = size if not isinstance(size, int) else (size, size)

    def __call__(self, item):
        vid = _video(item)  # T,C,H,W
        h, w = vid.shape[-2:]
        th, tw = self.size
        i = random.randint(0, h - th)
        j = random.randint(0, w - tw)
        return _wrap(item, vid[..., i:i + th, j:j + tw])


@registry.register_processor("video_center_crop")
class VideoCenterCrop(BaseProcessor):
    def __init__(self, *args, size=None, **kwargs):
        if size is None:
            raise TypeError("Parameter 'size' is required")
        self.size = size if not isinstance(size, int) else (size, size)

    def __call__(self, item):
        vid = _video(item)
        h, w = vid.shape[-2:]
        th, tw = self.size
        i = max((h - th) // 2, 0)
        j = max((w - tw) // 2, 0)
        return _wrap(item, vid[..., i:i + th, j:j + tw])


@registry.register_processor("video_resize")
class VideoResize(BaseProcessor):
    def __init__(self, *args, size=None, **kwargs):
        if size is None:
            raise TypeError("Parameter 'size' is required")
        self.size = size if not isinstance(size, int) else (size, size)

    def __call__(self, item):
        from mmf_tpu.datasets.processors.image_processors import _resize_chw

        vid = _video(item)
        frames = [_resize_chw(f, self.size) for f in vid]
        return _wrap(item, np.stack(frames))


@registry.register_processor("video_to_tensor")
class VideoToTensor(BaseProcessor):
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, item):
        vid = _video(item)
        if vid.max() > 1.5:
            vid = vid / 255.0
        return _wrap(item, vid)


@registry.register_processor("truncate_or_pad")
class TruncateOrPad(BaseProcessor):
    """Pad/cut audio-like arrays to fixed length
    (reference video_processors.py:116-137)."""

    def __init__(self, config=None, *args, output_size=None, **kwargs):
        if output_size is None and isinstance(config, dict):
            output_size = config.get(
                "output_size",
                (config.get("params") or {}).get("output_size"),
            )
        if output_size is None:
            raise TypeError("Parameter 'output_size' is required")
        self.output_size = output_size

    def __call__(self, item):
        x = np.asarray(item["audio"] if isinstance(item, dict) else item)
        if x.ndim == 1:  # mono waveform -> [1, time]
            x = x[None, :]
        if x.shape[1] >= self.output_size:
            out = x[0, : self.output_size]
        else:
            out = np.concatenate(
                [x[0], np.zeros(self.output_size - x.shape[1], x.dtype)]
            )
        if isinstance(item, dict):
            o = dict(item)
            o["audio"] = out
            return o
        return out


@registry.register_processor("video_random_horizontal_flip")
class VideoRandomHorizontalFlip(BaseProcessor):
    def __init__(self, *args, p=0.5, **kwargs):
        self.p = p

    def __call__(self, item):
        vid = _video(item)
        if random.random() < self.p:
            vid = vid[..., ::-1].copy()
        return _wrap(item, vid)


@registry.register_processor("video_normalize")
class VideoNormalize(BaseProcessor):
    def __init__(self, mean=None, std=None, **kwargs):
        if mean is None or std is None:
            raise TypeError("'mean' and 'std' params are required")
        self.mean = np.asarray(mean, np.float32).reshape(1, -1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(1, -1, 1, 1)

    def __call__(self, item):
        vid = _video(item)
        return _wrap(item, (vid - self.mean) / self.std)


@registry.register_processor("video_temporal_sample")
class VideoTemporalSample(BaseProcessor):
    """Uniformly sample num_samples frames."""

    def __init__(self, *args, num_samples=8, **kwargs):
        self.num_samples = num_samples

    def __call__(self, item):
        vid = _video(item)
        t = vid.shape[0]
        idx = np.linspace(0, t - 1, self.num_samples).astype(np.int64)
        return _wrap(item, vid[idx])


@registry.register_processor("video_random_temporal_sample")
class VideoRandomTemporalSample(BaseProcessor):
    def __init__(self, *args, num_samples=8, **kwargs):
        self.num_samples = num_samples

    def __call__(self, item):
        vid = _video(item)
        t = vid.shape[0]
        if t <= self.num_samples:
            idx = np.arange(t)
        else:
            start = random.randint(0, t - self.num_samples)
            idx = np.arange(start, start + self.num_samples)
        return _wrap(item, vid[idx])


@registry.register_processor("permute_and_rescale")
class PermuteAndRescale(BaseProcessor):
    """THWC uint8 -> TCHW float in [0,1] (reference video_processors.py:139)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, item):
        vid = _video(item)
        if vid.ndim == 4 and vid.shape[-1] in (1, 3):
            vid = vid.transpose(0, 3, 1, 2)
        return _wrap(item, vid / 255.0)


@registry.register_processor("video_pad")
class VideoPad(BaseProcessor):
    """Spatial padding on the last two dims
    (reference video_processors.py:119-129)."""

    def __init__(self, *args, padding=None, fill=0, **kwargs):
        if padding is None:
            raise TypeError("Parameter 'padding' is required")
        if isinstance(padding, int):
            padding = [padding] * 4  # left, right, top, bottom
        self.padding = padding
        self.fill = fill

    def __call__(self, item):
        vid = _video(item)
        left, right, top, bottom = self.padding
        pad = [(0, 0)] * (vid.ndim - 2) + [(top, bottom), (left, right)]
        return _wrap(item, np.pad(vid, pad, constant_values=self.fill))


@registry.register_processor("video_transforms")
class VideoTransforms(BaseProcessor):
    """Compose registered video processors from config
    (reference video_processors.py:152-210 composes pytorchvideo
    transforms; here the same config drives the registered numpy
    ``video_*`` processors)."""

    def __init__(self, config, *args, **kwargs):
        transform_params = config["transforms"]
        if isinstance(transform_params, dict):
            transform_params = [transform_params]
        self.transforms = []
        for param in transform_params:
            if isinstance(param, str):
                ttype, tparams = param, {}
            else:
                ttype = param["type"]
                tparams = dict(param.get("params", {}) or {})
            cls = registry.get_processor_class(ttype)
            if cls is None:
                # accept bare names like "random_crop" for video_random_crop
                cls = registry.get_processor_class(f"video_{ttype}")
            if cls is None:
                raise ValueError(f"Unknown video transform: {ttype}")
            self.transforms.append(cls(**tparams))

    def __call__(self, item):
        for t in self.transforms:
            item = t(item)
        return item
