"""Image processors (parity with
mmf/datasets/processors/image_processors.py), built on PIL + numpy
(torchvision is not available in this environment). Output layout is CHW
float32 (torch convention the models expect)."""

from __future__ import annotations

from typing import Any, List, Union

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.datasets.processors.processors import BaseProcessor


def _to_chw_float(img) -> np.ndarray:
    """PIL.Image or HWC/CHW array -> CHW float32 in [0,1]."""
    try:
        from PIL import Image

        if isinstance(img, Image.Image):
            arr = np.asarray(img, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return arr.transpose(2, 0, 1)
    except ImportError:
        pass
    arr = np.asarray(img, np.float32)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        return arr  # already CHW
    if arr.ndim == 3:
        return arr.transpose(2, 0, 1)
    return arr


def _resize_chw(arr: np.ndarray, size) -> np.ndarray:
    """Bilinear resize of a CHW array via PIL."""
    from PIL import Image

    if isinstance(size, int):
        # torchvision Resize(int) semantics: resize the SHORTEST side to
        # `size`, preserving aspect ratio (a square resize here would
        # geometrically distort every image vs the reference pipeline)
        _, ih, iw = arr.shape[0], arr.shape[1], arr.shape[2]
        if ih <= iw:
            size = (size, max(1, int(round(size * iw / ih))))
        else:
            size = (max(1, int(round(size * ih / iw))), size)
    h, w = size
    chans = []
    for c in range(arr.shape[0]):
        im = Image.fromarray(arr[c])
        im = im.resize((w, h), Image.BILINEAR)
        chans.append(np.asarray(im, np.float32))
    return np.stack(chans)


class _Transform:
    def __call__(self, x):
        raise NotImplementedError


class Resize(_Transform):
    def __init__(self, size):
        self.size = tuple(size) if not isinstance(size, int) else size

    def __call__(self, x):
        return _resize_chw(_to_chw_float(x), self.size)


class CenterCrop(_Transform):
    def __init__(self, size):
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def __call__(self, x):
        x = _to_chw_float(x)
        th, tw = self.size
        _, h, w = x.shape
        i = max((h - th) // 2, 0)
        j = max((w - tw) // 2, 0)
        return x[:, i:i + th, j:j + tw]


class ToTensor(_Transform):
    def __call__(self, x):
        return _to_chw_float(x)


class Normalize(_Transform):
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(-1, 1, 1)

    def __call__(self, x):
        x = _to_chw_float(x)
        return (x - self.mean) / self.std


class RandomHorizontalFlip(_Transform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, x):
        x = _to_chw_float(x)
        if np.random.rand() < self.p:
            return x[:, :, ::-1].copy()
        return x


class Compose(_Transform):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class RandomCrop(_Transform):
    def __init__(self, size):
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def __call__(self, x):
        x = _to_chw_float(x)
        th, tw = self.size
        _, h, w = x.shape
        i = np.random.randint(0, max(h - th, 0) + 1)
        j = np.random.randint(0, max(w - tw, 0) + 1)
        return x[:, i:i + th, j:j + tw]


class ToPILImage(_Transform):
    """No-op in this numpy pipeline (arrays stay arrays; the next
    transform normalizes layout itself)."""

    def __call__(self, x):
        return x


def _mel_filterbank(n_mels, n_fft, sample_rate):
    """HTK-style triangular mel filterbank [n_mels, n_fft//2+1]."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = sample_rate / 2.0
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m - 1, k] = (hi - k) / (hi - ctr)
    return fb


class MelSpectrogram(_Transform):
    """Waveform [..., time] -> mel power spectrogram [n_mels, frames]
    (torchaudio-equivalent defaults: hann window, power 2, HTK mels).
    Multi-channel input is averaged to mono first."""

    def __init__(self, sample_rate=16000, n_fft=400, hop_length=None,
                 n_mels=128, **kwargs):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop = hop_length or n_fft // 2
        self.n_mels = n_mels
        self._fb = _mel_filterbank(n_mels, n_fft, sample_rate)

    def __call__(self, x):
        wav = np.asarray(x, np.float32)
        if wav.ndim == 2:  # [channels, time] -> mono
            wav = wav.mean(axis=0)
        pad = self.n_fft // 2
        wav = np.pad(wav, (pad, pad), mode="reflect")
        n_frames = 1 + (len(wav) - self.n_fft) // self.hop
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = wav[idx] * np.hanning(self.n_fft + 1)[:-1]
        spec = np.abs(np.fft.rfft(frames, n=self.n_fft, axis=1)) ** 2
        return (self._fb @ spec.T).astype(np.float32)  # [n_mels, frames]


_TRANSFORMS = {
    "Resize": Resize,
    "CenterCrop": CenterCrop,
    "ToTensor": ToTensor,
    "Normalize": Normalize,
    "RandomHorizontalFlip": RandomHorizontalFlip,
    "RandomCrop": RandomCrop,
    "ToPILImage": ToPILImage,
    "MelSpectrogram": MelSpectrogram,
}


@registry.register_processor("torchvision_transforms")
class TorchvisionTransforms(BaseProcessor):
    """Config-driven transform composition
    (reference image_processors.py:17-80). Also dispatches to registered
    processor names, so configs carry over unchanged."""

    def __init__(self, config, *args, **kwargs):
        transform_params = config["transforms"]
        assert isinstance(transform_params, (list, tuple, str))
        if isinstance(transform_params, str):
            transform_params = [transform_params]

        transforms_list = []
        for param in transform_params:
            if isinstance(param, dict):
                ttype = param["type"]
                tparams = param.get("params", {}) or {}
            else:
                ttype = param
                tparams = {}
            if ttype in _TRANSFORMS:
                cls = _TRANSFORMS[ttype]
                if isinstance(tparams, dict):
                    transforms_list.append(cls(**tparams))
                else:
                    transforms_list.append(cls(tparams))
            else:
                processor_cls = registry.get_processor_class(ttype)
                if processor_cls is None:
                    raise ValueError(
                        f"transform {ttype} is not present in torchvision-"
                        "equivalents or processor registry"
                    )
                transforms_list.append(
                    processor_cls(tparams if isinstance(tparams, dict) else
                                  {"size": tparams})
                )
        self.transform = Compose(transforms_list)

    def __call__(self, x):
        if isinstance(x, dict) and "image" in x:
            return {"image": self.transform(x["image"])}
        return self.transform(x)


@registry.register_processor("GrayScaleTo3Channels")
class GrayScaleTo3Channels(BaseProcessor):
    """(reference image_processors.py:81-100)"""

    def __init__(self, *args, **kwargs):
        return

    def __call__(self, x):
        if isinstance(x, dict) and "image" in x:
            return {"image": self(x["image"])}
        x = _to_chw_float(x)
        if x.shape[0] == 1:
            x = np.concatenate([x] * 3, axis=0)
        return x


@registry.register_processor("ResizeShortest")
class ResizeShortest(BaseProcessor):
    """Resize so the shortest side matches (reference image_processors.py:101)."""

    def __init__(self, *args, **kwargs):
        min_size = kwargs.get("min_size", args[0] if args else 800)
        if isinstance(min_size, dict):
            min_size = min_size.get("min_size", 800)
        if not isinstance(min_size, (list, tuple)):
            min_size = (min_size,)
        self.min_size = min_size
        self.max_size = kwargs.get("max_size", 1333)

    def get_size(self, image_size):
        h, w = image_size
        size = np.random.choice(self.min_size)
        max_size = self.max_size
        if max_size is not None:
            min_original = float(min((w, h)))
            max_original = float(max((w, h)))
            if max_original / min_original * size > max_size:
                size = int(round(max_size * min_original / max_original))
        if (w <= h and w == size) or (h <= w and h == size):
            return (h, w)
        if w < h:
            ow = size
            oh = int(size * h / w)
        else:
            oh = size
            ow = int(size * w / h)
        return (oh, ow)

    def __call__(self, x):
        x = _to_chw_float(x)
        size = self.get_size(x.shape[1:])
        return _resize_chw(x, size)


@registry.register_processor("NormalizeBGR255")
class NormalizeBGR255(BaseProcessor):
    """(reference image_processors.py:140-169)"""

    def __init__(self, *args, **kwargs):
        cfg = args[0] if args and isinstance(args[0], dict) else kwargs
        self.mean = cfg.get("mean", [102.9801, 115.9465, 122.7717])
        self.std = cfg.get("std", [1.0, 1.0, 1.0])
        self.to_bgr255 = cfg.get("to_bgr255", True)
        self.pad_size = cfg.get("pad_size", -1)

    def __call__(self, x):
        x = _to_chw_float(x)
        if self.to_bgr255:
            x = x[[2, 1, 0]] * 255
        mean = np.asarray(self.mean, np.float32).reshape(-1, 1, 1)
        std = np.asarray(self.std, np.float32).reshape(-1, 1, 1)
        x = (x - mean) / std
        if self.pad_size > 0:
            assert (
                self.pad_size >= x.shape[1] and self.pad_size >= x.shape[2]
            ), f"image size: {x.shape}"
            padded = np.zeros(
                (x.shape[0], self.pad_size, self.pad_size), np.float32
            )
            padded[:, : x.shape[1], : x.shape[2]] = x
            x = padded
        return x


@registry.register_processor("vilt_image_processor")
class VILTImageProcessor(BaseProcessor):
    """Resize + normalize for ViLT (reference image_processors.py:170-189)."""

    def __init__(self, config, *args, **kwargs):
        image_size = (config or {}).get("size", [224, 224])
        self.transform = Compose(
            [
                Resize(image_size),
                Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
            ]
        )

    def __call__(self, x):
        if isinstance(x, dict) and "image" in x:
            return {"image": self.transform(x["image"])}
        return self.transform(x)
