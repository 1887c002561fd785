"""Import shims that let the PyTorch reference at /root/reference import
inside this image for golden-parity tests.

Only modules genuinely absent from the image are stubbed (sklearn,
termcolor, psutil etc. are real and left alone). ``install()`` records
what it added so ``uninstall()`` can remove exactly that — the shims must
not leak into other tests, which probe real ImportErrors for gated
features."""

from __future__ import annotations

import importlib.machinery
import sys
import types
from unittest import mock

REFERENCE_ROOT = "/root/reference"

_added: list = []


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    _added.append(name)
    return m


def _mock_mod(name):
    m = mock.MagicMock(name=name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.__name__ = name
    sys.modules[name] = m
    _added.append(name)
    return m


def install():
    if "omegaconf" in sys.modules:  # already installed
        return
    from mmf_tpu.config import omega as _omega

    om = _mod("omegaconf")

    class OmegaConf:
        create = staticmethod(lambda *a, **k: _omega.create(*a, **k))
        merge = staticmethod(lambda *a: _omega.merge(*a))
        set_struct = staticmethod(lambda c, v: _omega.set_struct(c, v))
        to_container = staticmethod(
            lambda c, resolve=False: _omega.to_container(c, resolve)
        )
        is_config = staticmethod(
            lambda x: isinstance(x, _omega.ConfigNode)
        )
        is_dict = staticmethod(
            lambda x: isinstance(x, (dict, _omega.ConfigNode))
        )

    om.OmegaConf = OmegaConf
    om.open_dict = _omega.open_dict
    om.DictConfig = _omega.ConfigNode
    om.ListConfig = list
    om.MISSING = "???"
    om.II = lambda s: "${" + s + "}"
    om.SI = lambda s: s
    err = _mod("omegaconf.errors")

    class ValidationError(Exception):
        pass

    err.ValidationError = ValidationError
    om.errors = err

    import os

    class PathManager:
        open = staticmethod(lambda p, m="r", **k: open(p, m))
        exists = staticmethod(os.path.exists)
        isfile = staticmethod(os.path.isfile)
        mkdirs = staticmethod(lambda p: os.makedirs(p, exist_ok=True))
        get_local_path = staticmethod(lambda p, **k: p)
        register_handler = staticmethod(lambda *a, **k: None)

    _mod("iopath")
    _mod("iopath.common")
    _mod(
        "iopath.common.file_io",
        PathManager=PathManager,
        HTTPURLHandler=object,
        PathManagerFactory=types.SimpleNamespace(
            get=lambda *a, **k: PathManager
        ),
    )

    for name in (
        "torchtext", "torchtext.vocab",
        "torchvision", "torchvision.transforms", "torchvision.models",
        "torchvision.datasets", "torchvision.datasets.folder",
        "torchvision.models._utils", "torchvision.ops.boxes",
        "torchvision.ops", "torchvision.transforms.functional",
        "pytorch_lightning", "pytorch_lightning.callbacks",
        "pytorch_lightning.utilities", "pytorch_lightning.utilities.seed",
        "pytorch_lightning.loggers", "pytorch_lightning.core",
        "pytorch_lightning.core.lightning", "pytorch_lightning.trainer",
        "pytorch_lightning.trainer.trainer",
        "torchmetrics", "fvcore", "fvcore.common", "fvcore.common.download",
        "lmdb", "demjson", "demjson3", "wandb", "GPUtil",
        "pycocotools", "pycocotools.coco", "pycocotools.cocoeval",
        "editdistance",
    ):
        _mock_mod(name)

    import torch
    import torch.nn as nn

    pl = sys.modules["pytorch_lightning"]
    pl.LightningModule = type("LightningModule", (nn.Module,), {})
    pl.LightningDataModule = type("LightningDataModule", (), {})
    pl.Trainer = object
    pl.Callback = object
    pl.seed_everything = lambda *a, **k: None

    # torchvision resnet blocks are subclassed at import time (MovieBottleneck)
    def conv3x3(inp, out, stride=1, groups=1, dilation=1):
        return nn.Conv2d(inp, out, 3, stride=stride, padding=dilation,
                         groups=groups, bias=False, dilation=dilation)

    def conv1x1(inp, out, stride=1):
        return nn.Conv2d(inp, out, 1, stride=stride, bias=False)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    _mod("torchvision.models.resnet", Bottleneck=Bottleneck,
         conv1x1=conv1x1, conv3x3=conv3x3, ResNet=object,
         resnet18=mock.MagicMock(), resnet50=mock.MagicMock(),
         resnet152=mock.MagicMock())

    class FrozenBatchNorm2d(nn.Module):
        def __init__(self, num_features, eps=1e-5):
            super().__init__()
            self.register_buffer("weight", torch.ones(num_features))
            self.register_buffer("bias", torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))
            self.eps = eps

        def forward(self, x):
            scale = self.weight * (self.running_var + self.eps).rsqrt()
            bias = self.bias - self.running_mean * scale
            return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)

    _mod("torchvision.ops.misc", FrozenBatchNorm2d=FrozenBatchNorm2d)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def uninstall():
    """Remove exactly the shims (reference modules keep their references)."""
    for name in _added:
        sys.modules.pop(name, None)
    _added.clear()
    # drop cached reference modules so later installs re-import cleanly
    for name in [n for n in sys.modules if n == "mmf" or n.startswith("mmf.")]:
        sys.modules.pop(name, None)
    if REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)
