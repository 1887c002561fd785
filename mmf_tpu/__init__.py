"""mmf_tpu: a TPU-native multimodal (vision+language) research framework.

Capabilities mirror facebookresearch/mmf — registry-driven model/dataset
zoos, config-driven training, multimodal processors, multi-dataset
iteration, checkpoint/resume — rebuilt on JAX/XLA/Pallas/pjit: pure
functional models (flax), one jitted SPMD train step over a device mesh,
fused Pallas attention kernels on the hot path.
"""

__version__ = "0.1.0"

from mmf_tpu.common.registry import registry  # noqa: F401
from mmf_tpu.utils.patch import patch_transformers

patch_transformers()

# subpackage surface mirroring the reference (mmf/__init__.py:8-23)
from mmf_tpu import common, datasets, models, modules, utils  # noqa: E402,F401
from mmf_tpu.modules import (  # noqa: E402,F401
    losses,
    metrics,
    optimizers,
    poolers,
    schedulers,
)

__all__ = [
    "registry",
    "__version__",
    "utils",
    "common",
    "modules",
    "datasets",
    "models",
    "losses",
    "poolers",
    "schedulers",
    "optimizers",
    "metrics",
]
