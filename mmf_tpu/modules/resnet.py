"""ResNet family in flax (replaces torchvision.models.resnet usage in the
reference encoders, mmf/modules/encoders.py:246-409).

NCHW at the API boundary (SampleList images follow torch layout), NHWC
internally. BatchNorm uses flax BatchNorm with a ``batch_stats``
collection; converted torchvision weights map onto scale/bias/mean/var.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

STAGE_SIZES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Input NCHW images; ``features_only`` returns the final [B, H', W', C]
    feature map (before pooling), used for grid features."""

    depth: int = 152
    num_classes: int = 0  # 0 => no classification head
    features_only: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        block = BasicBlock if self.depth in (18, 34) else BottleneckBlock
        stages = STAGE_SIZES[self.depth]

        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, n_blocks in enumerate(stages):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = block(64 * 2 ** i, strides, name=f"layer{i + 1}_{j}")(
                    x, train
                )

        if self.features_only:
            return x  # [B, H', W', C]
        x = x.mean(axis=(1, 2))
        if self.num_classes:
            x = nn.Dense(self.num_classes, name="fc")(x)
        return x
