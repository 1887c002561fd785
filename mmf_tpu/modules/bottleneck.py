"""MoVie modulated-bottleneck modules (parity with mmf/modules/bottleneck.py).

TPU notes: FrozenBatchNorm (inference-statistics BN) becomes a scale+shift
with stored constants — exactly what frozen BN is; channel layout is NCHW
at the API boundary (callers are torch-layout) with NHWC internally for
flax convs. The ipot loop is fixed-iteration lax.fori_loop (no data-
dependent trip counts)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm2d(nn.Module):
    """BN with fixed statistics: y = (x - mean) / sqrt(var+eps) * w + b.
    Parameters live in the 'params' tree so converted torchvision weights
    drop in; they are expected to be excluded from the optimizer via the
    frozen-prefix mechanism when finetuning."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # x: NHWC
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class SEModule(nn.Module):
    """Squeeze-and-Excitation + spatial channel-pool gate
    (reference bottleneck.py:22-51). NHWC."""

    dim: int
    sqrate: int

    @nn.compact
    def __call__(self, x):
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(self.dim // self.sqrate, (1, 1), use_bias=False,
                     name="se_fc1")(se)
        se = nn.relu(se)
        se = nn.Conv(self.dim, (1, 1), use_bias=False, name="se_fc2")(se)
        x = x * nn.sigmoid(se)
        attn = x.mean(axis=-1, keepdims=True)  # channel pool
        attn = nn.Conv(1, (7, 7), padding=3, use_bias=False, name="attn_conv")(
            attn
        )
        return x * nn.sigmoid(attn)


class Modulation(nn.Module):
    """(reference bottleneck.py:54-69). NHWC. The reference hardcodes the
    compressed conv to 256 channels because MoVie's bottleneck width is
    always 256; here the caller passes the actual width so the module also
    works at other sizes."""

    num_features: int
    out_features: int = 256
    compressed: bool = True

    @nn.compact
    def __call__(self, x, cond):
        c = nn.Dense(self.num_features, name="linear")(cond)
        c = c[:, None, None, :]
        out_ch = self.out_features if self.compressed else self.num_features
        return nn.Conv(out_ch, (1, 1), name="conv")(x * c)


class MovieBottleneck(nn.Module):
    """ResNet bottleneck with MoVie question modulation
    (reference bottleneck.py:72-165). Input/output NCHW."""

    inplanes: int
    planes: int
    cond_planes: Optional[int] = None
    stride: int = 1
    downsample: bool = False
    compressed: bool = True
    use_se: bool = True
    expansion: int = 4

    @nn.compact
    def __call__(self, x, cond=None, deterministic=True
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        identity = x
        width = self.planes

        if self.cond_planes and self.compressed:
            x = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x) + \
                Modulation(self.inplanes, width, True, name="cond")(x, cond)
        elif self.cond_planes and not self.compressed:
            x = x + Modulation(
                self.inplanes, self.inplanes, False, name="cond"
            )(x, cond)
            x = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        else:
            x = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)

        out = nn.relu(FrozenBatchNorm2d(x.shape[-1], name="bn1")(x))
        out = nn.Conv(
            width, (3, 3), strides=self.stride, padding=1, use_bias=False,
            name="conv2",
        )(out)
        out = nn.relu(FrozenBatchNorm2d(width, name="bn2")(out))
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, name="conv3"
        )(out)
        out = FrozenBatchNorm2d(self.planes * self.expansion, name="bn3")(out)

        if self.downsample:
            shortcut = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=self.stride,
                use_bias=False, name="downsample",
            )(identity)
        else:
            shortcut = identity

        if self.use_se and self.cond_planes:
            out = SEModule(self.planes * self.expansion, 4, name="se")(out)

        out = nn.relu(out + shortcut)
        return jnp.transpose(out, (0, 3, 1, 2)), cond
