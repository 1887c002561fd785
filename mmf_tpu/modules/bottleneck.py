"""MoVie modulated-bottleneck modules (parity with mmf/modules/bottleneck.py).

TPU notes: FrozenBatchNorm (inference-statistics BN) becomes a scale+shift
with stored constants — exactly what frozen BN is; channel layout is NCHW
at the API boundary (callers are torch-layout) with NHWC internally for
flax convs. The ipot loop is fixed-iteration lax.fori_loop (no data-
dependent trip counts)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cv = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(self.dim // self.sqrate, (1, 1), name="se_fc1", **cv)(se)
        se = nn.relu(se)
        se = nn.Conv(self.dim, (1, 1), name="se_fc2", **cv)(se)
        x = x * nn.sigmoid(se)
        attn = x.mean(axis=-1, keepdims=True)  # channel pool
        attn = nn.Conv(1, (7, 7), padding=3, name="attn_conv", **cv)(attn)
        return x * nn.sigmoid(attn)


class Modulation(nn.Module):
    """(reference bottleneck.py:54-69). NHWC. The reference hardcodes the
    compressed conv to 256 channels because MoVie's bottleneck width is
    always 256; here the caller passes the actual width so the module also
    works at other sizes."""

    num_features: int
    out_features: int = 256
    compressed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        c = nn.Dense(self.num_features, name="linear", dtype=self.dtype,
                     param_dtype=jnp.float32)(cond)
        c = c[:, None, None, :]
        out_ch = self.out_features if self.compressed else self.num_features
        return nn.Conv(out_ch, (1, 1), name="conv", dtype=self.dtype,
                       param_dtype=jnp.float32)(x * c)


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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None, deterministic=True
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cv = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # -> NHWC
        identity = x
        width = self.planes

        if self.cond_planes and self.compressed:
            x = nn.Conv(width, (1, 1), name="conv1", **cv)(x) + \
                Modulation(self.inplanes, width, True, dtype=self.dtype,
                           name="cond")(x, cond)
        elif self.cond_planes and not self.compressed:
            x = x + Modulation(
                self.inplanes, self.inplanes, False, dtype=self.dtype,
                name="cond",
            )(x, cond)
            x = nn.Conv(width, (1, 1), name="conv1", **cv)(x)
        else:
            x = nn.Conv(width, (1, 1), name="conv1", **cv)(x)

        out = nn.relu(FrozenBatchNorm2d(x.shape[-1], name="bn1")(x))
        out = nn.Conv(
            width, (3, 3), strides=self.stride, padding=1, name="conv2", **cv
        )(out)
        out = nn.relu(FrozenBatchNorm2d(width, name="bn2")(out))
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), name="conv3", **cv
        )(out)
        out = FrozenBatchNorm2d(self.planes * self.expansion, name="bn3")(out)

        if self.downsample:
            shortcut = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=self.stride,
                name="downsample", **cv,
            )(identity)
        else:
            shortcut = identity

        if self.use_se and self.cond_planes:
            out = SEModule(self.planes * self.expansion, 4, dtype=self.dtype,
                           name="se")(out)

        out = nn.relu(out + shortcut)
        return jnp.transpose(out, (0, 3, 1, 2)), cond
