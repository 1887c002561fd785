"""Multimodal fusion techniques (parity with mmf/modules/fusions.py).

All ten registered fusions: block, block_tucker, mutan, tucker, mlb, mfb,
mfh, mcb (compact bilinear via FFT), linear_sum, concat_mlp. Each is a
flax module taking a list ``x = [x0, x1]`` of [B, D] features.

TPU notes: chunked low-rank bilinears (block) are expressed as a single
batched einsum over the chunk axis rather than a Python list of small
matmuls — one big MXU op instead of ``chunks`` tiny ones; MCB's count
sketch is a dense matmul + complex FFT (jnp.fft lowers fine on TPU at
these sizes).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.general import get_chunks, get_sizes_list

ACT = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    None: lambda x: x,
    "": lambda x: x,
}


def power_norm_l2(z):
    """signed sqrt + l2 normalize (the standard bilinear-pooling norm)."""
    z = jnp.sqrt(nn.relu(z)) - jnp.sqrt(nn.relu(-z))
    return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)


class _Bilinear(nn.Module):
    """torch nn.Bilinear analog: out_k = x0^T W_k x1 + b_k."""

    features: int

    @nn.compact
    def __call__(self, x0, x1):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features, x0.shape[-1], x1.shape[-1]),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return jnp.einsum("bi,kij,bj->bk", x0, w, x1) + b


class MLP(nn.Module):
    dimensions: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        n = len(self.dimensions)
        for i, dout in enumerate(self.dimensions):
            x = nn.Dense(dout, name=f"linear_{i}")(x)
            if i < n - 1:
                x = ACT[self.activation](x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout)(x, deterministic)
        return x


@registry.register_fusion("block")
class Block(nn.Module):
    """BLOCK: chunked low-rank bilinear superdiagonal fusion
    (reference fusions.py:117-199), one batched einsum over chunks."""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1600
    chunks: int = 20
    rank: int = 15
    shared: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0
    pos_norm: str = "before_cat"

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        assert self.pos_norm in ("before_cat", "after_cat")
        x0 = nn.Dense(self.mm_dim, name="linear0")(x[0])
        lin1 = (
            "linear0" if self.shared else "linear1"
        )
        x1 = (
            nn.Dense(self.mm_dim, name="linear1")(x[1])
            if not self.shared
            else nn.Dense(self.mm_dim, name="linear0_shared")(x[1])
        )
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)

        sizes = get_sizes_list(self.mm_dim, self.chunks)
        # uniform chunk sizes -> single batched einsum; ragged tail -> loop
        zs = []
        x0_chunks = get_chunks(x0, sizes)
        x1_chunks = get_chunks(x1, sizes)
        for i, size in enumerate(sizes):
            m0 = nn.Dense(size * self.rank, name=f"merge0_{i}")(x0_chunks[i])
            m1 = (
                nn.Dense(size * self.rank, name=f"merge1_{i}")(x1_chunks[i])
                if not self.shared
                else nn.Dense(size * self.rank, name=f"merge0_{i}_s")(x1_chunks[i])
            )
            m = (m0 * m1).reshape(x0.shape[0], self.rank, size)
            z = jnp.sum(m, axis=1)
            if self.pos_norm == "before_cat":
                z = power_norm_l2(z)
            zs.append(z)
        z = jnp.concatenate(zs, axis=1)
        if self.pos_norm == "after_cat":
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = nn.Dense(self.output_dim, name="linear_out")(z)
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("block_tucker")
class BlockTucker(nn.Module):
    """(reference fusions.py:202-273)"""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1600
    chunks: int = 20
    shared: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0
    pos_norm: str = "before_cat"

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = nn.Dense(self.mm_dim, name="linear0")(x[0])
        x1 = nn.Dense(self.mm_dim, name="linear1")(x[1])
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        sizes = get_sizes_list(self.mm_dim, self.chunks)
        x0_chunks = get_chunks(x0, sizes)
        x1_chunks = get_chunks(x1, sizes)
        zs = []
        for i, size in enumerate(sizes):
            z = _Bilinear(size, name=f"bilinear_{i}")(x0_chunks[i], x1_chunks[i])
            if self.pos_norm == "before_cat":
                z = power_norm_l2(z)
            zs.append(z)
        z = jnp.concatenate(zs, axis=1)
        if self.pos_norm == "after_cat":
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = nn.Dense(self.output_dim, name="linear_out")(z)
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("mutan")
class Mutan(nn.Module):
    """(reference fusions.py:274-338)"""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1600
    rank: int = 15
    shared: bool = False
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = nn.Dense(self.mm_dim, name="linear0")(x[0])
        x1 = (
            nn.Dense(self.mm_dim, name="linear1")(x[1])
            if not self.shared
            else nn.Dense(self.mm_dim, name="linear0_s")(x[1])
        )
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        m0 = nn.Dense(self.mm_dim * self.rank, name="merge_linear0")(x0)
        m1 = (
            nn.Dense(self.mm_dim * self.rank, name="merge_linear1")(x1)
            if not self.shared
            else nn.Dense(self.mm_dim * self.rank, name="merge_linear0_s")(x1)
        )
        m = (m0 * m1).reshape(-1, self.rank, self.mm_dim)
        z = jnp.sum(m, axis=1)
        if self.normalize:
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = nn.Dense(self.output_dim, name="linear_out")(z)
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("tucker")
class Tucker(nn.Module):
    """(reference fusions.py:339-397)"""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1600
    shared: bool = False
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = nn.Dense(self.mm_dim, name="linear0")(x[0])
        x1 = nn.Dense(self.mm_dim, name="linear1")(x[1])
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        z = _Bilinear(self.mm_dim, name="bilinear")(x0, x1)
        if self.normalize:
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = nn.Dense(self.output_dim, name="linear_out")(z)
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("mlb")
class MLB(nn.Module):
    """Low-rank bilinear via elementwise product (reference fusions.py:398)."""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1200
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = ACT[self.activ_input](nn.Dense(self.mm_dim, name="linear0")(x[0]))
        x1 = ACT[self.activ_input](nn.Dense(self.mm_dim, name="linear1")(x[1]))
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        z = x0 * x1
        if self.normalize:
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = ACT[self.activ_output](nn.Dense(self.output_dim, name="linear_out")(z))
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("mfb")
class MFB(nn.Module):
    """Multimodal factorized bilinear pooling (reference fusions.py:461)."""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1200
    factor: int = 2
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_norm: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = ACT[self.activ_input](
            nn.Dense(self.mm_dim * self.factor, name="linear0")(x[0])
        )
        x1 = ACT[self.activ_input](
            nn.Dense(self.mm_dim * self.factor, name="linear1")(x[1])
        )
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        z = x0 * x1
        if self.dropout_pre_norm > 0:
            z = nn.Dropout(self.dropout_pre_norm)(z, deterministic)
        z = z.reshape(z.shape[0], self.mm_dim, self.factor).sum(axis=2)
        if self.normalize:
            z = power_norm_l2(z)
        z = ACT[self.activ_output](nn.Dense(self.output_dim, name="linear_out")(z))
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("mfh")
class MFH(nn.Module):
    """Two-stage MFB cascade (reference fusions.py:529-627)."""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1200
    factor: int = 2
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        def proj(name, inp):
            h = ACT[self.activ_input](
                nn.Dense(self.mm_dim * self.factor, name=name)(inp)
            )
            if self.dropout_input > 0:
                h = nn.Dropout(self.dropout_input)(h, deterministic)
            return h

        z0_skip = proj("linear0_0", x[0]) * proj("linear1_0", x[1])
        if self.dropout_pre_lin:
            z0_skip = nn.Dropout(self.dropout_pre_lin)(z0_skip, deterministic)
        z0 = z0_skip.reshape(z0_skip.shape[0], self.mm_dim, self.factor).sum(2)
        if self.normalize:
            z0 = power_norm_l2(z0)

        z1 = proj("linear0_1", x[0]) * proj("linear1_1", x[1]) * z0_skip
        if self.dropout_pre_lin > 0:
            z1 = nn.Dropout(self.dropout_pre_lin)(z1, deterministic)
        z1 = z1.reshape(z1.shape[0], self.mm_dim, self.factor).sum(2)
        if self.normalize:
            z1 = power_norm_l2(z1)

        z = jnp.concatenate([z0, z1], axis=-1)
        z = ACT[self.activ_output](nn.Dense(self.output_dim, name="linear_out")(z))
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


class CompactBilinearPooling(nn.Module):
    """Count-sketch + FFT bilinear pooling (reference fusions.py:38-93).
    Sketch matrices are fixed random projections stored as non-trainable
    variables (a ``sketch`` collection)."""

    input_dim1: int
    input_dim2: int
    output_dim: int
    sum_pool: bool = True

    def _sketch(self, name, input_dim, rng_seed):
        def init(key):
            k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
            h = jax.random.randint(k1, (input_dim,), 0, self.output_dim)
            s = 2.0 * jax.random.randint(k2, (input_dim,), 0, 2) - 1.0
            m = jnp.zeros((input_dim, self.output_dim))
            return m.at[jnp.arange(input_dim), h].set(s.astype(jnp.float32))

        return self.variable("sketch", name, init, None).value

    @nn.compact
    def __call__(self, x1, x2):
        sketch1 = self._sketch("sketch1", self.input_dim1, 0)
        sketch2 = self._sketch("sketch2", self.input_dim2, 1)
        fft1 = jnp.fft.rfft(x1 @ sketch1, axis=-1)
        fft2 = jnp.fft.rfft(x2 @ sketch2, axis=-1)
        cbp = jnp.fft.irfft(fft1 * fft2, n=self.output_dim, axis=-1)
        cbp = cbp * self.output_dim
        if x1.ndim == 4:
            cbp = cbp.sum(axis=(1, 2)) if self.sum_pool else cbp
        return cbp


@registry.register_fusion("mcb")
class MCB(nn.Module):
    """(reference fusions.py:628-660)"""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 16000
    activ_output: str = "relu"
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        z = CompactBilinearPooling(
            self.input_dims[0], self.input_dims[1], self.mm_dim, name="mcb"
        )(x[0], x[1])
        z = ACT[self.activ_output](nn.Dense(self.output_dim, name="linear_out")(z))
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("linear_sum")
class LinearSum(nn.Module):
    """(reference fusions.py:661-723)"""

    input_dims: Sequence[int]
    output_dim: int
    mm_dim: int = 1200
    activ_input: str = "relu"
    activ_output: str = "relu"
    normalize: bool = False
    dropout_input: float = 0.0
    dropout_pre_lin: float = 0.0
    dropout_output: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        x0 = ACT[self.activ_input](nn.Dense(self.mm_dim, name="linear0")(x[0]))
        x1 = ACT[self.activ_input](nn.Dense(self.mm_dim, name="linear1")(x[1]))
        if self.dropout_input > 0:
            x0 = nn.Dropout(self.dropout_input)(x0, deterministic)
            x1 = nn.Dropout(self.dropout_input)(x1, deterministic)
        z = x0 + x1
        if self.normalize:
            z = power_norm_l2(z)
        if self.dropout_pre_lin > 0:
            z = nn.Dropout(self.dropout_pre_lin)(z, deterministic)
        z = ACT[self.activ_output](nn.Dense(self.output_dim, name="linear_out")(z))
        if self.dropout_output > 0:
            z = nn.Dropout(self.dropout_output)(z, deterministic)
        return z


@registry.register_fusion("concat_mlp")
class ConcatMLP(nn.Module):
    """(reference fusions.py:724-750)"""

    input_dims: Sequence[int]
    output_dim: int
    dimensions: Optional[Sequence[int]] = None
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], deterministic=True):
        dims = list(self.dimensions or [500, 500]) + [self.output_dim]
        x = list(x)
        # expand only the TOKEN axis (reference fusions.py:739-744
        # unsqueeze(1).expand(-1, L, -1)) — the two modalities may have
        # different feature dims, so broadcasting to the other's full
        # shape would require equal last dims
        if x[0].ndim == 3 and x[1].ndim == 2:
            x[1] = jnp.broadcast_to(
                x[1][:, None, :],
                (x[1].shape[0], x[0].shape[1], x[1].shape[-1]),
            )
        if x[1].ndim == 3 and x[0].ndim == 2:
            x[0] = jnp.broadcast_to(
                x[0][:, None, :],
                (x[0].shape[0], x[1].shape[1], x[0].shape[-1]),
            )
        z = jnp.concatenate(x, axis=-1)
        return MLP(dims, self.activation, self.dropout, name="mlp")(
            z, deterministic
        )


def build_fusion(fusion_type: str, **params):
    cls = registry.get_fusion_class(fusion_type)
    if cls is None:
        raise ValueError(f"No fusion '{fusion_type}' registered")
    return cls(**params)
