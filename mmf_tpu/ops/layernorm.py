"""Fused (residual-add +) LayerNorm Pallas kernel for TPU.

Why this exists: the XProf trace of the flagship VisualBERT eval forward
(BENCH_NOTES.md "LayerNorm finding") shows XLA's LayerNorm fusions
(convert_reduce_fusion.*) taking **52% of the forward** — each in-model
LN measures ~0.8 ms at [64, 228, 768] while the same LN isolated runs
160 us. The XLA fusion materializes f32 mean/var buffers and streams its
operands through the VMEM-prefetch DMA queues chunk-by-chunk (the
`slice`/`async-copy` storm on the async line); this kernel reads the
activation (and the residual, fused) exactly once per tile, keeps the
statistics in registers, and writes only the bf16 output.

Semantics match `flax.linen.LayerNorm(epsilon, dtype)(x + residual)`
with f32 statistics and f32 scale/bias params: reductions happen in
f32 regardless of input dtype, the affine transform in f32, and the
result casts to the activation dtype. Backward = rematerialized VJP of
the reference implementation (one recompute, XLA's own fused backward —
the forward is the serving-critical path).

Toggle: MMF_TPU_LN=pallas|xla (default pallas on TPU, xla elsewhere).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def ln_impl() -> str:
    """Default is xla: measured IN-MODEL at flagship shapes, the pallas
    kernel is 10% slower end-to-end (2930 vs 3239 samples/s) even though
    the XLA LN fusions dominate the op-level profile — their durations
    include DMA waits that XLA's scheduler overlaps with other compute,
    and a pallas_call boundary serializes that pipeline. Kept behind
    MMF_TPU_LN=pallas for larger-hidden/longer-seq regimes where one-
    pass tiling should win."""
    forced = os.environ.get("MMF_TPU_LN", "").lower()
    if forced in ("pallas", "xla"):
        return forced
    return "xla"


# ---------------------------------------------------------------------------
# reference (XLA) path — also the VJP recompute target
# ---------------------------------------------------------------------------
def _ln_reference(x, residual, scale, bias, eps):
    h = x.astype(jnp.float32)
    if residual is not None:
        h = h + residual.astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    y = (h - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------
def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    h = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    y = (h - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        y * scale_ref[...].astype(jnp.float32)
        + bias_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _res_ln_kernel(x_ref, res_ref, scale_ref, bias_ref, o_ref, *, eps):
    h = x_ref[...].astype(jnp.float32) + res_ref[...].astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    y = (h - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        y * scale_ref[...].astype(jnp.float32)
        + bias_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _pick_block_rows(n_rows: int, hidden: int):
    """Largest row block that tiles the array and respects the TPU
    (8, 128) tiling constraint; None when nothing tiles (the caller
    falls back to a single full-array block or to XLA)."""
    # keep in+res+out tiles comfortably inside VMEM (~16 MB): at H=768
    # bf16, 512 rows x 3 tiles = 2.3 MB
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if n_rows % cand == 0:
            return cand
    return None


def _pallas_supported(x2d) -> bool:
    n, h = x2d.shape
    if h % 128 != 0:
        return False
    if _pick_block_rows(n, h) is not None:
        return True
    # full-array single block is legal for any shape; keep it to small
    # arrays so the tile fits VMEM
    return n * h * x2d.dtype.itemsize <= 2 * 1024 * 1024


def _run_pallas(x2d, residual2d, scale, bias, eps, interpret):
    n, h = x2d.shape
    block = _pick_block_rows(n, h) or n
    grid = (n // block,)
    row_spec = pl.BlockSpec((block, h), lambda i: (i, 0))
    par_spec = pl.BlockSpec((h,), lambda i: (0,))
    out_shape = jax.ShapeDtypeStruct((n, h), x2d.dtype)
    if residual2d is None:
        return pl.pallas_call(
            functools.partial(_ln_kernel, eps=eps),
            grid=grid,
            in_specs=[row_spec, par_spec, par_spec],
            out_specs=row_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x2d, scale, bias)
    return pl.pallas_call(
        functools.partial(_res_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, par_spec, par_spec],
        out_specs=row_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x2d, residual2d, scale, bias)


# ---------------------------------------------------------------------------
# public entry points with rematerializing VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ln_pallas(x, residual, scale, bias, eps, interpret):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    res2d = None if residual is None else residual.reshape(-1, shape[-1])
    return _run_pallas(x2d, res2d, scale, bias, eps, interpret).reshape(shape)


def _ln_pallas_fwd(x, residual, scale, bias, eps, interpret):
    out = _ln_pallas(x, residual, scale, bias, eps, interpret)
    return out, (x, residual, scale, bias)


def _ln_pallas_bwd(eps, interpret, saved, g):
    x, residual, scale, bias = saved
    if residual is None:
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _ln_reference(x_, None, s_, b_, eps),
            x, scale, bias,
        )
        dx, dscale, dbias = vjp(g)
        return dx, None, dscale, dbias
    _, vjp = jax.vjp(
        lambda x_, r_, s_, b_: _ln_reference(x_, r_, s_, b_, eps),
        x, residual, scale, bias,
    )
    return vjp(g)


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    eps: float = 1e-12,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm(x [+ residual]) with f32 statistics, output in x.dtype.

    Dispatches to the fused Pallas kernel on TPU (MMF_TPU_LN=xla to
    force the reference path)."""
    if ln_impl() == "pallas" and (pltpu is not None or interpret):
        n = 1
        for d in x.shape[:-1]:
            n *= d
        if _pallas_supported(x.reshape(n, x.shape[-1])):
            return _ln_pallas(x, residual, scale, bias, float(eps),
                              interpret)
    return _ln_reference(x, residual, scale, bias, eps)
