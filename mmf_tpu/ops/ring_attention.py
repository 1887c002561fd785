"""Ring attention: sequence-parallel attention over a mesh axis.

Beyond reference parity (MMF has no sequence parallelism or long-context
mechanism — SURVEY.md §5 "Long-context"): shards the sequence axis of
q/k/v across devices and rotates the local K/V block around the ring
with ``jax.lax.ppermute`` while accumulating blockwise online softmax —
the cross-device generalization of the flash-attention recurrence in
ops/attention.py. Peak memory per device is O(S/N) and the [S, S] score
matrix never materializes anywhere; the permutes ride ICI neighbor
links, which is exactly the traffic pattern TPU interconnect is built
for.

Local-block compute has two implementations, auto-dispatched:

- ``flash``: each ring step's [S_local, S_local] block runs through the
  Pallas flash kernel in raw-stats mode (ops/attention.py
  ``flash_attention_block`` — bf16 MXU gemms, no materialized probs),
  returning unnormalized (acc, m, l) that the ring recurrence merges in
  f32. Chosen on TPU when the local shard is at or past the measured
  Pallas crossover (MMF_TPU_PALLAS_MIN_SEQ, BENCH_NOTES "Flash
  crossover") — exactly the long-sequence regime SP exists for. Its
  backward recomputes through the jnp path (custom_vjp), so training
  gradients are identical to the jnp implementation's.
- ``jnp``: f32 einsum online softmax — the fallback for CPU/tests and
  short shards, and the backward path.

Pin with MMF_TPU_RING_ATTENTION=flash|jnp.

Numerics: f32 accumulation of (m, l, o) online-softmax state regardless
of input dtype; bitwise-level agreement with unsharded attention is not
expected (different reduction order) but agreement to ~1e-6 f32 is
(~1e-2 relative for the flash path's bf16 gemms), and is pinned by
tests/parallel/test_ring_attention.py.

Usage (inside or outside shard_map):
    out = ring_attention_sharded(q, k, v, mesh, axis="model",
                                 key_mask=mask)
where q/k/v are [B, H, S, D] global arrays; the helper shard_maps over
``axis``, sharding S. ``ring_attention`` is the inner collective kernel
for callers already inside a shard_map.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _ring_impl() -> str:
    """"auto" unless pinned via MMF_TPU_RING_ATTENTION=flash|jnp."""
    env = os.environ.get("MMF_TPU_RING_ATTENTION", "")
    if env in ("flash", "jnp"):
        return env
    return "auto"


def _vary(x, axis_name):
    # mark replicated initial accumulators as device-varying so the scan
    # carry type matches its (collective-touched) outputs under
    # shard_map's varying-axis typing
    try:
        return jax.lax.pcast(x, (axis_name,), to="varying")
    except AttributeError:
        try:  # jax versions with pvary but not pcast
            return jax.lax.pvary(x, (axis_name,))
        except AttributeError:  # older jax: no vma typing
            return x


def _ring_scan(q, k, v, axis_name, key_mask, scale, block_state):
    """Shared ring loop: rotate K/V (+mask) around the ring, merging each
    local block's online-softmax state (acc_b unnormalized, m_b, l_b)
    produced by ``block_state(k_blk, v_blk, mask_blk)``."""
    n = jax.lax.psum(1, axis_name)
    b, h, s_q, d = q.shape

    def step(carry, _):
        o, m, l, k_blk, v_blk, mask_blk = carry
        acc_b, m_b, l_b = block_state(k_blk, v_blk, mask_blk)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)                      # rescale old state
        beta = jnp.exp(m_b - m_new)                     # rescale new block
        l_new = l * alpha + l_b * beta
        o_new = o * alpha[..., None] + acc_b * beta[..., None]
        # rotate the K/V (+mask) block to the next device on the ring
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_nxt = (jax.lax.ppermute(mask_blk, axis_name, perm)
                    if mask_blk is not None else None)
        return (o_new, m_new, l_new, k_nxt, v_nxt, mask_nxt), None

    o0 = _vary(jnp.zeros((b, h, s_q, d), jnp.float32), axis_name)
    m0 = _vary(jnp.full((b, h, s_q), NEG_INF, jnp.float32), axis_name)
    l0 = _vary(jnp.zeros((b, h, s_q), jnp.float32), axis_name)
    (o, m, l, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, key_mask), None, length=n
    )
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def _ring_attention_jnp(q, k, v, axis_name, key_mask, scale):
    """f32 einsum local blocks — CPU/tests fallback + the backward path."""
    q32 = q.astype(jnp.float32) * scale

    def block_state(k_blk, v_blk, mask_blk):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32)
        )  # [B, H, Sq, Sk]
        if mask_blk is not None:
            s = s + jnp.where(mask_blk, 0.0, NEG_INF)[:, None, None, :]
        m_b = jnp.max(s, axis=-1)
        p = jnp.exp(s - m_b[..., None])
        l_b = jnp.sum(p, axis=-1)
        acc_b = jnp.einsum("bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
        return acc_b, m_b, l_b

    return _ring_scan(q, k, v, axis_name, key_mask, scale, block_state)


def _ring_flash_impl(q, k, v, key_mask, axis_name, scale, interpret=False):
    """Pallas flash local blocks (raw-stats mode): bf16 MXU gemms, no
    materialized [Sq, Sk] probabilities, O(block) VMEM."""
    from mmf_tpu.ops.attention import flash_attention_block

    def block_state(k_blk, v_blk, mask_blk):
        bias = None
        if mask_blk is not None:
            # same finite mask constant as the jnp path so fully-masked
            # rows degrade identically (uniform over masked keys)
            bias = jnp.where(
                mask_blk != 0, 0.0, NEG_INF
            ).astype(jnp.float32)[:, None, None, :]
        return flash_attention_block(
            q, k_blk, v_blk, bias, scale=scale, interpret=interpret
        )

    return _ring_scan(q, k, v, axis_name, key_mask, scale, block_state)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_attention_flash(q, k, v, key_mask, axis_name, scale,
                          interpret=False):
    return _ring_flash_impl(q, k, v, key_mask, axis_name, scale, interpret)


def _ring_flash_fwd(q, k, v, key_mask, axis_name, scale, interpret=False):
    out = _ring_flash_impl(q, k, v, key_mask, axis_name, scale, interpret)
    return out, (q, k, v, key_mask)


def _ring_flash_bwd(axis_name, scale, interpret, res, g):
    # recompute through the jnp path: its VJP (scan/ppermute transposes)
    # is exact, and gradients are identical to training without flash
    q, k, v, key_mask = res

    def f(q_, k_, v_):
        return _ring_attention_jnp(q_, k_, v_, axis_name, key_mask, scale)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    dmask = jnp.zeros_like(key_mask) if key_mask is not None else None
    return dq, dk, dv, dmask


_ring_attention_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Collective attention over sequence shards (call inside shard_map).

    q, k, v: [B, H, S_local, D] — the local sequence shard.
    key_mask: [B, S_local] with 1 = attend, 0 = ignore (padding); the
        mask block rotates with its K/V block.
    impl: None (auto: Pallas flash local blocks on TPU at/past the
        crossover seq len, jnp einsums otherwise), "flash", or "jnp".
    Returns [B, H, S_local, D] — attention output for the local queries
    against the FULL (global) key/value sequence.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl is None:
        impl = _ring_impl()
    if impl == "auto":
        from mmf_tpu.ops.attention import _pallas_min_seq

        long_shard = max(q.shape[2], k.shape[2]) >= _pallas_min_seq()
        impl = "flash" if (_on_tpu() and long_shard) else "jnp"
    if impl == "flash":
        return _ring_attention_flash(q, k, v, key_mask, axis_name, scale)
    if impl == "flash_interpret":  # tests: pallas interpreter on CPU
        return _ring_attention_flash(
            q, k, v, key_mask, axis_name, scale, True
        )
    return _ring_attention_jnp(q, k, v, axis_name, key_mask, scale)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """shard_map wrapper: q/k/v [B, H, S, D] with S sharded over
    ``axis``; output sharded the same way. S must divide evenly by the
    axis size (pad the sequence and mask the padding via key_mask)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    s = q.shape[2]
    assert s % n == 0, f"sequence {s} not divisible by {axis} size {n}"

    if impl is None:
        impl = _ring_impl()
    if impl == "auto":
        from mmf_tpu.ops.attention import _pallas_min_seq

        # the crossover applies to the per-device block the kernel sees
        long_shard = (s // n) >= _pallas_min_seq()
        impl = "flash" if (_on_tpu() and long_shard) else "jnp"

    shmap_kwargs = {}
    if impl in ("flash", "flash_interpret"):
        # pallas_call inside shard_map predates the vma checker; the
        # compiled/interpret call sites trip it (closed_call has no vma
        # rule) — the jnp path keeps full checking
        shmap_kwargs["check_vma"] = False

    spec_qkv = P(None, None, axis, None)
    spec_mask = P(None, axis)
    in_specs = [spec_qkv, spec_qkv, spec_qkv]
    args = [q, k, v]
    fn = functools.partial(
        ring_attention, axis_name=axis, scale=scale, impl=impl
    )
    if key_mask is not None:
        in_specs.append(spec_mask)
        args.append(key_mask)
        mapped = shard_map(
            lambda q_, k_, v_, mk: fn(q_, k_, v_, key_mask=mk),
            mesh=mesh, in_specs=tuple(in_specs), out_specs=spec_qkv,
            **shmap_kwargs,
        )
        return mapped(*args)

    mapped = shard_map(
        lambda q_, k_, v_: fn(q_, k_, v_, key_mask=None),
        mesh=mesh, in_specs=tuple(in_specs), out_specs=spec_qkv,
        **shmap_kwargs,
    )
    return mapped(*args)
