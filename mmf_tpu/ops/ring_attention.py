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

Numerics: f32 accumulation of (m, l, o) online-softmax state regardless
of input dtype; bitwise-level agreement with unsharded attention is not
expected (different reduction order) but agreement to ~1e-6 f32 is, and
is pinned by tests/parallel/test_ring_attention.py.

Usage (inside or outside shard_map):
    out = ring_attention_sharded(q, k, v, mesh, axis="model",
                                 key_mask=mask)
where q/k/v are [B, H, S, D] global arrays; the helper shard_maps over
``axis``, sharding S. ``ring_attention`` is the inner collective kernel
for callers already inside a shard_map.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Collective attention over sequence shards (call inside shard_map).

    q, k, v: [B, H, S_local, D] — the local sequence shard.
    key_mask: [B, S_local] with 1 = attend, 0 = ignore (padding); the
        mask block rotates with its K/V block.
    Returns [B, H, S_local, D] — attention output for the local queries
    against the FULL (global) key/value sequence.
    """
    n = jax.lax.psum(1, axis_name)
    b, h, s_q, d = q.shape
    if scale is None:
        scale = d ** -0.5
    q32 = q.astype(jnp.float32) * scale

    def block_scores(k_blk, mask_blk):
        # [B, H, S_local, S_blk]
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32)
        )
        if mask_blk is not None:
            s = s + jnp.where(mask_blk, 0.0, NEG_INF)[:, None, None, :]
        return s

    def step(carry, _):
        o, m, l, k_blk, v_blk, mask_blk = carry
        s = block_scores(k_blk, mask_blk)
        m_blk = jnp.max(s, axis=-1)                     # [B, H, Sq]
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)                      # rescale old state
        p = jnp.exp(s - m_new[..., None])               # [B, H, Sq, Sk]
        l_new = l * alpha + jnp.sum(p, axis=-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        # rotate the K/V (+mask) block to the next device on the ring
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_nxt = (jax.lax.ppermute(mask_blk, axis_name, perm)
                    if mask_blk is not None else None)
        return (o_new, m_new, l_new, k_nxt, v_nxt, mask_nxt), None

    def _vary(x):
        # mark the replicated initial accumulators as device-varying so
        # the scan carry type matches its (collective-touched) outputs
        # under shard_map's varying-axis typing
        try:
            return jax.lax.pcast(x, (axis_name,), to="varying")
        except AttributeError:
            try:  # jax versions with pvary but not pcast
                return jax.lax.pvary(x, (axis_name,))
            except AttributeError:  # older jax: no vma typing
                return x

    o0 = _vary(jnp.zeros((b, h, s_q, d), jnp.float32))
    m0 = _vary(jnp.full((b, h, s_q), NEG_INF, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, s_q), jnp.float32))
    (o, m, l, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, key_mask), None, length=n
    )
    return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    key_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
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

    spec_qkv = P(None, None, axis, None)
    spec_mask = P(None, axis)
    in_specs = [spec_qkv, spec_qkv, spec_qkv]
    args = [q, k, v]
    if key_mask is not None:
        in_specs.append(spec_mask)
        args.append(key_mask)

        fn = functools.partial(ring_attention, axis_name=axis, scale=scale)
        mapped = shard_map(
            lambda q_, k_, v_, mk: fn(q_, k_, v_, key_mask=mk),
            mesh=mesh, in_specs=tuple(in_specs), out_specs=spec_qkv,
        )
        return mapped(*args)

    fn = functools.partial(ring_attention, axis_name=axis, scale=scale)
    mapped = shard_map(
        lambda q_, k_, v_: fn(q_, k_, v_, key_mask=None),
        mesh=mesh, in_specs=tuple(in_specs), out_specs=spec_qkv,
    )
    return mapped(*args)
