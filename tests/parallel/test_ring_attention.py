"""Ring attention (sequence-parallel, ppermute KV rotation) must match
unsharded attention on an 8-virtual-device mesh."""

import numpy as np
import pytest


def _mesh(axis="seq", n=8):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devices[:n]), (axis,))


def _reference(q, k, v, key_mask=None):
    import jax.numpy as jnp

    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (d ** -0.5)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def test_ring_attention_matches_unsharded():
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh()
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 64, 16  # S=64 over 8 devices -> 8 per shard
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))

    out = ring_attention_sharded(q, k, v, mesh, axis="seq")
    expected = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_with_key_padding_mask():
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh()
    rng = np.random.RandomState(1)
    B, H, S, D = 2, 2, 32, 8
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    mask_np = np.ones((B, S), bool)
    mask_np[0, -10:] = False  # padding spans shard boundaries
    mask_np[1, 5:9] = False   # masked block interior to shards
    mask = jnp.asarray(mask_np)

    out = ring_attention_sharded(q, k, v, mesh, axis="seq", key_mask=mask)
    expected = _reference(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_bf16_inputs():
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh()
    rng = np.random.RandomState(2)
    B, H, S, D = 1, 2, 16, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    out = ring_attention_sharded(q, k, v, mesh, axis="seq")
    assert out.dtype == jnp.bfloat16
    expected = _reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected),
        rtol=2e-2, atol=2e-2,
    )


def test_ring_attention_grads_flow():
    """The scan+ppermute composition must be differentiable (training
    with sequence parallelism)."""
    import jax
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh()
    rng = np.random.RandomState(3)
    B, H, S, D = 1, 2, 16, 8
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention_sharded(q, k, v, mesh, axis="seq") ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ring_attention_flash_path_matches_unsharded():
    """The Pallas flash local-block path (raw-stats kernel + f32 ring
    merge, VERDICT r4 item 4) must match dense attention. Runs the
    kernel through the Pallas interpreter on the CPU mesh; on TPU the
    same code path compiles (dispatched at/past the crossover seq len)."""
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh(n=4)
    rng = np.random.RandomState(4)
    B, H, S, D = 1, 2, 32, 8
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    mask_np = np.ones((B, S), bool)
    mask_np[0, -6:] = False
    mask = jnp.asarray(mask_np)

    out = ring_attention_sharded(
        q, k, v, mesh, axis="seq", key_mask=mask, impl="flash_interpret"
    )
    expected = _reference(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_flash_grads_equal_jnp_path():
    """The flash path's custom_vjp recomputes its backward through the
    jnp implementation, so SP training gradients are IDENTICAL with and
    without the flash forward."""
    import jax
    import jax.numpy as jnp

    from mmf_tpu.ops.ring_attention import ring_attention_sharded

    mesh = _mesh(n=4)
    rng = np.random.RandomState(5)
    B, H, S, D = 1, 2, 16, 8
    q = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, S, D).astype(np.float32))

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(
                ring_attention_sharded(
                    q, k, v, mesh, axis="seq", impl=impl
                ) ** 2
            )
        return f

    g_flash = jax.grad(loss("flash_interpret"), argnums=(0, 1, 2))(q, k, v)
    g_jnp = jax.grad(loss("jnp"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_jnp):
        # bwd recompute path is the SAME jnp program -> tight tolerance
        # (only the fwd output feeding sum-of-squares' cotangent differs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
