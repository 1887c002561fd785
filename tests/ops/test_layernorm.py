"""Fused (residual +) LayerNorm: pallas-interpret vs reference vs flax
numerics, plus the rematerializing VJP."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.ops import layernorm as ln


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("with_residual", [False, True])
def test_pallas_matches_reference(dtype, with_residual):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16, 128), dtype)
    res = jnp.asarray(rng.randn(4, 16, 128), dtype) if with_residual else None
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(128), jnp.float32)

    got = ln._ln_pallas(x, res, scale, bias, 1e-12, True)  # interpret mode
    want = ln._ln_reference(x, res, scale, bias, 1e-12)
    assert got.dtype == x.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_reference_matches_flax_layernorm_f32():
    """The XLA fallback path must agree with flax's LayerNorm (the
    module it replaced) within golden-parity tolerance."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6, 37, 64), jnp.float32)
    flax_ln = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                           param_dtype=jnp.float32)
    variables = flax_ln.init(jax.random.PRNGKey(0), x)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias}}
    want = flax_ln.apply(variables, x)
    got = ln._ln_reference(x, None, scale, bias, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_vjp_matches_reference_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 32), jnp.float32)
    res = jnp.asarray(rng.randn(8, 32), jnp.float32)
    scale = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)

    def loss_pallas(x, res, scale, bias):
        return jnp.sum(ln._ln_pallas(x, res, scale, bias, 1e-12, True) ** 2)

    def loss_ref(x, res, scale, bias):
        return jnp.sum(ln._ln_reference(x, res, scale, bias, 1e-12) ** 2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        x, res, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5)


def test_block_rows_and_support_gating():
    import numpy as np

    assert ln._pick_block_rows(14592, 768) == 256  # 64*228 rows
    assert ln._pick_block_rows(100, 768) is None  # nothing tiles
    assert ln._pick_block_rows(96, 768) == 32
    # TPU tiling gate: odd hidden dims and big untileable arrays fall
    # back to XLA; small untileable arrays use one full block
    assert not ln._pallas_supported(np.zeros((14, 16), np.float32))
    assert ln._pallas_supported(np.zeros((100, 128), np.float32))
    assert not ln._pallas_supported(np.zeros((100001, 128), np.float32))


def test_residual_layer_norm_module_param_names():
    """The transformer's ResidualLayerNorm must own scale/bias at the
    same path nn.LayerNorm used (checkpoint compatibility)."""
    from mmf_tpu.modules.transformer import ResidualLayerNorm

    m = ResidualLayerNorm(32, name="output_layer_norm")
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 32)), jnp.ones((2, 32)))
    assert set(v["params"].keys()) == {"scale", "bias"}
    assert v["params"]["scale"].dtype == jnp.float32
