"""Int8 quantized matmul path (ops/quant.py) — numerics, gradients,
checkpoint-layout invariance, and trunk-level engagement of the knob.

The reference framework has no quantized inference path (fp32/amp only);
this is rebuild-side serving capability, so the contract under test is
our own: int8 results must track f32 within 8-bit rounding error, the
straight-through gradient must equal the exact matmul VJP, and flipping
the knob must never change the param pytree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.modules.transformer import TransformerConfig, TransformerModel
from mmf_tpu.ops.quant import (
    QuantDense,
    int8_matmul,
    quantize_cols,
    quantize_rows,
)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64), jnp.float32)
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (8, 1)
    deq = q.astype(jnp.float32) * s
    # max error is half a quantization step per row
    step = np.asarray(s)[:, 0]
    err = np.abs(np.asarray(deq) - np.asarray(x)).max(axis=1)
    assert (err <= step * 0.5 + 1e-7).all()


def test_quantize_cols_roundtrip():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(64, 32), jnp.float32)
    q, s = quantize_cols(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 32)
    deq = q.astype(jnp.float32) * s
    step = np.asarray(s)[0]
    err = np.abs(np.asarray(deq) - np.asarray(w)).max(axis=0)
    assert (err <= step * 0.5 + 1e-7).all()


def test_int8_matmul_tracks_f32():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 64) * 0.05, jnp.float32)
    y8 = np.asarray(jax.jit(int8_matmul)(x, w))
    y = np.asarray(x @ w)
    # 8-bit symmetric quant on both operands: relative error on the
    # order of 1% of the output magnitude scale
    tol = 0.02 * np.abs(y).max()
    assert np.abs(y8 - y).max() < tol
    assert y8.dtype == np.float32


def test_int8_matmul_batched_input():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16), jnp.float32)
    y = np.asarray(int8_matmul(x, w))
    assert y.shape == (2, 5, 16)
    ref = np.asarray(x @ w)
    assert np.abs(y - ref).max() < 0.02 * np.abs(ref).max()


def test_straight_through_gradients_match_exact_matmul():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 24), jnp.float32)
    w = jnp.asarray(rng.randn(24, 8), jnp.float32)
    t = jnp.asarray(rng.randn(4, 8), jnp.float32)

    def loss_q(x, w):
        return jnp.sum((int8_matmul(x, w) - t) ** 2)

    def loss_f(x, w):
        return jnp.sum((x @ w - t) ** 2)

    gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    # STE backward is the *exact* matmul VJP, but the residual that
    # multiplies into it comes from the quantized forward — so gradients
    # agree to quantization error, and are exactly computed (non-zero).
    for a, b in zip(gq, gf):
        assert np.abs(np.asarray(a)).max() > 0
        denom = np.abs(np.asarray(b)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / denom < 0.05


def test_quantdense_param_layout_matches_dense():
    import flax.linen as nn

    x = jnp.ones((2, 12), jnp.float32)
    qd = QuantDense(7)
    d = nn.Dense(7, param_dtype=jnp.float32)
    pq = qd.init(jax.random.PRNGKey(0), x)["params"]
    pd = d.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pd)
    for (kq, vq), (kd, vd) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(pq), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(pd), key=lambda t: str(t[0])),
    ):
        assert str(kq) == str(kd) and vq.shape == vd.shape and vq.dtype == vd.dtype
    # and a Dense-initialized pytree runs through QuantDense unchanged
    y = qd.apply({"params": pd}, x)
    assert y.shape == (2, 7)


_TINY = dict(
    vocab_size=120, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=40, hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _trunk_logits(quant):
    cfg = TransformerConfig.from_dict(dict(_TINY, quant=quant))
    model = TransformerModel(cfg)
    ids = jnp.asarray(
        np.random.RandomState(7).randint(0, 120, (2, 10)), jnp.int32
    )
    # params initialized under the *f32* config so both paths share them
    base = TransformerModel(TransformerConfig.from_dict(_TINY))
    params = base.init(jax.random.PRNGKey(0), ids)["params"]
    seq, pooled = model.apply({"params": params}, ids)
    return np.asarray(seq), np.asarray(pooled)


def test_trunk_quant_knob_engages_and_tracks_f32():
    seq_f, pooled_f = _trunk_logits("none")
    seq_q, pooled_q = _trunk_logits("int8")
    # the knob must actually change the computation ...
    assert not np.array_equal(seq_f, seq_q)
    # ... but stay close to the f32 trunk
    assert np.abs(seq_q - seq_f).max() < 0.15 * np.abs(seq_f).max()
    assert np.abs(pooled_q - pooled_f).max() < 0.1


def test_env_override_forces_int8(monkeypatch):
    monkeypatch.setenv("MMF_TPU_QUANT", "int8")
    seq_env, _ = _trunk_logits("none")
    monkeypatch.delenv("MMF_TPU_QUANT")
    seq_q, _ = _trunk_logits("int8")
    np.testing.assert_array_equal(seq_env, seq_q)


def test_env_override_forces_off(monkeypatch):
    monkeypatch.setenv("MMF_TPU_QUANT", "none")
    seq_env, _ = _trunk_logits("int8")
    monkeypatch.delenv("MMF_TPU_QUANT")
    seq_f, _ = _trunk_logits("none")
    np.testing.assert_array_equal(seq_env, seq_f)


def test_int8_dense_1d_input_keeps_shape():
    """1-D input [k] must round-trip to [n] (the bias add used to
    broadcast it to [1, n])."""
    from mmf_tpu.ops.quant import int8_dense

    k, n = 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (k,))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n))
    b = jax.random.normal(jax.random.PRNGKey(2), (n,))
    y = int8_dense(x, w, b)
    assert y.shape == (n,)
    ref = x @ w + b
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=0.1, atol=0.1
    )


def test_unknown_quant_mode_raises(monkeypatch):
    from mmf_tpu.modules.transformer import TransformerConfig, _quant_mode

    monkeypatch.setenv("MMF_TPU_QUANT", "int4")
    with pytest.raises(ValueError, match="int4"):
        _quant_mode(TransformerConfig())
    monkeypatch.delenv("MMF_TPU_QUANT")
    cfg = TransformerConfig(quant="fp8")
    with pytest.raises(ValueError, match="fp8"):
        _quant_mode(cfg)
