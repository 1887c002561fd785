import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.ops.attention import (
    combine_biases,
    dot_product_attention,
    flash_attention,
    make_attention_bias,
    mha_reference,
)


def _inputs(b=2, h=4, sq=128, skv=128, d=64, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, h, sq, d), jnp.float32)
    k = jax.random.normal(k2, (b, h, skv, d), jnp.float32)
    v = jax.random.normal(k3, (b, h, skv, d), jnp.float32)
    return q, k, v


def test_flash_matches_reference_no_bias():
    q, k, v = _inputs()
    ref = mha_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_with_padding_mask():
    q, k, v = _inputs(sq=128, skv=128)
    mask = jnp.concatenate(
        [jnp.ones((2, 100)), jnp.zeros((2, 28))], axis=1
    )
    bias = make_attention_bias(mask)
    ref = mha_reference(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_unaligned_seq_lens():
    # 114 text+image tokens (MMBT-ish), 77 kv — forces internal padding
    q, k, v = _inputs(sq=114, skv=77)
    mask = jnp.ones((2, 77))
    bias = make_attention_bias(mask)
    ref = mha_reference(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_cross_attention_asymmetric():
    # ViLBERT co-attention: text queries x image keys
    q, _, _ = _inputs(sq=128, d=64)
    _, k, v = _inputs(skv=100, d=64, seed=1)
    ref = mha_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_prefix_lm_causal_bias():
    # M4C MMT: decoder span attends causally (full bias [B,1,Sq,Skv])
    b, h, s, d = 1, 2, 64, 32
    q, k, v = _inputs(b=b, h=h, sq=s, skv=s, d=d)
    causal = jnp.tril(jnp.ones((s, s)))
    bias = (1.0 - causal)[None, None] * -1e9
    ref = mha_reference(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    q, k, v = _inputs()
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ref = mha_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_flash_gradients_match_reference():
    q, k, v = _inputs(b=1, h=2, sq=64, skv=64, d=32)
    mask = jnp.concatenate([jnp.ones((1, 50)), jnp.zeros((1, 14))], axis=1)
    bias = make_attention_bias(mask)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, bias) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fully_masked_rows_yield_zeros():
    q, k, v = _inputs(b=1, h=1, sq=8, skv=8, d=32)
    mask = jnp.zeros((1, 8))  # everything masked
    bias = make_attention_bias(mask)
    out = flash_attention(q, k, v, bias, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dispatcher_xla():
    q, k, v = _inputs(b=1, h=1, sq=16, skv=16, d=8)
    out = dot_product_attention(q, k, v, impl="xla")
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_combine_biases():
    a = jnp.ones((1, 1, 1, 4))
    assert combine_biases(None, None) is None
    np.testing.assert_allclose(np.asarray(combine_biases(a, None, a)), 2.0)


def test_attention_probs_dropout_active_in_train():
    """Attention-probs dropout (reference BertSelfAttention's
    dropout(attention_probs)) must perturb outputs in train mode and be
    a no-op when deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmf_tpu.modules.transformer import SelfAttention, TransformerConfig

    cfg = TransformerConfig(hidden_size=32, num_attention_heads=4,
                            attention_probs_dropout_prob=0.5,
                            hidden_dropout_prob=0.0)
    mod = SelfAttention(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 32), jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x)

    det = mod.apply(variables, x, deterministic=True)
    det2 = mod.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))

    tr1 = mod.apply(variables, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    tr2 = mod.apply(variables, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.abs(np.asarray(tr1) - np.asarray(tr2)).max() > 1e-6
    assert np.abs(np.asarray(tr1) - np.asarray(det)).max() > 1e-6


# ---------------------------------------------------------------------------
# Pallas blockwise backward (VJP from saved LSE — ops/attention.py
# _flash_backward). The forward grad test above covers the 1-block case;
# these pin multi-block grids, asymmetric lens, padding, bf16, and the
# remat escape hatch.
# ---------------------------------------------------------------------------
def _grad_pair(q, k, v, bias=None):
    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, bias, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, bias)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    return g_flash, g_ref


def test_flash_backward_multiblock():
    """Several q AND kv blocks (256x384 at 128-blocks): the fori_loop
    accumulation paths in both backward kernels."""
    q, k, v = _inputs(b=1, h=2, sq=256, skv=384, d=64, seed=3)
    mask = jnp.concatenate([jnp.ones((1, 300)), jnp.zeros((1, 84))], axis=1)
    g_flash, g_ref = _grad_pair(q, k, v, make_attention_bias(mask))
    for a, b in zip(g_flash, g_ref):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * max(scale, 1.0)
        )


def test_flash_backward_no_bias():
    q, k, v = _inputs(b=2, h=2, sq=128, skv=256, d=32, seed=4)
    g_flash, g_ref = _grad_pair(q, k, v, None)
    for a, b in zip(g_flash, g_ref):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * max(scale, 1.0)
        )


def test_flash_backward_cross_attention_unaligned():
    """Two-stream co-attention shapes: asymmetric, non-128-multiple
    lens exercise the padded-row/column zeroing in the backward."""
    q, k, v = _inputs(b=2, h=2, sq=100, skv=228, d=64, seed=5)
    mask = jnp.concatenate([jnp.ones((2, 200)), jnp.zeros((2, 28))], axis=1)
    g_flash, g_ref = _grad_pair(q, k, v, make_attention_bias(mask))
    for a, b in zip(g_flash, g_ref):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * max(scale, 1.0)
        )


def test_flash_backward_prefix_lm_bias():
    """Full [B,1,Sq,Skv] structural bias (M4C prefix-LM causal span)."""
    q, k, v = _inputs(b=1, h=2, sq=64, skv=64, d=32, seed=6)
    causal = jnp.tril(jnp.ones((64, 64)))
    bias = (1.0 - causal)[None, None] * -1e9
    g_flash, g_ref = _grad_pair(q, k, v, bias)
    for a, b in zip(g_flash, g_ref):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * max(scale, 1.0)
        )


def test_flash_backward_bf16():
    q, k, v = _inputs(b=1, h=2, sq=128, skv=128, d=64, seed=7)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    g_flash, g_ref = _grad_pair(q, k, v, None)
    for a, b in zip(g_flash, g_ref):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=0.15, rtol=0.1,
        )


def test_flash_backward_fully_masked_rows_finite():
    """All-masked rows: with the finite mask constant, softmax
    shift-invariance makes the row's attention uniform on BOTH paths
    (not zero) — grads must stay finite and match the XLA reference."""
    q, k, v = _inputs(b=1, h=1, sq=8, skv=8, d=32, seed=8)
    bias = make_attention_bias(jnp.zeros((1, 8)))
    g_flash, g_ref = _grad_pair(q, k, v, bias)
    for a, b in zip(g_flash, g_ref):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_backward_remat_mode(monkeypatch):
    """MMF_TPU_FLASH_BWD=remat routes the VJP through XLA recompute and
    must produce the same gradients (and a real dbias)."""
    q, k, v = _inputs(b=1, h=2, sq=64, skv=64, d=32, seed=9)
    bias = make_attention_bias(
        jnp.concatenate([jnp.ones((1, 50)), jnp.zeros((1, 14))], axis=1)
    )
    g_pallas, _ = _grad_pair(q, k, v, bias)
    monkeypatch.setenv("MMF_TPU_FLASH_BWD", "remat")
    g_remat, _ = _grad_pair(q, k, v, bias)
    for a, b in zip(g_pallas, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
