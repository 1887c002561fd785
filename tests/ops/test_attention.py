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
