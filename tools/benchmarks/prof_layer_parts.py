"""Marginal cost of TransformerLayer vs its parts at VisualBERT eval shapes
(B=64, S=228, H=768), overhead-cancelled via two scan lengths."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np
from mmf_tpu.modules.transformer import (
    TransformerConfig, TransformerLayer, SelfAttention, FeedForward,
)
from mmf_tpu.ops.attention import make_attention_bias

B, S, Hd = 64, 228, 768
cfg = TransformerConfig(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, S, Hd) * 0.02, jnp.bfloat16)
mask = jnp.ones((B, S), jnp.int32)
bias = make_attention_bias(mask, jnp.bfloat16)

def marginal(module, use_bias=True, iters1=20, iters2=80, repeats=3):
    variables = module.init(jax.random.PRNGKey(0), x0, bias) if use_bias else \
                module.init(jax.random.PRNGKey(0), x0)
    def run(v, x):
        return module.apply(v, x, bias) if use_bias else module.apply(v, x)
    def total(iters):
        @jax.jit
        def many(v, x):
            def body(y, _):
                y = run(v, y)
                return (y * 0.5).astype(jnp.bfloat16), None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(y.astype(jnp.float32))
        float(many(variables, x0))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter(); float(many(variables, x0))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = total(iters1), total(iters2)
    return (t2 - t1) / (iters2 - iters1)

t_layer = marginal(TransformerLayer(cfg))
t_attn = marginal(SelfAttention(cfg))
t_ffn = marginal(FeedForward(cfg), use_bias=False)
print(f"full layer : {t_layer*1e6:7.0f} us")
print(f"attn block : {t_attn*1e6:7.0f} us (QKV+O gemms + attention + LN)")
print(f"ffn block  : {t_ffn*1e6:7.0f} us (2 gemms + gelu + LN)")
