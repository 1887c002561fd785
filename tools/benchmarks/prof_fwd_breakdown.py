"""Decompose VisualBERT fwd time: full model vs encoder-only vs attention-only."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _example_batch, _visual_bert

B, H, S, D = 64, 12, 228, 64

def timeit(fn, *args, iters=20, repeats=3):
    @jax.jit
    def many(*a):
        def body(c, x):
            out = fn(*a, x)
            return c + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(iters, dtype=jnp.float32))
        return tot
    float(many(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(many(*args)); best = min(best, time.perf_counter()-t0)
    return best / iters

# 1. full model
model = _visual_bert({"dtype": "bfloat16"})
batch = _example_batch(batch_size=B)
meta = {"dataset_name": "vqa2", "dataset_type": "val"}
variables = model.init(jax.random.PRNGKey(0), dict(batch, **meta), False)
def full(v, b, x):
    bb = dict(b); bb["image_feature_0"] = b["image_feature_0"] + x*1e-6
    return model.apply(v, dict(bb, **meta), False)["scores"]
t_full = timeit(full, variables, batch)
print(f"full fwd: {t_full*1e3:.2f} ms -> {B/t_full:.0f} samples/s")

# 2. attention op alone at model shape (bf16), per layer
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
def attn(q, k, v, x):
    qq = q + x.astype(jnp.bfloat16)*1e-6
    logits = jnp.einsum("bhqd,bhkd->bhqk", qq, k) / np.sqrt(D)
    p = jax.nn.softmax(logits.astype(jnp.bfloat16), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
t_attn = timeit(attn, q, k, v)
print(f"attention (1 layer): {t_attn*1e6:.0f} us; x12 = {t_attn*12*1e3:.2f} ms")

# 3. gemm-equivalent: one layer's projections+FFN
x2 = jnp.asarray(rng.randn(B*S, 768), jnp.bfloat16)
w1 = jnp.asarray(rng.randn(768, 768), jnp.bfloat16)
w2 = jnp.asarray(rng.randn(768, 3072), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(3072, 768), jnp.bfloat16)
def gemms(x2, w1, w2, w3, i):
    y = x2 + i.astype(jnp.bfloat16)*1e-6
    for _ in range(4):
        y = y @ w1
    h = jax.nn.gelu(y @ w2)
    return h @ w3
t_gemm = timeit(gemms, x2, w1, w2, w3)
print(f"gemms (1 layer equiv): {t_gemm*1e6:.0f} us; x12 = {t_gemm*12*1e3:.2f} ms")
