"""FFN block cost by activation function at [64*228, 768->3072->768] bf16."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

B, S, Hd, I = 64, 228, 768, 3072
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B * S, Hd) * 0.02, jnp.bfloat16)
w1 = jnp.asarray(rng.randn(Hd, I) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.randn(I, Hd) * 0.02, jnp.bfloat16)
w1f = w1.astype(jnp.float32); w2f = w2.astype(jnp.float32)

ACTS = {
    "erf gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "tanh gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "identity": lambda x: x,
}

def marginal(fn, iters1=20, iters2=80, repeats=3):
    def total(iters):
        @jax.jit
        def many(x):
            def body(y, _):
                return fn(y), None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(y.astype(jnp.float32))
        float(many(x0))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter(); float(many(x0))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = total(iters1), total(iters2)
    return (t2 - t1) / (iters2 - iters1)

for name, act in ACTS.items():
    def ffn(y, act=act):
        h = act(y @ w1)
        return ((h @ w2) * 0.5).astype(jnp.bfloat16)
    print(f"ffn {name:10s}: {marginal(ffn)*1e6:7.0f} us")

# erf gelu but f32 weights cast per call (current model does this)
def ffn_cast(y):
    h = jax.nn.gelu(y @ w1f.astype(jnp.bfloat16), approximate=False)
    return ((h @ w2f.astype(jnp.bfloat16)) * 0.5).astype(jnp.bfloat16)
print(f"ffn erf + f32 weight cast: {marginal(ffn_cast)*1e6:7.0f} us")
