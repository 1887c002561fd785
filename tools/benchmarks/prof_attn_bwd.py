"""Attention fwd+bwd cost at train shapes (B=32,H=12,S=228,D=64 bf16):
plain XLA AD (stores probs) vs recompute VJP (stores only q,k,v)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np
from mmf_tpu.ops.attention import mha_reference

B, H, S, D = 32, 12, 228, 64
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, S, D) * 0.05, jnp.bfloat16)
k = jnp.asarray(rng.randn(B, H, S, D) * 0.05, jnp.bfloat16)
v = jnp.asarray(rng.randn(B, H, S, D) * 0.05, jnp.bfloat16)

def attn_plain(q, k, v):
    return mha_reference(q, k, v)

@jax.custom_vjp
def attn_remat(q, k, v):
    return mha_reference(q, k, v)

def _fwd(q, k, v):
    return mha_reference(q, k, v), (q, k, v)

def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: mha_reference(q, k, v), q, k, v)
    return vjp(g)

attn_remat.defvjp(_fwd, _bwd)

def marginal(f, iters1=10, iters2=60, repeats=3):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)
    gradf = jax.grad(loss, argnums=(0, 1, 2))
    def total(iters):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                gq, gk, gv = gradf(q * (1 + c * 1e-12), k, v)
                s = (jnp.sum(gq.astype(jnp.float32) ** 2)
                     + jnp.sum(gk.astype(jnp.float32) ** 2)
                     + jnp.sum(gv.astype(jnp.float32) ** 2))
                return s * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return c
        float(many(q, k, v))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter(); float(many(q, k, v))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = total(iters1), total(iters2)
    return (t2 - t1) / (iters2 - iters1)

t_plain = marginal(attn_plain)
t_remat = marginal(attn_remat)
print(f"attention fwd+bwd plain AD : {t_plain*1e6:7.0f} us")
print(f"attention fwd+bwd recompute: {t_remat*1e6:7.0f} us")

# grad parity check
gp = jax.jit(jax.grad(lambda q: jnp.sum(attn_plain(q, k, v)
                                        .astype(jnp.float32) ** 2)))(q)
gr = jax.jit(jax.grad(lambda q: jnp.sum(attn_remat(q, k, v)
                                        .astype(jnp.float32) ** 2)))(q)
print("grad max|d|:", float(jnp.max(jnp.abs(
    gp.astype(jnp.float32) - gr.astype(jnp.float32)))))
