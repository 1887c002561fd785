"""Bisect VisualBERT fwd cost: marginal per-encoder-layer time and the
fixed embeddings+classifier cost, using two iteration counts to cancel
the per-call tunnel overhead (~25 ms)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _example_batch, _visual_bert

B = 64
meta = {"dataset_name": "vqa2", "dataset_type": "val"}

def fwd_time(num_layers, iters, repeats=3):
    model = _visual_bert({"dtype": "bfloat16", "num_hidden_layers": num_layers})
    batch = _example_batch(batch_size=B)
    variables = model.init(jax.random.PRNGKey(0), dict(batch, **meta), False)
    @jax.jit
    def many(variables, batch):
        def body(c, x):
            b = dict(batch)
            b["image_feature_0"] = batch["image_feature_0"] + x * 1e-6 + c * 0
            s = model.apply(variables, dict(b, **meta), False)["scores"]
            return c + jnp.sum(s.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(iters, dtype=jnp.float32))
        return tot
    float(many(variables, batch))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(many(variables, batch))
        best = min(best, time.perf_counter() - t0)
    return best

for L in [0, 6, 12]:
    t20, t60 = fwd_time(L, 20), fwd_time(L, 60)
    marg = (t60 - t20) / 40
    print(f"layers={L:2d}: {marg*1e3:7.3f} ms/fwd (marginal)")
