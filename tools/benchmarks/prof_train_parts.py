"""Decompose the fused train step (B=32 bf16): fwd-only vs fwd+bwd vs
fwd+bwd+optimizer, marginal over two scan lengths (cancels the ~25 ms
fixed per-call tunnel overhead).

Note: params/state must be jit ARGUMENTS — closing over a concrete param
pytree embeds ~440 MB of weights as HLO constants and the remote-compile
endpoint rejects the program with HTTP 413.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _example_batch, _visual_bert
from mmf_tpu.modules.losses import Losses
from mmf_tpu.modules.optimizers import build_optimizer_transform
from mmf_tpu.trainers.core.train_state import create_train_state, make_train_step

B = 32
model = _visual_bert({"dtype": "bfloat16"})
batch = dict(_example_batch(batch_size=B))
batch["targets"] = jnp.zeros((B, 3129), jnp.float32)
meta = {"dataset_name": "vqa2", "dataset_type": "train"}
variables = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       dict(batch, **meta), False)
losses = Losses([{"type": "logit_bce"}])
tx = build_optimizer_transform(
    {"optimizer": {"type": "adam_w", "params": {"lr": 5e-5}}, "training": {}},
    max_grad_norm=1.0)
state0 = create_train_state(variables, tx, jax.random.PRNGKey(2))
params0 = variables["params"]


def loss_fn(params, b):
    out = model.apply({"params": params}, dict(b, **meta), True,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    l = losses(dict(b, **meta), out)
    return sum(jnp.mean(v) for v in l.values())


def marginal(make_many, carry0, iters1=8, iters2=32, repeats=3):
    def total(iters):
        many = jax.jit(make_many(iters))
        c, l = many(carry0, batch); float(jnp.sum(l))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            c, l = many(carry0, batch); float(jnp.sum(l))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = total(iters1), total(iters2)
    return (t2 - t1) / (iters2 - iters1)


# fwd only (train mode, with loss); carry = (params, scalar)
def make_fwd(iters):
    def many(carry, batch):
        params, c0 = carry
        def body(c, i):
            bb = dict(batch)
            bb["image_feature_0"] = batch["image_feature_0"] + i * 1e-6 + c * 0
            return c + loss_fn(params, bb).astype(jnp.float32), jnp.zeros(())
        c, ls = jax.lax.scan(body, c0, jnp.arange(iters, dtype=jnp.float32))
        return (params, c), c
    return many
t_fwd = marginal(make_fwd, (params0, jnp.zeros(())))
print(f"fwd+loss            : {t_fwd*1e3:7.2f} ms")

# fwd+bwd
def make_grad(iters):
    def many(carry, batch):
        params, c0 = carry
        def body(c, i):
            bb = dict(batch)
            bb["image_feature_0"] = batch["image_feature_0"] + i * 1e-6 + c * 0
            l, g = jax.value_and_grad(loss_fn)(params, bb)
            gs = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                     for x in jax.tree_util.tree_leaves(g))
            return c + l.astype(jnp.float32) + gs * 1e-12, jnp.zeros(())
        c, ls = jax.lax.scan(body, c0, jnp.arange(iters, dtype=jnp.float32))
        return (params, c), c
    return many
t_grad = marginal(make_grad, (params0, jnp.zeros(())))
print(f"fwd+bwd             : {t_grad*1e3:7.2f} ms")

# full step (incl optimizer)
step = make_train_step(model.apply, losses, tx, meta=meta)
def make_step(iters):
    def many(state, batch):
        def body(st, i):
            bb = dict(batch)
            bb["image_feature_0"] = batch["image_feature_0"] + i * 1e-6
            st, report = step(st, bb)
            return st, report["total_loss"]
        state, ls = jax.lax.scan(body, state,
                                 jnp.arange(iters, dtype=jnp.float32))
        return state, ls[-1]
    return many
t_step = marginal(make_step, state0)
print(f"full step (incl opt): {t_step*1e3:7.2f} ms")
print(f"-> samples/s: fwd {B/t_fwd:.0f}, fwd+bwd {B/t_grad:.0f}, "
      f"step {B/t_step:.0f}")
