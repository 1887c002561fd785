"""Decompose ViLBERT forward time per piece (two-point marginal, v5e).

For each stack (text layers / image layers / connection layers) time a
jitted scan at two depths and report the marginal per-layer time next to
its bf16 FLOPs-ideal, so the MFU sink is visible per component.

Run: python tools/benchmarks/prof_vilbert.py [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.models.vilbert import ConnectionLayer, ImageLayer, TextLayer
from mmf_tpu.ops.attention import make_attention_bias

PEAK = 197e12  # v5e bf16


def timed(fn, *args, iters=100, repeats=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def scan_stack(module_fn, n, apply_args, init_args, iters=100):
    """Build a jitted fn running `n` copies of the module inside one scan
    iteration, `iters` scan steps; returns sec per scan step."""
    mod, vars_ = module_fn()

    def one(x):
        for _ in range(n):
            x = apply_args(mod, vars_, x)
        return x

    @jax.jit
    def run(x0):
        def body(c, _):
            return one(c), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(y[0].astype(jnp.float32)) if isinstance(y, tuple) \
            else jnp.sum(y.astype(jnp.float32))

    x0 = init_args()
    t = timed(run, x0, iters=iters)
    print(f"  [{time.strftime('%H:%M:%S')}] depth={n}: "
          f"{t*1e3:.3f} ms/step", flush=True)
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()
    B, T, R = args.batch, 128, 100

    cfg = dict(load_yaml("configs/models/vilbert/defaults.yaml")
               ["model_config"]["vilbert"])
    cfg.update(dtype="bfloat16", hidden_dropout_prob=0.0)
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    txt = jax.random.normal(rng, (B, T, cfg["hidden_size"]), bf)
    img = jax.random.normal(rng, (B, R, cfg["v_hidden_size"]), bf)
    t_bias = make_attention_bias(jnp.ones((B, T), jnp.int32), bf)
    v_bias = make_attention_bias(jnp.ones((B, R), jnp.int32), bf)
    t_mask = jnp.ones((B, T), jnp.int32)

    results = {}

    # --- text layer stack ---
    def make_text():
        m = TextLayer(cfg)
        v = m.init(rng, txt, t_bias, True)
        return m, v

    def apply_text(m, v, x):
        return m.apply(v, x, t_bias, True)

    for n in (2, 6):
        results[("text", n)] = scan_stack(
            make_text, n, apply_text, lambda: txt, args.iters)

    # --- image layer stack ---
    def make_img():
        m = ImageLayer(cfg)
        v = m.init(rng, img, v_bias, txt, t_mask, True)
        return m, v

    def apply_img(m, v, x):
        return m.apply(v, x, v_bias, txt, t_mask, True)

    for n in (2, 6):
        results[("image", n)] = scan_stack(
            make_img, n, apply_img, lambda: img, args.iters)

    # --- connection layer stack ---
    def make_conn():
        m = ConnectionLayer(cfg)
        v = m.init(rng, img, v_bias, txt, t_bias, True)
        return m, v

    def apply_conn(m, v, x):
        i, t = x
        return m.apply(v, i, v_bias, t, t_bias, True)

    def init_conn():
        return (img, txt)

    for n in (2, 6):
        results[("conn", n)] = scan_stack(
            make_conn, n, apply_conn, init_conn, args.iters)

    # FLOPs per layer per batch
    hs, its = cfg["hidden_size"], cfg["intermediate_size"]
    vh, vi = cfg["v_hidden_size"], cfg["v_intermediate_size"]
    bi = cfg["bi_hidden_size"]
    f_text = B * (2 * T * (4 * hs * hs + 2 * hs * its) + 4 * T * T * hs)
    f_img = B * (2 * R * (4 * vh * vh + 2 * vh * vi) + 4 * R * R * vh)
    f_conn = B * 2 * (
        R * 3 * vh * bi + T * 3 * hs * bi          # qkv both streams
        + 2 * T * R * bi * 2                        # both cross attns
        + R * bi * vh + T * bi * hs                 # biout
        + 2 * R * vh * vi + 2 * T * hs * its        # ffns
    )

    print(f"{'piece':8} {'marginal ms/layer':>18} {'ideal ms':>9} "
          f"{'MFU %':>6}")
    for name, fl in (("text", f_text), ("image", f_img), ("conn", f_conn)):
        marg = (results[(name, 6)] - results[(name, 2)]) / 4
        ideal = fl / PEAK
        print(f"{name:8} {marg*1e3:18.3f} {ideal*1e3:9.3f} "
              f"{100*ideal/marg:6.1f}")
    tot = (results[("text", 6)] - results[("text", 2)]) / 4 * 12 \
        + (results[("image", 6)] - results[("image", 2)]) / 4 * 6 \
        + (results[("conn", 6)] - results[("conn", 2)]) / 4 * 6
    print(f"sum of stacks (12t+6v+6c): {tot*1e3:.2f} ms/batch -> "
          f"{B/tot:.0f} samples/s upper bound")


if __name__ == "__main__":
    main()
