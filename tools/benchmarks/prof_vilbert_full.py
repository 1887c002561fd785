"""Localize the ViLBERT full-model vs stack-sum gap.

prof_vilbert.py shows each layer family at 82-88% MFU in isolation
(stack-sum upper bound ~3300 samples/s) while the full model benches at
~1300-1375. Measure, with the identical scan methodology (params as jit
ARGS — closing over them embeds ~1GB of HLO constants and stalls the
remote-compile tunnel, see BENCH_NOTES "Train-step anatomy"):
  (a) the ViLBertBase trunk alone,
  (b) the registered ViLBERT wrapper (what bench_model_families times),
  (c) a distinct-weights 6-layer text stack (weight-reuse hoisting probe).

Run: python tools/benchmarks/prof_vilbert_full.py
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
from mmf_tpu.models.vilbert import TextLayer, ViLBertBase
from mmf_tpu.ops.attention import make_attention_bias


def timed_scan(apply_one, params, x0, iters=50, repeats=3):
    """apply_one(params, x) -> x; params passed as jit args."""

    @jax.jit
    def run(params, x0):
        def body(c, _):
            return apply_one(params, c), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(run(params, x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    B, T, R = args.batch, 128, 100

    cfg = dict(load_yaml("configs/models/vilbert/defaults.yaml")
               ["model_config"]["vilbert"])
    cfg.update(dtype="bfloat16", hidden_dropout_prob=0.0)
    bf = jnp.bfloat16
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    rs = np.random.RandomState(0)
    ids_np = rs.randint(0, 30522, (B, T))
    feat_np = rs.randn(B, R, 2048).astype(np.float32)
    loc_np = rs.rand(B, R, 5).astype(np.float32)
    tok_np = np.zeros((B, T), np.int32)
    am_np = np.ones((B, T), np.int32)
    im_np = np.ones((B, R), np.int32)

    def cpu_init(fn, *a):
        with jax.default_device(cpu):
            a = [jax.device_put(np.asarray(x), cpu) for x in a]
            v = jax.jit(fn)(*a)
            v = jax.tree_util.tree_map(np.asarray, v)
        return jax.device_put(v, tpu)

    rng_np = np.zeros((2,), np.uint32)

    # (a) trunk alone
    trunk = ViLBertBase(cfg)
    tv = cpu_init(
        lambda r, i, f: trunk.init(r, i, f, loc_np, tok_np, am_np, im_np,
                                   True),
        rng_np, ids_np, feat_np)
    print("trunk init done", flush=True)

    ids = jax.device_put(ids_np, tpu)
    feat = jax.device_put(feat_np, tpu)
    loc = jax.device_put(loc_np, tpu)
    tok = jax.device_put(tok_np, tpu)
    am = jax.device_put(am_np, tpu)
    im = jax.device_put(im_np, tpu)

    def trunk_one(params, x):
        txt, img, pt, pv = trunk.apply(params, ids, x, loc, tok, am, im,
                                       True)
        return x + (jnp.mean(pt) + jnp.mean(img)).astype(x.dtype) * 0

    t = timed_scan(trunk_one, tv, feat)
    print(f"trunk ViLBertBase: {t*1e3:.2f} ms/fwd -> {B/t:.0f} samples/s",
          flush=True)

    # (c) distinct-weights text stack, 6 layers
    layers = [TextLayer(cfg) for _ in range(6)]
    txt0_np = rs.randn(B, T, cfg["hidden_size"]).astype(np.float32)
    t_bias = make_attention_bias(jnp.asarray(am_np), bf)
    t_bias_np = np.asarray(t_bias.astype(jnp.float32))
    lvars = [cpu_init(lambda r, x, b, l=l: l.init(
                 r, x.astype(jnp.bfloat16), b.astype(jnp.bfloat16), True),
             rng_np, txt0_np, t_bias_np) for l in layers]
    print("layer inits done", flush=True)
    txt0 = jax.device_put(txt0_np, tpu).astype(bf)

    def stack_one(params, x):
        for l, v in zip(layers, params):
            x = l.apply(v, x, t_bias, True)
        return x

    t2 = timed_scan(stack_one, lvars, txt0)
    print(f"6 distinct text layers: {t2*1e3:.2f} ms -> "
          f"{t2/6*1e3:.3f} ms/layer", flush=True)

    # (b) full wrapper, as bench_model_families does
    from mmf_tpu.common.registry import registry
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    wcfg = dict(cfg)
    wcfg.update(training_head_type="classification", num_labels=3129)
    model = registry.get_model_class("vilbert")(config=wcfg)
    batch_np = {
        "input_ids": ids_np,
        "input_mask": am_np,
        "segment_ids": tok_np,
        "image_feature_0": feat_np,
        "image_info_0": {
            "max_features": np.full((B,), R),
            "bbox": rs.rand(B, R, 5).astype(np.float32),
        },
    }
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    variables = cpu_init(
        lambda r: model.init(r, dict(batch_np, **meta), False), rng_np)
    print("wrapper init done", flush=True)

    jb = jax.device_put(batch_np, tpu)

    def wrap_one(params, x):
        b = dict(jb)
        b["image_feature_0"] = x
        out = model.apply(params, dict(b, **meta), False)
        return x + jnp.sum(out["scores"].astype(jnp.float32)) * 0

    t3 = timed_scan(wrap_one, variables, jb["image_feature_0"])
    print(f"full ViLBERT wrapper: {t3*1e3:.2f} ms/fwd -> {B/t3:.0f} "
          f"samples/s", flush=True)


if __name__ == "__main__":
    main()
