"""M4C eval decode: compile time + throughput at TextVQA shapes.

Used to record the scan-vs-unroll decoder delta in BENCH_NOTES.md
(VERDICT r1 item 5). Run on the TPU chip:
    python tools/benchmarks/prof_m4c_decode.py [--batch 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# self-pathing: do NOT use PYTHONPATH=/root/repo for TPU scripts — the
# repo's top-level dirs shadow modules the axon PJRT plugin imports,
# breaking backend registration. Appending (not prepending) is safe.
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def build(batch=32, decode_unroll=1):
    import jax
    import jax.numpy as jnp

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import load_yaml
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    cfg = load_yaml("configs/models/m4c/defaults.yaml")
    mc = cfg["model_config"]["m4c"]
    mc["decode_unroll"] = decode_unroll
    model = registry.get_model_class("m4c")(config=mc)

    rng = np.random.RandomState(0)
    T_txt, N_obj, N_ocr, T_dec = 20, 100, 50, 12
    batch_dict = {
        "text": jnp.asarray(rng.randint(0, 30522, (batch, T_txt))),
        "text_len": jnp.full((batch,), T_txt, jnp.int32),
        "image_feature_0": jnp.asarray(
            rng.randn(batch, N_obj, 2048).astype(np.float32)),
        "obj_bbox_coordinates": jnp.asarray(
            rng.rand(batch, N_obj, 4).astype(np.float32)),
        "image_info_0": {"max_features": jnp.full((batch,), N_obj, jnp.int32)},
        "context_feature_0": jnp.asarray(
            rng.randn(batch, N_ocr, 300).astype(np.float32)),
        "context_feature_1": jnp.asarray(
            rng.randn(batch, N_ocr, 604).astype(np.float32)),
        "image_feature_1": jnp.asarray(
            rng.randn(batch, N_ocr, 2048).astype(np.float32)),
        "order_vectors": jnp.zeros((batch, N_ocr, 50), jnp.float32),
        "ocr_bbox_coordinates": jnp.asarray(
            rng.rand(batch, N_ocr, 4).astype(np.float32)),
        "context_info_0": {"max_features": jnp.full((batch,), N_ocr, jnp.int32)},
        "train_prev_inds": jnp.zeros((batch, T_dec), jnp.int32),
    }
    meta = {"dataset_name": "textvqa", "dataset_type": "val"}
    variables = model.init(jax.random.PRNGKey(0), dict(batch_dict, **meta), False)
    return model, variables, batch_dict, meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--unroll", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    model, variables, batch, meta = build(args.batch, args.unroll)

    def eval_many(variables, batch, iters):
        def body(carry, x):
            b = dict(batch)
            b["image_feature_0"] = batch["image_feature_0"] + x * 1e-6
            s = model.apply(variables, dict(b, **meta), False)["scores"]
            return carry + jnp.sum(s.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(iters, dtype=jnp.float32))
        return total

    jitted = jax.jit(eval_many, static_argnums=(2,))
    t0 = time.perf_counter()
    float(jitted(variables, batch, args.iters))
    compile_and_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(variables, batch, args.iters))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "batch": args.batch,
        "unroll": args.unroll,
        "compile_plus_first_run_s": round(compile_and_first, 2),
        "best_run_s": round(best, 4),
        "samples_per_sec": round(args.batch * args.iters / best, 2),
    }))


if __name__ == "__main__":
    main()
