"""Long-sequence TRAIN-step throughput: the full trunk fwd+bwd+AdamW at
S=512-2048 with the attention auto-dispatch vs pinned XLA — does the
Pallas flash kernel's op-level win (BENCH_NOTES "Flash crossover")
survive inside a real training step end-to-end?

One impl per process (the dispatch env is lru_cached):
    python tools/benchmarks/bench_train_longseq.py --attn auto --seqs 1024 2048
    python tools/benchmarks/bench_train_longseq.py --attn xla  --seqs 1024 2048
Prints one JSON line per seq len.
"""

from __future__ import annotations

import argparse
import functools
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", choices=["auto", "xla", "pallas"],
                    default="auto")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--seqs", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.attn != "auto":
        # must land before the first dispatch (lru_cached per process)
        os.environ["MMF_TPU_ATTENTION"] = args.attn

    import jax
    import jax.numpy as jnp
    import optax

    from mmf_tpu.modules.transformer import (
        TransformerConfig,
        TransformerEncoder,
    )
    from mmf_tpu.ops.attention import make_attention_bias

    for S in args.seqs:
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=args.hidden,
            num_hidden_layers=args.layers,
            num_attention_heads=args.hidden // 64,
            intermediate_size=4 * args.hidden,
            max_position_embeddings=S,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            dtype="bfloat16",
        )
        enc = TransformerEncoder(cfg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.randn(args.batch, S, args.hidden), jnp.bfloat16
        )
        bias = make_attention_bias(
            jnp.ones((args.batch, S), jnp.float32)
        )
        params = enc.init(
            jax.random.PRNGKey(0), x, bias, deterministic=False
        )["params"]
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p, x):
            out = enc.apply(
                {"params": p}, x, bias, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out.astype(jnp.float32) ** 2) / x.shape[0]

        @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
        def run_many(n, params, opt_state, x):
            def body(carry, i):
                p, o = carry
                val, grads = jax.value_and_grad(loss_fn)(
                    p, x + (i * 1e-6).astype(x.dtype)
                )
                updates, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), val

            (p, o), vals = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(n, dtype=jnp.float32),
            )
            return p, o, jnp.sum(vals)

        n1, n2 = 2, 2 + args.iters
        for n in (n1, n2):  # compile both lengths
            p2, o2, v = run_many(n, params, opt_state, x)
            jax.block_until_ready(v)
            params, opt_state = p2, o2

        def best_of(n):
            nonlocal params, opt_state
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                p2, o2, v = run_many(n, params, opt_state, x)
                float(v)
                best = min(best, time.perf_counter() - t0)
                params, opt_state = p2, o2
            return best

        t_step = (best_of(n2) - best_of(n1)) / (n2 - n1)
        print(json.dumps({
            "attn": args.attn, "S": S, "B": args.batch,
            "layers": args.layers, "hidden": args.hidden,
            "step_ms": round(t_step * 1e3, 2),
            "samples_per_sec": round(args.batch / t_step, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
