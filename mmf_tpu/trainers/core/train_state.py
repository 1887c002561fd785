"""The jitted SPMD train/eval steps: the device-side heart of the trainer.

Replaces the reference's imperative hot loop internals
(trainers/core/training_loop.py:165-234: autocast forward, scaler backward,
clip, xm.reduce_gradients, optimizer step) with ONE compiled function:

  train_step(state, batch) -> (state', report)

  - gradient accumulation: lax.scan over `update_frequency` microbatches
    inside the step (reference looped host-side, training_loop.py:81-113);
  - grad clipping: optax transform in the chain;
  - cross-device mean: implicit — params/grads are replicated pytrees under
    GSPMD, batch is sharded along the mesh 'data' axis, so XLA inserts the
    psum;
  - NaN guard: per-step `nan_flag` in the report, checked host-side
    (reference _check_nan_losses, training_loop.py:173-191);
  - bf16: compute dtype inside models; params and updates stay f32.

State is donated on every call — no host round trip, buffers reused.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    variables: Any          # {"params": ..., possibly "batch_stats": ...}
    opt_state: Any
    rng: jnp.ndarray


def create_train_state(variables, tx: optax.GradientTransformation,
                       rng) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )


def _split_microbatches(batch: Dict[str, Any], n: int) -> Dict[str, Any]:
    """[B, ...] -> [n, B/n, ...] on every leaf."""
    def split(x):
        b = x.shape[0]
        assert b % n == 0, f"batch {b} not divisible by update_frequency {n}"
        return x.reshape((n, b // n) + x.shape[1:])

    return jax.tree_util.tree_map(split, batch)


def make_train_step(
    model_apply: Callable,
    losses_fn: Callable,
    tx: optax.GradientTransformation,
    update_frequency: int = 1,
    mutable: Tuple[str, ...] = (),
    meta: Optional[Dict[str, Any]] = None,
    report_fields: Tuple[str, ...] = (),
    moe_aux_weight: float = 0.0,
) -> Callable:
    """Build the pure train step.

    model_apply(variables, batch, train, rngs, mutable) -> output[, new_vars]
    losses_fn(batch_with_meta, output) -> {loss_key: scalar}
    report_fields: model-output fields (e.g. "scores") to carry into the
    report so the host can compute train-time metrics
    (``training.evaluate_metrics``, reference training_loop.py:120).
    moe_aux_weight: weight on the MoE load-balance auxiliary loss
    (``training.moe_aux_weight``); when > 0 the apply runs with
    'intermediates' mutable so modules/moe.py's sowed aux losses reach
    the total (without this, MoE trains without load balancing and the
    routers collapse).
    """
    meta = meta or {}
    # 'intermediates' is transient: made mutable only to harvest sowed
    # aux losses, then stripped so it never enters persistent state
    apply_mutable = tuple(mutable)
    if moe_aux_weight and "intermediates" not in apply_mutable:
        apply_mutable = apply_mutable + ("intermediates",)

    def loss_for_grads(params, extra_vars, batch, rng):
        variables = dict(extra_vars)
        variables["params"] = params
        rngs = {"dropout": rng}
        batch_in = dict(batch)
        batch_in.update(meta)
        if apply_mutable:
            output, new_vars = model_apply(
                variables, batch_in, True, rngs=rngs,
                mutable=list(apply_mutable)
            )
            new_vars = dict(new_vars)
        else:
            output = model_apply(variables, batch_in, True, rngs=rngs)
            new_vars = {}
        # model-provided losses take full precedence: when the model
        # returns "losses", NO registered-loss calculation runs — the
        # reference contract (base_model.py:321-335), which also lets
        # caption decoding return a dummy loss with no "scores" field
        if "losses" in output:
            losses = dict(output["losses"])
        else:
            losses = dict(losses_fn(batch_in, output))
        if moe_aux_weight:
            from mmf_tpu.modules.moe import collect_moe_aux_loss

            aux = collect_moe_aux_loss(new_vars.pop("intermediates", {}))
            losses["moe_aux_loss"] = moe_aux_weight * aux
        reported = {k: output[k] for k in report_fields if k in output}
        total = sum(jnp.mean(v) for v in losses.values())
        return total / update_frequency, (losses, new_vars, reported)

    grad_fn = jax.grad(loss_for_grads, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, Any]):
        extra_vars = {k: v for k, v in state.variables.items() if k != "params"}
        params = state.variables["params"]
        step_rng = jax.random.fold_in(state.rng, state.step)

        if update_frequency > 1:
            micro = _split_microbatches(batch, update_frequency)

            def scan_body(carry, mb):
                grads_acc, losses_acc, vars_c = carry
                i = losses_acc["__i__"]
                rng_i = jax.random.fold_in(step_rng, i)
                grads, (losses, new_vars, rep) = grad_fn(
                    params, vars_c, mb, rng_i
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                for k, v in losses.items():
                    losses_acc[k] = losses_acc[k] + jnp.mean(v) / update_frequency
                losses_acc["__i__"] = i + 1
                vars_c = new_vars if mutable else vars_c
                return (grads_acc, losses_acc, vars_c), rep

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            # discover loss keys without spending FLOPs (abstract trace only)
            first_mb = jax.tree_util.tree_map(lambda x: x[0], micro)
            _, (probe_losses, _, _) = jax.eval_shape(
                grad_fn, params, extra_vars, first_mb, step_rng
            )
            losses_init = {k: jnp.zeros((), jnp.float32) for k in probe_losses}
            losses_init["__i__"] = jnp.zeros((), jnp.int32)
            (grads, losses_acc, new_extra), reported = jax.lax.scan(
                scan_body, (zero_grads, losses_init, extra_vars), micro
            )
            losses_acc.pop("__i__")
            losses = losses_acc
            extra_vars = new_extra
            # [n, B/n, ...] stacked ys -> [B, ...] full-batch fields
            reported = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), reported
            )
        else:
            grads, (losses, new_vars, reported) = grad_fn(
                params, extra_vars, batch, step_rng
            )
            losses = {k: jnp.mean(v) for k, v in losses.items()}
            if mutable:
                extra_vars = new_vars

        total_loss = sum(losses.values())
        nan_flag = ~jnp.isfinite(total_loss)

        updates, new_opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        new_variables = dict(extra_vars)
        new_variables["params"] = new_params

        new_state = TrainState(
            step=state.step + 1,
            variables=new_variables,
            opt_state=new_opt_state,
            rng=state.rng,
        )
        report = {
            "losses": losses,
            "total_loss": total_loss,
            "nan_flag": nan_flag,
            "num_updates": new_state.step,
        }
        report.update(reported)
        return new_state, report

    return train_step


def make_eval_step(model_apply: Callable, losses_fn: Optional[Callable] = None,
                   meta: Optional[Dict[str, Any]] = None) -> Callable:
    meta = meta or {}

    def eval_step(variables, batch, rng=None):
        batch_in = dict(batch)
        batch_in.update(meta)
        # "sampling" rng reaches stochastic decoders (BUTD nucleus
        # sampling); the trainer passes a fresh fold each batch
        rngs = {"sampling": rng} if rng is not None else None
        output = model_apply(variables, batch_in, False, rngs=rngs)
        if losses_fn is not None:
            output = dict(output)
            # model-provided losses take precedence (reference
            # base_model.py:321-335) — see loss_for_grads above
            if "losses" not in output:
                output["losses"] = dict(losses_fn(batch_in, output))
        return output

    return eval_step


def jit_train_step(train_step, mesh=None):
    """jit with donated state; shardings flow from input placements."""
    return jax.jit(train_step, donate_argnums=(0,))


def jit_eval_step(eval_step):
    return jax.jit(eval_step)
