"""LR schedulers as optax schedules (parity with mmf/modules/schedulers.py).

Each registered scheduler is a factory ``(config, optimizer_config) ->
optax schedule fn (step -> multiplier)``; the trainer multiplies it into
the base learning rate inside the optax chain, so stepping happens on
device with no host round trip (the reference stepped a torch scheduler
per update from a callback).
"""

from __future__ import annotations

import math

from mmf_tpu.common.registry import registry


@registry.register_scheduler("pythia")
def pythia_scheduler(config, scheduler_params=None):
    """Warmup by a constant factor, then step-decay at lr_steps
    (reference schedulers.py:20 + modules/optimizers lr_lambda_update)."""
    training = config["training"]
    use_warmup = training.get("use_warmup", False)
    warmup_iterations = training.get("warmup_iterations", 1000) if use_warmup else 0
    warmup_factor = training.get("warmup_factor", 0.2)
    lr_steps = list(training.get("lr_steps", []))
    lr_ratio = training.get("lr_ratio", 0.1)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        alpha = step / max(warmup_iterations, 1)
        warmup_mult = warmup_factor * (1.0 - alpha) + alpha
        idx = sum((step >= s).astype(jnp.int32) for s in lr_steps) if lr_steps else 0
        decay_mult = lr_ratio ** idx
        return jnp.where(
            (step < warmup_iterations) & (warmup_iterations > 0),
            warmup_mult,
            decay_mult,
        )

    return schedule


@registry.register_scheduler("warmup_linear")
def warmup_linear_scheduler(config, scheduler_params=None):
    """Linear warmup then linear decay to zero at num_training_steps
    (reference schedulers.py:34)."""
    p = scheduler_params or {}
    num_warmup = p.get("num_warmup_steps", 2000)
    num_training = p.get("num_training_steps", config["training"]["max_updates"])

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup)
        decay = jnp.maximum(
            0.0,
            (num_training - step) / jnp.maximum(1.0, num_training - num_warmup),
        )
        return jnp.where(step < num_warmup, warm, decay)

    return schedule


@registry.register_scheduler("warmup_cosine")
def warmup_cosine_scheduler(config, scheduler_params=None):
    """Linear warmup then cosine decay (reference schedulers.py:40)."""
    p = scheduler_params or {}
    num_warmup = p.get("num_warmup_steps", 2000)
    num_training = p.get("num_training_steps", config["training"]["max_updates"])
    num_cycles = p.get("num_cycles", 0.5)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup)
        progress = (step - num_warmup) / jnp.maximum(1.0, num_training - num_warmup)
        cos = jnp.maximum(
            0.0,
            0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)),
        )
        return jnp.where(step < num_warmup, warm, cos)

    return schedule


@registry.register_scheduler("multi_step")
def multi_step_scheduler(config, scheduler_params=None):
    """Step decay at lr_steps with optional warmup
    (reference schedulers.py:46)."""
    p = scheduler_params or {}
    lr_steps = list(p.get("lr_steps", []))
    lr_ratio = p.get("lr_ratio", 0.1)
    use_warmup = p.get("use_warmup", False)
    warmup_iterations = p.get("warmup_iterations", 0) if use_warmup else 0
    warmup_factor = p.get("warmup_factor", 0.2)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        alpha = step / max(warmup_iterations, 1)
        warmup_mult = warmup_factor * (1.0 - alpha) + alpha
        idx = sum((step >= s).astype(jnp.int32) for s in lr_steps) if lr_steps else 0
        decay_mult = lr_ratio ** idx
        return jnp.where(
            (step < warmup_iterations) & (warmup_iterations > 0),
            warmup_mult,
            decay_mult,
        )

    return schedule


def build_scheduler(config):
    """Build the configured schedule fn, or None if lr_scheduler disabled."""
    training = config["training"]
    scheduler_config = config.get("scheduler", {}) or {}
    if not training.get("lr_scheduler", False) and not scheduler_config:
        return None
    stype = scheduler_config.get("type", "pythia")
    params = scheduler_config.get("params", {})
    factory = registry.get_scheduler_class(stype)
    if factory is None:
        raise ValueError(f"No scheduler named {stype} registered")
    return factory(config, params)
