import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.modules.optimizers import build_optimizer_transform
from mmf_tpu.modules.schedulers import build_scheduler


def _config(opt_type="adam_w", opt_params=None, scheduler=None, training=None):
    cfg = {
        "optimizer": {"type": opt_type, "params": opt_params or {"lr": 1e-2}},
        "scheduler": scheduler or {},
        "training": {
            "max_updates": 100,
            "lr_scheduler": scheduler is not None,
            "use_warmup": False,
            "lr_steps": [],
            "lr_ratio": 0.1,
        },
    }
    if training:
        cfg["training"].update(training)
    return cfg


def test_adamw_reduces_loss():
    tx = build_optimizer_transform(_config(opt_params={"lr": 1e-1}))
    params = {"w": jnp.asarray([2.0, -3.0])}
    state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    for _ in range(100):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(loss(params)) < 1.0


def test_skip_zero_grad_optimizer():
    tx = build_optimizer_transform(
        _config("adam_w_skip_params_with_zero_grad", {"lr": 1e-1})
    )
    params = {"a": jnp.asarray([1.0]), "b": jnp.asarray([1.0])}
    state = tx.init(params)
    grads = {"a": jnp.asarray([1.0]), "b": jnp.asarray([0.0])}
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["a"][0])) > 0
    assert float(updates["b"][0]) == 0.0


def test_warmup_linear_schedule():
    sched = build_scheduler(
        _config(scheduler={"type": "warmup_linear",
                           "params": {"num_warmup_steps": 10,
                                      "num_training_steps": 100}})
    )
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(5)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(55)), 0.5)
    np.testing.assert_allclose(float(sched(100)), 0.0)


def test_pythia_schedule_steps():
    cfg = _config(scheduler={"type": "pythia"})
    cfg["training"].update(
        {"use_warmup": True, "warmup_iterations": 10, "warmup_factor": 0.2,
         "lr_steps": [50, 80], "lr_ratio": 0.1}
    )
    sched = build_scheduler(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.2)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(49)), 1.0)
    np.testing.assert_allclose(float(sched(50)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(sched(80)), 0.01, rtol=1e-5)


def test_warmup_cosine_schedule():
    sched = build_scheduler(
        _config(scheduler={"type": "warmup_cosine",
                           "params": {"num_warmup_steps": 10,
                                      "num_training_steps": 110}})
    )
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(60)), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-5)


def test_schedule_in_chain():
    sched = build_scheduler(
        _config(scheduler={"type": "warmup_linear",
                           "params": {"num_warmup_steps": 2,
                                      "num_training_steps": 10}})
    )
    tx = build_optimizer_transform(
        _config("sgd", {"lr": 1.0}), schedule_fn=sched
    )
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0])}
    updates, state = tx.update(grads, state, params)
    # step 0 -> multiplier 0 -> no update
    np.testing.assert_allclose(float(updates["w"][0]), 0.0)
