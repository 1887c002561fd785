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


def test_lr_multiplier_trajectory_matches_torch_param_groups():
    """Per-module lr scaling (scale_updates_by_prefix, the reference's
    per-group lr in m4c.py:306-326 / finetune_lr_multiplier in
    utils/modeling.py:48-66) must reproduce torch AdamW param groups
    EXACTLY over a multi-step trajectory — including the coupling of
    weight decay and schedule to each group's scaled lr."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from mmf_tpu.modules.schedulers import build_scheduler

    LR, WD, EPS, MULT, TOTAL, WARMUP = 1e-2, 0.01, 1e-8, 0.1, 8, 2
    rng = np.random.RandomState(0)
    w_trunk = rng.randn(4, 4).astype(np.float32)
    w_cls = rng.randn(4, 2).astype(np.float32)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 2).astype(np.float32)

    # ---- torch: two param groups, trunk at lr*MULT ----
    t_trunk = torch.nn.Parameter(torch.from_numpy(w_trunk.copy()))
    t_cls = torch.nn.Parameter(torch.from_numpy(w_cls.copy()))
    topt = torch.optim.AdamW(
        [{"params": [t_cls]},
         {"params": [t_trunk], "lr": LR * MULT}],
        lr=LR, eps=EPS, weight_decay=WD,
    )

    def lr_lambda(step):
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    tx_, ty_ = torch.from_numpy(x), torch.from_numpy(y)
    for _ in range(TOTAL):
        topt.zero_grad()
        loss = torch.sum((tx_ @ t_trunk @ t_cls - ty_) ** 2)
        loss.backward()
        topt.step()
        tsched.step()

    # ---- ours: adamw + schedule + scale_updates_by_prefix ----
    config = {
        "optimizer": {"type": "adam_w",
                      "params": {"lr": LR, "eps": EPS,
                                 "weight_decay": WD}},
        "scheduler": {"type": "warmup_linear",
                      "params": {"num_warmup_steps": WARMUP,
                                 "num_training_steps": TOTAL}},
        "training": {"max_updates": TOTAL, "lr_scheduler": True},
    }
    tx = build_optimizer_transform(
        config,
        schedule_fn=build_scheduler(config),
        lr_multipliers={"trunk": MULT, "classifier": 1.0},
    )
    params = {"trunk": jnp.asarray(w_trunk),
              "classifier": jnp.asarray(w_cls)}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.sum(
                (x @ p["trunk"] @ p["classifier"] - y) ** 2
            )

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(TOTAL):
        params, opt_state = step(params, opt_state)

    np.testing.assert_allclose(
        np.asarray(params["trunk"]), t_trunk.detach().numpy(),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(params["classifier"]), t_cls.detach().numpy(),
        rtol=1e-5, atol=1e-7,
    )
