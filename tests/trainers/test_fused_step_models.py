"""Every core model family through the REAL fused trainer step
(make_train_step: fwd + loss + bwd + clip + optimizer in one jit, state
donated) — not just a bare forward. This integration seam is where the
round-5 lr-multiplier string-label bug hid: the model's optimizer hooks
(get_weight_decay_mask / get_lr_multipliers) feed transform state
through the jit boundary, and nothing else drives that combination.

visual_bert is covered by __graft_entry__/bench_train, mmbt end-to-end
by the convergence CLI run, m4c by tests/models/test_m4c.py — this file
adds the remaining families (vilbert, vilt, mmf_transformer) plus mmbt's
in-process fused step (BatchNorm batch_stats through donation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.losses import Losses
from mmf_tpu.modules.optimizers import build_optimizer_transform
from mmf_tpu.trainers.core.train_state import (
    create_train_state,
    make_train_step,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _run_two_fused_steps(model, batch, loss_type, targets):
    batch = dict(batch)
    meta = {"dataset_name": batch.pop("dataset_name"),
            "dataset_type": batch.pop("dataset_type")}
    batch["targets"] = targets

    variables = model.init(
        {"params": RNG, "dropout": jax.random.PRNGKey(1)},
        dict(batch, **meta), True,
    )
    kwargs = {}
    if hasattr(model, "get_weight_decay_mask"):
        kwargs["weight_decay_mask"] = model.get_weight_decay_mask()
    if getattr(model, "get_lr_multipliers", None):
        mults = model.get_lr_multipliers()
        if mults:
            kwargs["lr_multipliers"] = mults
    tx = build_optimizer_transform(
        {"optimizer": {"type": "adam_w", "params": {"lr": 1e-3}},
         "training": {}},
        max_grad_norm=1.0, **kwargs,
    )
    step = make_train_step(
        model.apply, Losses([{"type": loss_type}]), tx,
        update_frequency=1, meta=meta,
    )
    state = create_train_state(variables, tx, jax.random.PRNGKey(2))
    losses = []
    for _ in range(2):
        state, report = step(state, batch)
        losses.append(float(jax.tree_util.tree_leaves(report["losses"])[0]))
    assert all(np.isfinite(losses)), losses
    assert losses[1] != losses[0], "params did not move"
    return losses


def test_vilbert_fused_train_step():
    from tests.models.test_mmbt_vilbert import _small_vilbert, _vilbert_batch

    model = registry.get_model_class("vilbert")(config=_small_vilbert())
    targets = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (2, 3)).astype(np.float32)
    )
    _run_two_fused_steps(model, _vilbert_batch(), "logit_bce", targets)


def test_vilt_fused_train_step():
    from tests.models.test_vilt import _batch, _small_vilt

    model = registry.get_model_class("vilt")(config=_small_vilt())
    targets = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (2, 2)).astype(np.float32)
    )
    _run_two_fused_steps(model, _batch(), "logit_bce", targets)


def test_mmft_fused_train_step():
    from tests.models.test_mmf_transformer import _batch, _small_config

    model = registry.get_model_class("mmf_transformer")(
        config=_small_config()
    )
    targets = jnp.asarray(
        np.random.RandomState(1).randint(0, 2, (2, 3)).astype(np.float32)
    )
    _run_two_fused_steps(model, _batch(), "logit_bce", targets)


def test_mmbt_fused_train_step():
    from tests.models.test_mmbt_vilbert import _mmbt_batch, _small_mmbt

    model = registry.get_model_class("mmbt")(
        config=_small_mmbt(direct=True)
    )
    targets = jnp.asarray(np.array([1, 0], np.int32))
    _run_two_fused_steps(
        model, _mmbt_batch(direct=True), "cross_entropy", targets
    )


def test_auto_update_frequency_policy():
    """training.auto_update_frequency=true: the trainer splits the global
    batch into the largest microbatch count keeping >=32 samples per
    data-parallel device (the measured MXU sweet spot, BENCH_NOTES
    'Train flag/batch sweep'); explicit update_frequency wins."""
    from mmf_tpu.trainers.mmf_trainer import MMFTrainer

    class _Mesh:
        def __init__(self, data):
            self.shape = {"data": data, "model": 1}

    t = MMFTrainer.__new__(MMFTrainer)

    def pick(batch_size, n_data=1):
        t.mesh = _Mesh(n_data)
        batch = {"x": jnp.zeros((batch_size, 4))}
        return t._auto_update_frequency(batch)

    assert pick(32) == 1          # already at the sweet spot
    assert pick(64) == 2          # 2 x 32
    assert pick(128) == 4         # 4 x 32
    assert pick(256) == 8
    assert pick(48) == 1          # 48/2=24 < 32 -> no split
    assert pick(96) == 3          # 3 x 32
    assert pick(256, n_data=4) == 2   # 256/4=64 per device -> 2 x 32
    assert pick(128, n_data=8) == 1   # 16/device already < 32
