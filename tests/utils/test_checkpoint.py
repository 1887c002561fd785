"""Checkpoint save/resume round-trips (behavioral coverage mirroring the
reference tests/utils/test_checkpoint.py: save_config, save-and-load,
resume precedence, resets, max_to_keep, finalize/restore,
pretrained_state_mapping)."""

import json
import os

import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.utils.checkpoint import Checkpoint


class FakeTrainer:
    """Duck-typed trainer exposing exactly the surface Checkpoint uses."""

    def __init__(self, config, seed=0):
        self.config = config
        rng = np.random.RandomState(seed)
        self.variables = {
            "params": {
                "encoder": {"kernel": rng.randn(4, 4).astype(np.float32)},
                "classifier": {"bias": rng.randn(4).astype(np.float32)},
            }
        }
        self.opt_state = {"mu": {"encoder": np.zeros((4, 4), np.float32)}}
        self.current_iteration = 0
        self.num_updates = 0
        self.current_epoch = 0
        self.early_stop_callback = None
        self.model = None

    def get_variables(self):
        return self.variables

    def set_variables(self, variables):
        self.variables = variables

    def get_opt_state(self):
        return self.opt_state

    def set_opt_state(self, opt_state):
        self.opt_state = opt_state


def make_config(tmp_path, **ckpt_overrides):
    ckpt = {"max_to_keep": -1, "resume": False, "reset": {}}
    ckpt.update(ckpt_overrides)
    return omega.create(
        {
            "model": "simple",
            "env": {"save_dir": str(tmp_path)},
            "checkpoint": ckpt,
        }
    )


def _bump(trainer, updates):
    """Mutate trainer state so save/load differences are observable."""
    trainer.variables = {
        "params": {
            "encoder": {
                "kernel": trainer.variables["params"]["encoder"]["kernel"]
                + 1.0
            },
            "classifier": {
                "bias": trainer.variables["params"]["classifier"]["bias"] - 1.0
            },
        }
    }
    trainer.opt_state = {
        "mu": {"encoder": trainer.opt_state["mu"]["encoder"] + 0.5}
    }
    trainer.num_updates = updates
    trainer.current_iteration = updates
    trainer.current_epoch = 1


def test_save_config_written(tmp_path):
    config = make_config(tmp_path)
    Checkpoint(FakeTrainer(config))
    cfg_file = os.path.join(str(tmp_path), "config.yaml")
    assert os.path.exists(cfg_file)
    loaded = omega.create(open(cfg_file).read())
    assert loaded["model"] == "simple"
    assert loaded["env"]["save_dir"] == str(tmp_path)


def test_save_and_resume_roundtrip(tmp_path):
    config = make_config(tmp_path, resume=True)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)

    _bump(trainer, updates=5)
    saved_kernel = trainer.variables["params"]["encoder"]["kernel"].copy()
    saved_mu = trainer.opt_state["mu"]["encoder"].copy()
    ckpt.save(5, iteration=5)
    assert os.path.isdir(os.path.join(str(tmp_path), "models", "model_5.ckpt"))
    assert os.path.isdir(os.path.join(str(tmp_path), "current.ckpt"))

    # fresh trainer resumes from current.ckpt
    trainer2 = FakeTrainer(config, seed=99)
    ckpt2 = Checkpoint(trainer2)
    ckpt2.load_state_dict()
    np.testing.assert_array_equal(
        trainer2.variables["params"]["encoder"]["kernel"], saved_kernel
    )
    np.testing.assert_array_equal(
        trainer2.opt_state["mu"]["encoder"], saved_mu
    )
    assert trainer2.num_updates == 5
    assert trainer2.current_iteration == 5
    assert trainer2.current_epoch == 1


def test_resume_false_does_not_load(tmp_path):
    config = make_config(tmp_path, resume=False)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=3)
    ckpt.save(3)

    trainer2 = FakeTrainer(config, seed=99)
    before = trainer2.variables["params"]["encoder"]["kernel"].copy()
    Checkpoint(trainer2).load_state_dict()
    np.testing.assert_array_equal(
        trainer2.variables["params"]["encoder"]["kernel"], before
    )
    assert trainer2.num_updates == 0


def test_resume_best_prefers_best_ckpt(tmp_path):
    config = make_config(tmp_path, resume=True, resume_best=True)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)

    _bump(trainer, updates=2)
    best_kernel = trainer.variables["params"]["encoder"]["kernel"].copy()
    ckpt.save(2, update_best=True)
    _bump(trainer, updates=7)  # later non-best save
    ckpt.save(7)

    trainer2 = FakeTrainer(config, seed=99)
    Checkpoint(trainer2).load_state_dict()
    np.testing.assert_array_equal(
        trainer2.variables["params"]["encoder"]["kernel"], best_kernel
    )
    assert trainer2.num_updates == 2


def test_resume_file(tmp_path):
    config = make_config(tmp_path, resume=False)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=4)
    want = trainer.variables["params"]["classifier"]["bias"].copy()
    ckpt.save(4)

    resume_path = os.path.join(str(tmp_path), "models", "model_4.ckpt")
    config2 = make_config(tmp_path, resume_file=resume_path)
    trainer2 = FakeTrainer(config2, seed=99)
    Checkpoint(trainer2).load_state_dict()
    np.testing.assert_array_equal(
        trainer2.variables["params"]["classifier"]["bias"], want
    )


def test_resets(tmp_path):
    config = make_config(tmp_path, resume=True)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=6)
    ckpt.save(6)

    # reset counts: params restored, counters untouched
    cfg_counts = make_config(tmp_path, resume=True, reset={"counts": True})
    t = FakeTrainer(cfg_counts, seed=99)
    Checkpoint(t).load_state_dict()
    assert t.num_updates == 0
    np.testing.assert_array_equal(
        t.variables["params"]["encoder"]["kernel"],
        trainer.variables["params"]["encoder"]["kernel"],
    )

    # reset optimizer: opt_state untouched
    cfg_opt = make_config(tmp_path, resume=True, reset={"optimizer": True})
    t = FakeTrainer(cfg_opt, seed=99)
    before_mu = t.opt_state["mu"]["encoder"].copy()
    Checkpoint(t).load_state_dict()
    np.testing.assert_array_equal(t.opt_state["mu"]["encoder"], before_mu)
    assert t.num_updates == 6

    # reset all
    cfg_all = make_config(tmp_path, resume=True, reset={"all": True})
    t = FakeTrainer(cfg_all, seed=99)
    before_mu = t.opt_state["mu"]["encoder"].copy()
    Checkpoint(t).load_state_dict()
    np.testing.assert_array_equal(t.opt_state["mu"]["encoder"], before_mu)
    assert t.num_updates == 0


def test_max_to_keep_rotation(tmp_path):
    config = make_config(tmp_path, max_to_keep=2)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    for u in (1, 2, 3, 4):
        ckpt.save(u)
    models = sorted(os.listdir(os.path.join(str(tmp_path), "models")))
    assert models == ["model_3.ckpt", "model_4.ckpt"]
    # current.ckpt always tracks the latest
    assert os.path.isdir(os.path.join(str(tmp_path), "current.ckpt"))


def test_finalize_and_restore(tmp_path):
    config = make_config(tmp_path)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=9)
    best_kernel = trainer.variables["params"]["encoder"]["kernel"].copy()
    ckpt.save(9, update_best=True)
    ckpt.finalize()
    final = os.path.join(str(tmp_path), "simple_final.pth")
    assert os.path.isdir(final)

    # restore() pulls best.ckpt back into the trainer
    _bump(trainer, updates=12)
    ckpt.restore()
    np.testing.assert_array_equal(
        trainer.variables["params"]["encoder"]["kernel"], best_kernel
    )


def test_meta_contains_config_and_git(tmp_path):
    config = make_config(tmp_path)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    ckpt.save(1)
    meta_path = os.path.join(
        str(tmp_path), "models", "model_1.ckpt", "mmf_meta.json"
    )
    meta = json.load(open(meta_path))
    assert "model: simple" in meta["config"]
    # repo is a git checkout, so git metadata must be captured
    assert meta.get("git/commit_hash")


def test_pretrained_state_mapping(tmp_path):
    config = make_config(tmp_path)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=2)
    pretrained_kernel = trainer.variables["params"]["encoder"]["kernel"].copy()
    pretrained_bias = trainer.variables["params"]["classifier"]["bias"].copy()
    ckpt.save(2)

    cfg2 = make_config(
        tmp_path,
        resume_file=os.path.join(str(tmp_path), "models", "model_2.ckpt"),
        resume_pretrained=True,
        pretrained_state_mapping={"encoder": "encoder"},
    )
    trainer2 = FakeTrainer(cfg2, seed=99)
    before_bias = trainer2.variables["params"]["classifier"]["bias"].copy()
    Checkpoint(trainer2).load_state_dict()
    # mapped prefix copied...
    np.testing.assert_array_equal(
        trainer2.variables["params"]["encoder"]["kernel"], pretrained_kernel
    )
    # ...unmapped prefix untouched
    np.testing.assert_array_equal(
        trainer2.variables["params"]["classifier"]["bias"], before_bias
    )
    assert not np.array_equal(before_bias, pretrained_bias)


def test_async_save_roundtrip(tmp_path):
    config = make_config(tmp_path, resume=True, async_save=True)
    trainer = FakeTrainer(config)
    ckpt = Checkpoint(trainer)
    _bump(trainer, updates=3)
    want = trainer.variables["params"]["encoder"]["kernel"].copy()
    ckpt.save(3)
    ckpt.wait_pending()
    assert os.path.isdir(os.path.join(str(tmp_path), "current.ckpt"))

    trainer2 = FakeTrainer(config, seed=99)
    Checkpoint(trainer2).load_state_dict()
    np.testing.assert_array_equal(
        trainer2.variables["params"]["encoder"]["kernel"], want
    )


def test_early_stopping_counts_roundtrip(tmp_path):
    class FakeEarlyStopping:
        best_monitored_iteration = 11
        best_monitored_update = 10
        best_monitored_value = 0.75

        def __init__(self):
            self.restored = None

        def init_from_checkpoint(self, info):
            self.restored = info

    class FakeESCallback:
        def __init__(self):
            self.early_stopping = FakeEarlyStopping()

    config = make_config(tmp_path, resume=True)
    trainer = FakeTrainer(config)
    trainer.early_stop_callback = FakeESCallback()
    ckpt = Checkpoint(trainer)
    ckpt.save(10, iteration=11)

    trainer2 = FakeTrainer(config, seed=99)
    trainer2.early_stop_callback = FakeESCallback()
    Checkpoint(trainer2).load_state_dict()
    restored = trainer2.early_stop_callback.early_stopping.restored
    assert restored == {
        "best_iteration": 11,
        "best_update": 10,
        "best_metric_value": pytest.approx(0.75),
    }
