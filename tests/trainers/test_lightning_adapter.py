"""Lightning config-adapter translation: every reference
``trainer.params`` key (configs/defaults.yaml:182-220) is mapped,
satisfied-by-construction, or loudly rejected — nothing silent
(VERDICT r1 item 8)."""

import logging

import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.trainers.lightning_trainer import LightningTrainer
from mmf_tpu.utils.env import setup_imports

setup_imports()


def _base_config(**params):
    return omega.create(
        {
            "model": "simple_model",
            "model_config": {"simple_model": {"in_dim": 1}},
            "training": {
                "max_updates": 100,
                "max_epochs": None,
                "log_interval": 100,
                "evaluation_interval": 1000,
                "update_frequency": 1,
                "checkpoint_interval": 1000,
                "clip_gradients": False,
                "fp16": False,
            },
            "evaluation": {},
            "checkpoint": {},
            "env": {"save_dir": "/tmp/x"},
            "trainer": {"type": "lightning", "params": params},
        }
    )


def _translate(**params):
    config = _base_config(**params)
    LightningTrainer._translate(
        config, config["trainer"]["params"]
    )
    return config


@pytest.mark.parametrize(
    "param,value,section,key,expected",
    [
        ("max_steps", 22000, "training", "max_updates", 22000),
        ("max_epochs", 3, "training", "max_epochs", 3),
        ("log_every_n_steps", 50, "training", "log_interval", 50),
        ("val_check_interval", 500, "training", "evaluation_interval", 500),
        ("accumulate_grad_batches", 4, "training", "update_frequency", 4),
        ("limit_val_batches", 7, "evaluation", "limit_val_batches", 7),
        ("limit_val_batches", 0.25, "evaluation", "limit_val_batches", 0.25),
    ],
)
def test_direct_param_maps(param, value, section, key, expected):
    config = _translate(**{param: value})
    assert config[section][key] == expected


def test_gradient_clip_val():
    config = _translate(gradient_clip_val=1.5)
    assert config["training"]["clip_gradients"] is True
    assert config["training"]["max_grad_l2_norm"] == 1.5
    # 0.0 means no clipping (PL semantics)
    config = _translate(gradient_clip_val=0.0)
    assert config["training"]["clip_gradients"] is False


@pytest.mark.parametrize("precision", [16, "16-mixed", "bf16", "bf16-mixed"])
def test_precision_half_maps_to_bf16(precision):
    config = _translate(precision=precision)
    assert config["model_config"]["simple_model"]["dtype"] == "bfloat16"
    assert config["training"]["fp16"] is True


def test_precision_32_is_noop():
    config = _translate(precision=32)
    assert "dtype" not in config["model_config"]["simple_model"]


def test_precision_64_warns(caplog):
    with caplog.at_level(logging.WARNING, logger="mmf_tpu"):
        _translate(precision=64)
    assert any("precision" in r.message for r in caplog.records)


def test_enable_checkpointing_false_disables_interval_saves():
    config = _translate(enable_checkpointing=False)
    assert config["training"]["checkpoint_interval"] == 2 ** 31
    config = _translate(enable_checkpointing=True)
    assert config["training"]["checkpoint_interval"] == 1000


def test_resume_from_checkpoint_precedence():
    config = _translate(resume_from_checkpoint="/tmp/some.ckpt")
    assert config["checkpoint"]["resume_file"] == "/tmp/some.ckpt"


def test_default_root_dir():
    config = _translate(default_root_dir="/tmp/run42")
    assert config["env"]["save_dir"] == "/tmp/run42"


@pytest.mark.parametrize("key", ["gpus", "num_nodes", "devices",
                                 "accelerator", "strategy"])
def test_topology_keys_logged_not_silent(key, caplog):
    with caplog.at_level(logging.INFO, logger="mmf_tpu"):
        _translate(**{key: 8})
    assert any(key in r.message and "mesh" in r.message
               for r in caplog.records)


@pytest.mark.parametrize("key,value", [
    ("deterministic", True), ("benchmark", True),
    ("enable_progress_bar", False), ("num_sanity_val_steps", 0),
    ("logger", False),
])
def test_satisfied_keys_logged(key, value, caplog):
    with caplog.at_level(logging.INFO, logger="mmf_tpu"):
        _translate(**{key: value})
    assert any(key in r.message for r in caplog.records)


def test_unknown_key_warns_loudly(caplog):
    with caplog.at_level(logging.WARNING, logger="mmf_tpu"):
        _translate(sync_batchnorm=True)
    assert any(
        "sync_batchnorm" in r.message and "IGNORED" in r.message
        for r in caplog.records
    )


def test_full_reference_default_params_translate(caplog):
    """The reference's complete default trainer.params block
    (configs/defaults.yaml:191-220) translates without a single
    'IGNORED' warning."""
    defaults = dict(
        gpus=1, num_nodes=1, precision=32, deterministic=False,
        benchmark=False, max_steps=22000, max_epochs=None,
        gradient_clip_val=0.0, num_sanity_val_steps=0,
        enable_checkpointing=True, accumulate_grad_batches=1,
        val_check_interval=1000, log_every_n_steps=100, logger=False,
        limit_val_batches=1.0, enable_progress_bar=False,
        resume_from_checkpoint=None,
    )
    with caplog.at_level(logging.WARNING, logger="mmf_tpu"):
        config = _translate(**defaults)
    assert not any("IGNORED" in r.message for r in caplog.records)
    assert config["training"]["max_updates"] == 22000
    assert config["training"]["evaluation_interval"] == 1000


def test_limit_val_batches_caps_eval(tmp_path):
    """End-to-end: limit_val_batches actually bounds the eval loop."""
    import sys

    sys.path.insert(0, "tests")
    from trainer_fixtures import make_trainer

    t = make_trainer(
        save_dir=str(tmp_path / "lvb"),
        **{"training.max_updates": 1, "evaluation.limit_val_batches": 2,
           "training.batch_size": 8},
    )
    t.train()
    report, meter = t.evaluation_loop("val")
    # 100 examples / batch 8 = 13 batches unlimited; capped at 2
    assert report.batch_size == 16
