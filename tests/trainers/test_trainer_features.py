import os

import jax
import numpy as np
import pytest

from tests.trainer_fixtures import make_trainer


def test_training_is_sharded_over_mesh(tmp_path):
    """Batches must actually be split across the 8 virtual devices."""
    trainer = make_trainer(save_dir=str(tmp_path / "s"),
                           **{"training.max_updates": 2})
    assert dict(trainer.mesh.shape) == {"data": 8, "model": 1}
    trainer.train()
    # grab one batch and confirm its device placement is sharded
    from mmf_tpu.parallel import mesh as mesh_lib

    batch = next(iter(trainer.train_loader))
    device_batch = mesh_lib.shard_batch(batch.pytree(), trainer.mesh)
    x = device_batch["data"]
    assert len(x.sharding.device_set) == 8
    # params replicated
    p = jax.tree_util.tree_leaves(trainer.train_state.variables)[0]
    assert p.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path):
    save_dir = str(tmp_path / "ckpt")
    t1 = make_trainer(save_dir=save_dir, **{
        "training.max_updates": 4,
        "training.checkpoint_interval": 2,
    })
    t1.train()
    assert os.path.exists(os.path.join(save_dir, "current.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "models", "model_2.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "models", "model_4.ckpt"))
    assert os.path.exists(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(
        os.path.join(save_dir, "simple_model_final.pth")
    )
    w1 = np.asarray(t1.get_variables()["params"]["classifier"]["kernel"])

    # resume: counters and params restored
    t2 = make_trainer(save_dir=save_dir, **{
        "training.max_updates": 4,
        "checkpoint.resume": True,
    })
    # force state materialization with a batch
    batch = next(iter(t2.train_loader))
    t2._ensure_state(batch)
    t2.checkpoint_callback.checkpoint.load_state_dict()
    assert t2.num_updates == 4
    w2 = np.asarray(t2.get_variables()["params"]["classifier"]["kernel"])
    np.testing.assert_allclose(w1, w2, atol=1e-6)
    # no further updates needed
    t2.train()
    assert t2.num_updates == 4


def test_max_to_keep_rotation(tmp_path):
    save_dir = str(tmp_path / "rot")
    t = make_trainer(save_dir=save_dir, **{
        "training.max_updates": 6,
        "training.checkpoint_interval": 1,
        "checkpoint.max_to_keep": 2,
    })
    t.train()
    models = sorted(os.listdir(os.path.join(save_dir, "models")))
    assert len(models) == 2
    assert "model_5.ckpt" in models and "model_6.ckpt" in models


def test_early_stopping_stops(tmp_path):
    t = make_trainer(save_dir=str(tmp_path / "es"), **{
        "training.max_updates": 50,
        "training.evaluation_interval": 2,
        "training.early_stop.enabled": True,
        "training.early_stop.criteria": "numbers/mse",
        "training.early_stop.minimize": True,
        "training.early_stop.patience": 2,
        "optimizer.params.lr": 0.0,  # no progress -> stops after patience
    })
    t.train()
    assert t.num_updates < 50
    assert t.early_stop_callback.early_stopping.is_activated()


def test_evaluation_with_metrics(tmp_path):
    t = make_trainer(save_dir=str(tmp_path / "m"), **{
        "training.max_updates": 2,
    })
    # attach a metric that works for regression shape: use accuracy on scores
    from mmf_tpu.modules.metrics import Metrics

    t.metrics = Metrics([])
    t.metrics_params = t.metrics.required_params
    t.train()
    report, meter = t.evaluation_loop("val")
    assert report is not None
    assert any("mse" in k for k in meter.meters)


def test_log_file_contains_progress(tmp_path):
    from mmf_tpu.utils.logger import setup_logger

    log_dir = str(tmp_path / "logs")
    setup_logger(output=log_dir, clear_handlers=False)
    t = make_trainer(save_dir=str(tmp_path / "lg"), **{
        "training.max_updates": 4,
        "training.log_interval": 2,
    })
    t.train()
    logs = os.listdir(log_dir)
    assert len(logs) >= 1
    content = open(os.path.join(log_dir, logs[0])).read()
    assert "progress" in content and "4/4" in content
    assert "ups" in content and "eta" in content


def test_multi_dataset_training(tmp_path):
    """Joint training over two datasets: per-dataset jitted steps and
    per-dataset loss keys in the meter."""
    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega
    from tests.trainer_fixtures import NumbersDataset, make_config

    if registry.get_builder_class("numbers2") is None:
        from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder

        @registry.register_builder("numbers2")
        class Numbers2Builder(BaseDatasetBuilder):
            def __init__(self):
                super().__init__("numbers2")

            @classmethod
            def config_path(cls):
                return None

            def build(self, config, dataset_type="train", *a, **kw):
                return

            def load(self, config, dataset_type="train", *a, **kw):
                ds = NumbersDataset(48, dataset_type=dataset_type)
                ds.dataset_name = "numbers2"
                return ds

    config = make_config(
        save_dir=str(tmp_path / "multi"),
        **{"training.max_updates": 6, "training.log_interval": 1,
           "multitasking.type": "round_robin",
           "multitasking.params.skip_epoch_check": True},
    )
    with omega.open_dict(config):
        config["datasets"] = "numbers,numbers2"
        config["dataset_config"]["numbers2"] = {"num_examples": 48,
                                                "in_dim": 1}
    registry.register("config", config)
    from mmf_tpu.trainers.mmf_trainer import build_trainer

    trainer = build_trainer(config)
    trainer.load()
    trainer.train()
    keys = set(trainer.meter.meters.keys())
    assert "train/numbers/mse" in keys, keys
    assert "train/numbers2/mse" in keys, keys
    # one compiled step per dataset
    assert len(trainer._train_steps) == 2


def test_dp_sharded_loss_equals_single_device(tmp_path):
    """The dp=8 sharded first-update loss must equal the same computation
    on one device with the full batch (SURVEY §4: single-host vs sharded
    parity)."""
    import jax.numpy as jnp

    trainer = make_trainer(save_dir=str(tmp_path / "dp"),
                           **{"training.max_updates": 1,
                              "training.log_interval": 1})
    assert dict(trainer.mesh.shape) == {"data": 8, "model": 1}

    # capture initial params and the exact first batch before training
    trainer.train_loader.seed_sampler(1)
    batch = next(iter(trainer.train_loader))
    trainer._ensure_state(batch)
    initial = jax.tree_util.tree_map(
        np.asarray, trainer.train_state.variables
    )

    # independent single-device reference: mse = mean((x*w+b - y)^2)
    x = np.asarray(batch["data"])
    y = np.asarray(batch["targets"])
    out = trainer.model.apply(initial, {"data": jnp.asarray(x)}, False)
    expected = float(np.mean((np.asarray(out["scores"]) - y) ** 2))

    trainer.train()
    got = None
    for key, meter_val in trainer.meter.meters.items():
        if key.endswith("total_loss"):
            got = float(meter_val.global_avg)
    assert got is not None
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_streaming_torchmetrics_eval(tmp_path):
    """evaluation.torchmetrics drives the streaming-metric surface
    (reference lightning_core/torchmetric.py:14-148)."""
    from mmf_tpu.trainers.core.torchmetric import StreamingMetrics

    t = make_trainer(save_dir=str(tmp_path / "tm"), **{
        "training.max_updates": 1,
    })
    t.torchmetrics = StreamingMetrics([
        {"type": "top_k_accuracy", "key": "top_1", "params": {"k": 1}},
    ])
    t.train()
    report, meter = t.evaluation_loop("val")
    assert report is not None
    assert any(k.endswith("val_top_1") for k in meter.meters), meter.meters
    # streaming value is a bounded fraction
    v = t.torchmetrics.get_scalar_dict()["top_1"]
    assert 0.0 <= v <= 1.0


def test_streaming_topk_accuracy_values():
    import numpy as np

    from mmf_tpu.trainers.core.torchmetric import StreamingMetrics

    tm = StreamingMetrics(["top_k_accuracy"])
    scores = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]], np.float32)
    targets = np.array([1, 1, 1])
    tm.update({"targets": targets, "dataset_name": "x"}, {"scores": scores})
    assert abs(tm.get_scalar_dict()["top_k_accuracy"] - 2 / 3) < 1e-6
    tm.reset()
    tm.update(
        {"targets": np.eye(2, dtype=np.float32)[targets], "dataset_name": "x"},
        {"scores": scores},
    )
    assert abs(tm.get_scalar_dict()["top_k_accuracy"] - 2 / 3) < 1e-6
    # k=2 over 2 classes is always a hit
    tm2 = StreamingMetrics([{"type": "topk_accuracy", "params": {"k": 2}}])
    tm2.update({"targets": targets, "dataset_name": "x"}, {"scores": scores})
    assert tm2.get_scalar_dict()["topk_accuracy"] == 1.0
    # dataset applicability filter
    tm3 = StreamingMetrics([
        {"type": "top_k_accuracy", "datasets": ["other"]},
    ])
    tm3.update({"targets": targets, "dataset_name": "x"}, {"scores": scores})
    assert tm3.get_scalar_dict()["top_k_accuracy"] == 0.0


def test_training_fp16_maps_to_bf16_compute(tmp_path):
    """training.fp16 (the reference's autocast flag) switches the model
    to bf16 compute on TPU; an explicit model dtype wins."""
    t = make_trainer(save_dir=str(tmp_path / "fp16"), **{
        "training.max_updates": 1, "training.fp16": True,
    })
    assert t.config["model_config"]["simple_model"]["dtype"] == "bfloat16"
    t.train()  # one update runs under bf16 without issue
