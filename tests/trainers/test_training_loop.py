import shutil

import numpy as np
import pytest

from tests.trainer_fixtures import make_trainer


@pytest.fixture(autouse=True)
def _cleanup(tmp_path):
    yield
    shutil.rmtree("/tmp/mmf_tpu_test_save", ignore_errors=True)


def test_exact_update_count(tmp_path):
    trainer = make_trainer(save_dir=str(tmp_path / "s1"))
    trainer.train()
    assert trainer.num_updates == 6
    assert trainer.current_iteration == 6
    # 100 examples / batch 8 = 12 batches/epoch -> 6 updates = half epoch
    assert trainer.current_epoch == 1


def test_loss_decreases(tmp_path):
    trainer = make_trainer(
        save_dir=str(tmp_path / "s2"),
        **{"training.max_updates": 60, "optimizer.params.lr": 0.00005},
    )
    trainer.train()
    meter = trainer.meter
    key = "train/numbers/mse"
    assert key in meter.meters
    # loss must have decreased from the start of training
    sv = meter.meters[key]
    assert sv.get_latest() <= sv.global_avg * 1.5


def test_epoch_based_training(tmp_path):
    trainer = make_trainer(
        save_dir=str(tmp_path / "s3"),
        **{"training.max_updates": "null", "training.max_epochs": 2},
    )
    trainer.train()
    # 100//8 = 12 batches per epoch, 2 epochs = 24 updates
    assert trainer.num_updates == 24


def test_update_frequency_equivalence(tmp_path):
    """(batch 4 x accum 2) and (batch 8 x accum 1) from the same seed must
    produce the same parameters (reference test_training_loop.py:21-94)."""
    t1 = make_trainer(
        save_dir=str(tmp_path / "a"),
        **{
            "training.batch_size": 8,
            "training.update_frequency": 2,
            "training.max_updates": 3,
            "training.seed": 7,
        },
    )
    t1.train()
    t2 = make_trainer(
        save_dir=str(tmp_path / "b"),
        **{
            "training.batch_size": 8,
            "training.update_frequency": 1,
            "training.max_updates": 3,
            "training.seed": 7,
        },
    )
    t2.train()
    p1 = t1.get_variables()["params"]
    p2 = t2.get_variables()["params"]
    w1 = np.asarray(p1["classifier"]["kernel"])
    w2 = np.asarray(p2["classifier"]["kernel"])
    # same examples, same order; accumulated-mean gradient == full-batch mean
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_evaluation_loop_runs(tmp_path):
    trainer = make_trainer(
        save_dir=str(tmp_path / "s4"),
        **{"training.max_updates": 2, "evaluation.metrics[0]": "accuracy"}
        if False
        else {"training.max_updates": 2},
    )
    trainer.train()
    report, meter = trainer.evaluation_loop("val")
    assert "val/numbers/mse" in meter.meters
    assert report.batch_size > 0


def test_evaluate_metrics_during_training(tmp_path):
    """training.evaluate_metrics computes metrics on the train batch at each
    log interval (reference training_loop.py:118-123)."""
    trainer = make_trainer(
        save_dir=str(tmp_path / "s6"),
        **{
            "training.max_updates": 4,
            "training.log_interval": 2,
            "training.evaluate_metrics": True,
            "evaluation.metrics[0]": "accuracy",
        },
    )
    trainer.train()
    assert "train/numbers/accuracy" in trainer.meter.meters


def test_evaluate_metrics_with_grad_accumulation(tmp_path):
    """scores ride out of the lax.scan accumulation path as stacked ys."""
    trainer = make_trainer(
        save_dir=str(tmp_path / "s7"),
        **{
            "training.max_updates": 2,
            "training.log_interval": 1,
            "training.update_frequency": 2,
            "training.evaluate_metrics": True,
            "evaluation.metrics[0]": "accuracy",
        },
    )
    trainer.train()
    assert "train/numbers/accuracy" in trainer.meter.meters


def test_nan_guard(tmp_path):
    trainer = make_trainer(
        save_dir=str(tmp_path / "s5"),
        **{"training.max_updates": 3, "optimizer.params.lr": 1e20,
           "training.log_interval": 1},
    )
    with pytest.raises(RuntimeError, match="NaN"):
        trainer.train()


def test_max_epochs_not_divided_by_update_frequency(tmp_path):
    """One loader batch is one optimizer update here (uf splits the batch
    into microbatches inside the step), so epochs convert to updates
    WITHOUT dividing by uf — dividing silently trained on 1/uf of the
    requested data."""
    t = make_trainer(save_dir=str(tmp_path / "uf"), **{
        "training.max_updates": "null",
        "training.max_epochs": 2,
        "training.update_frequency": 4,
        "training.batch_size": 8,
        "num_examples": 32,
    })
    t.train()
    # 32 examples / batch 8 = 4 updates per epoch, x2 epochs = 8
    assert t.num_updates == 8, t.num_updates


def test_user_callback_from_config(tmp_path):
    """A user callback registered via @registry.register_callback and
    named in training.callbacks must be constructed with its params and
    receive lifecycle hooks (reference tests/trainers/callbacks/
    test_user_callback.py)."""
    from mmf_tpu.common.registry import registry
    from mmf_tpu.trainers.callbacks.base import Callback

    if registry.get_callback_class("test_counter_callback") is None:

        @registry.register_callback("test_counter_callback")
        class CounterCallback(Callback):
            last_instance = None

            def __init__(self, config, trainer, boost=1):
                super().__init__(config, trainer)
                self.boost = boost
                self.counts = {"train_start": 0, "update_end": 0}
                CounterCallback.last_instance = self

            def on_train_start(self, **kwargs):
                self.counts["train_start"] += 1

            def on_update_end(self, **kwargs):
                self.counts["update_end"] += self.boost

    from mmf_tpu.config import omega
    from tests.trainer_fixtures import make_config
    from mmf_tpu.trainers.mmf_trainer import build_trainer

    config = make_config(save_dir=str(tmp_path), **{
        "training.max_updates": 4,
    })
    with omega.open_dict(config):
        config["training"]["callbacks"] = [
            {"type": "test_counter_callback", "params": {"boost": 2}}
        ]
    trainer = build_trainer(config)
    trainer.load()
    trainer.train()

    cb_cls = registry.get_callback_class("test_counter_callback")
    cb = cb_cls.last_instance
    assert cb is not None and cb.boost == 2
    assert cb.counts["train_start"] == 1
    # 4 updates x boost 2 — proves params flowed into the constructor
    assert cb.counts["update_end"] == 8
