"""LR scheduler callback (parity with
mmf/trainers/callbacks/lr_scheduler.py:7-26).

In this framework the schedule is an optax transform inside the jitted
update (no host-side .step()), so this callback only tracks the current lr
for logging."""

from __future__ import annotations

from mmf_tpu.trainers.callbacks.base import Callback


class LRSchedulerCallback(Callback):
    def __init__(self, config, trainer):
        super().__init__(config, trainer)
        self._scheduler = None
        if self.training_config.get("lr_scheduler", False) or config.get(
            "scheduler", {}
        ):
            from mmf_tpu.modules.schedulers import build_scheduler

            self._scheduler = build_scheduler(config)

    def on_update_end(self, **kwargs):
        if self._scheduler is not None:
            base_lr = (
                (self.config.get("optimizer", {}) or {})
                .get("params", {})
                .get("lr", 0.0)
            )
            mult = float(self._scheduler(self.trainer.num_updates))
            try:
                # YAML 1.1 parses bare '5e-5' as a string
                base_lr = float(base_lr)
            except (TypeError, ValueError):
                base_lr = 0.0
            self.trainer.current_lr = base_lr * mult
