"""LR scheduler callback (parity with
mmf/trainers/callbacks/lr_scheduler.py:7-26).

In this framework the schedule is an optax transform inside the jitted
update (no host-side .step()), so this callback only tracks the current lr
for logging. It reads the trainer's OWN schedule function (built once in
load_optimizer) instead of constructing a second one that would have to
stay in sync."""

from __future__ import annotations

from mmf_tpu.trainers.callbacks.base import Callback


class LRSchedulerCallback(Callback):
    def __init__(self, config, trainer):
        super().__init__(config, trainer)
        base_lr = (
            (self.config.get("optimizer", {}) or {})
            .get("params", {})
            .get("lr", 0.0)
        )
        try:
            # YAML 1.1 parses bare '5e-5' as a string
            self._base_lr = float(base_lr)
        except (TypeError, ValueError):
            self._base_lr = 0.0

    def on_update_end(self, **kwargs):
        schedule_fn = getattr(self.trainer, "_schedule_fn", None)
        if schedule_fn is not None:
            mult = float(schedule_fn(self.trainer.num_updates))
            self.trainer.current_lr = self._base_lr * mult
