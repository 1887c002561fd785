"""Trainer profiling: debug timing points + XLA trace annotations.

Parity with the reference's TrainerProfilingMixin
(mmf/trainers/core/profiling.py:14-23), which logs elapsed-time
checkpoints ("Batch load time", "Batch prepare time", "Forward time",
"Backward time", "Finished update") at logger_level=debug from call sites
in training_loop.py:89,196,203,213,234.

TPU-native additions:
  - forward/backward/update are FUSED inside one jitted step here, so the
    per-phase names become "Batch load time", "Batch prepare time",
    "Step dispatch time" (async dispatch of the fused fwd+bwd+update) and
    "Finished update";
  - ``trace(name)`` wraps host phases in ``jax.profiler.TraceAnnotation``
    so they show up on the TensorBoard/XProf timeline next to the device
    ops when a profiler session is active;
  - ``start_profiler``/``stop_profiler`` capture an XProf trace of the hot
    loop (``training.profile_dir`` knob) — the TPU analog of the
    reference's debug timers, but with device-side visibility.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import jax

from mmf_tpu.utils.logger import Timer

logger = logging.getLogger("mmf_tpu")


class TrainerProfilingMixin:
    profiler: Timer = None
    _profiler_active: bool = False

    def profile(self, text: str) -> None:
        """Log elapsed time since the previous profile point (debug only)."""
        if logger.getEffectiveLevel() > logging.DEBUG:
            return
        if self.profiler is None:
            self.profiler = Timer()
        logger.debug(f"{text}: {self.profiler.get_time_since_start()}")
        self.profiler.reset()

    @contextlib.contextmanager
    def trace(self, name: str):
        """Annotate a host-side phase on the XLA profiler timeline."""
        with jax.profiler.TraceAnnotation(name):
            yield

    def start_profiler(self, profile_dir: Optional[str] = None) -> None:
        """Begin an XProf capture (viewable in TensorBoard's profile tab)."""
        if self._profiler_active:
            return
        profile_dir = profile_dir or self.training_config.get(
            "profile_dir", None
        )
        if not profile_dir:
            return
        jax.profiler.start_trace(profile_dir)
        self._profiler_active = True
        logger.info(f"XProf trace capturing to {profile_dir}")

    def stop_profiler(self) -> None:
        if self._profiler_active:
            jax.profiler.stop_trace()
            self._profiler_active = False
            logger.info("XProf trace capture stopped")
