"""Timer utility (parity with mmf/utils/timer.py); canonical implementation
lives in mmf_tpu.utils.logger to avoid a cycle."""

from mmf_tpu.utils.logger import Timer  # noqa: F401
