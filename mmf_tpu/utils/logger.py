"""Logging: rank-0 console + per-rank file handlers, progress summaries,
TensorBoard/W&B sinks (parity with mmf/utils/logger.py).

Log-line formats (json/simple) are kept exactly — reference tests parse
them (tests/test_utils.py `search_log`)."""

from __future__ import annotations

import base64
import functools
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional, Union

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.distributed import get_rank, is_main


def setup_logger(
    output: Optional[str] = None,
    color: bool = True,
    name: str = "mmf_tpu",
    disable: bool = False,
    clear_handlers: bool = True,
    *args,
    **kwargs,
):
    """Initialize the mmf_tpu logger: stdout on rank 0, a file handler on
    every rank (reference logger.py:58-168)."""
    if disable:
        return None
    logger = logging.getLogger(name)
    logger.propagate = False

    logging.captureWarnings(True)
    warnings_logger = logging.getLogger("py.warnings")

    plain_formatter = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s : %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
    )

    distributed_rank = get_rank()
    handlers = []

    config = registry.get("config", no_warning=True)
    if config:
        logging_level = config.get("training", {}).get("logger_level", "info")
    else:
        logging_level = "info"
    logging_level = getattr(logging, logging_level.upper(), logging.INFO)

    if distributed_rank == 0:
        logger.setLevel(logging_level)
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging_level)
        formatter = plain_formatter
        ch.setFormatter(formatter)
        logger.addHandler(ch)
        warnings_logger.addHandler(ch)
        handlers.append(ch)

    # file logging on all ranks
    if output is None:
        try:
            from mmf_tpu.config.configuration import get_mmf_env

            output = get_mmf_env(key="log_dir")
        except Exception:
            output = None
    if output:
        if output.endswith(".txt") or output.endswith(".log"):
            filename = output
        else:
            filename = os.path.join(
                output, f"train_{time.strftime('%Y_%m_%dT%H_%M_%S')}.log"
            )
        if distributed_rank > 0:
            filename = f"{filename}.rank{distributed_rank}"
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging_level)
        fh.setFormatter(plain_formatter)
        logger.addHandler(fh)
        warnings_logger.addHandler(fh)
        handlers.append(fh)
        registry.register("log_file", filename)

    registry.register("writer", logger)
    return logger


def calculate_time_left(
    max_updates: int,
    num_updates: int,
    timer,
    num_snapshot_iterations: int,
    log_interval: int,
    eval_interval: Optional[int],
):
    """ETA string (reference logger.py:255-276)."""
    if num_updates is None or max_updates is None:
        return "Unknown"
    time_taken_for_log = time.time() * 1000 - timer.start
    iterations_left = max_updates - num_updates
    num_logs_left = iterations_left / log_interval
    time_left = num_logs_left * time_taken_for_log

    if eval_interval:
        snapshot_iteration = num_snapshot_iterations / log_interval
        snapshot_iteration *= iterations_left / eval_interval
        time_left += snapshot_iteration * time_taken_for_log

    return timer.get_time_hhmmss(gap=time_left)


def summarize_report(
    current_iteration,
    num_updates,
    max_updates,
    meter,
    should_print: bool = True,
    extra: Optional[Dict[str, Any]] = None,
    tb_writer=None,
    wandb_logger=None,
):
    """Console + TB + wandb summary (reference logger.py:214-252)."""
    if extra is None:
        extra = {}
    if not is_main():
        return

    if tb_writer:
        scalar_dict = meter.get_scalar_dict()
        tb_writer.add_scalars(scalar_dict, current_iteration)

    if wandb_logger:
        metrics = meter.get_scalar_dict()
        metrics.update({"trainer/global_step": current_iteration})
        wandb_logger.log_metrics(metrics)

    if not should_print:
        return
    log_dict = {}
    if num_updates is not None and max_updates is not None:
        log_dict.update({"progress": f"{num_updates}/{max_updates}"})
    log_dict.update(meter.get_log_dict())
    log_dict.update(extra)
    log_progress(log_dict)


def log_progress(info: Union[Dict, Any], log_format: Optional[str] = None):
    """Log progress as json or simple key/value line
    (reference logger.py:279-307)."""
    logger = logging.getLogger("mmf_tpu")
    if not isinstance(info, dict):
        logger.info(info)
        return

    if log_format is None:
        config = registry.get("config", no_warning=True)
        log_format = (
            config.get("training", {}).get("log_format", "simple")
            if config
            else "simple"
        )

    if log_format == "simple":
        output = ", ".join([f"{key}: {value}" for key, value in info.items()])
    elif log_format == "json":
        output = json.dumps(info)
    else:
        output = str(info)
    logger.info(output)


def log_class_usage(component_type, klass):
    identifier = "mmf_tpu"
    if klass and hasattr(klass, "__name__"):
        identifier += f".{component_type}.{klass.__name__}"
    logging.getLogger(identifier).debug(f"Instantiating {identifier}")


def skip_if_tensorboard_inactive(fn):
    @functools.wraps(fn)
    def wrapped(self, *args, **kwargs):
        if self.summary_writer is None or not self._is_main:
            return None
        return fn(self, *args, **kwargs)

    return wrapped


class TensorboardLogger:
    """(reference logger.py:352-398)"""

    def __init__(self, log_folder="./logs", iteration=0):
        self.summary_writer = None
        self._is_main = is_main()
        self.timer = Timer()
        self.log_folder = log_folder
        if self._is_main:
            current_time = self.timer.get_time_hhmmss(None, format=self.timer.DEFAULT)
            tb_folder = os.path.join(self.log_folder, f"tensorboard_{current_time}")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.summary_writer = SummaryWriter(tb_folder)
            except Exception:
                try:
                    from tensorboardX import SummaryWriter

                    self.summary_writer = SummaryWriter(tb_folder)
                except Exception:
                    self.summary_writer = None

    def __del__(self):
        self.close()

    def close(self):
        if getattr(self, "summary_writer", None) is not None:
            self.summary_writer.close()
            self.summary_writer = None

    @skip_if_tensorboard_inactive
    def add_text(self, tag, text, step):
        self.summary_writer.add_text(tag, text, step)

    @skip_if_tensorboard_inactive
    def add_scalar(self, tag, value, step):
        self.summary_writer.add_scalar(tag, value, step)

    @skip_if_tensorboard_inactive
    def add_scalars(self, scalar_dict, step):
        for key, val in scalar_dict.items():
            self.summary_writer.add_scalar(key, val, step)

    @skip_if_tensorboard_inactive
    def flush(self):
        self.summary_writer.flush()


class WandbLogger:
    """(reference logger.py:401-493)"""

    def __init__(self, entity=None, config=None, project=None):
        self._wandb = None
        self._is_main = is_main()
        if not self._is_main:
            return
        try:
            import wandb

            self._wandb = wandb
        except ImportError:
            return
        self._wandb_init = dict(entity=entity, config=config, project=project)
        if config is not None:
            wandb_cfg = dict(config.get("training", {}).get("wandb", {}) or {})
            wandb_cfg.pop("enabled", None)
            wandb_cfg.pop("log_checkpoint", None)
            if "entity" not in wandb_cfg:
                wandb_cfg["entity"] = entity
            wandb_cfg["project"] = wandb_cfg.get("project", project)
            self._wandb_init.update(**wandb_cfg)
        self.setup()

    def setup(self):
        if self._wandb is None:
            return
        if self._wandb.run is None:
            self._wandb.init(**self._wandb_init)
        if getattr(self._wandb, "define_metric", None):
            self._wandb.define_metric("trainer/global_step")
            self._wandb.define_metric(
                "*", step_metric="trainer/global_step", step_sync=True
            )

    def __del__(self):
        if getattr(self, "_wandb", None) is not None and self._wandb.run:
            self._wandb.finish()

    def _should_log_wandb(self):
        return self._wandb is not None and self._is_main

    def log_metrics(self, metrics: Dict[str, float], commit=True):
        if not self._should_log_wandb():
            return
        self._wandb.log(metrics, commit=commit)

    def log_model_checkpoint(self, model_path, **kwargs):
        if not self._should_log_wandb():
            return
        model_artifact = self._wandb.Artifact(
            "run_" + self._wandb.run.id + "_model", type="model", **kwargs
        )
        model_artifact.add_file(model_path, name="current.ckpt")
        self._wandb.log_artifact(model_artifact, aliases=["latest"])


class Timer:
    """(reference utils/timer.py)"""

    DEFAULT_TIME_FORMAT_DATE_TIME = "%Y/%m/%d %H:%M:%S"
    DEFAULT_TIME_FORMAT = ["%03d ms", "%02d s", "%02d m", "%02d h"]
    DEFAULT = "%Y_%m_%dT%H_%M_%S"

    def __init__(self):
        self.start = time.time() * 1000

    def get_current(self):
        return self.get_time_hhmmss(self.start)

    def reset(self):
        self.start = time.time() * 1000

    def get_time_since_start(self, format=None):
        return self.get_time_hhmmss(self.start, format)

    def unix_time_since_start(self, in_seconds=True):
        gap = time.time() * 1000 - self.start
        if in_seconds:
            gap = gap // 1000
        return max(gap, 1)

    def get_time_hhmmss(self, start=None, end=None, gap=None, format=None):
        if start is None and gap is None:
            if format is None:
                format = self.DEFAULT_TIME_FORMAT_DATE_TIME
            return time.strftime(format)

        if end is None:
            end = time.time() * 1000
        if gap is None:
            gap = end - start

        s, ms = divmod(gap, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)

        if format is None:
            format = self.DEFAULT_TIME_FORMAT
        items = [ms, s, m, h]
        assert len(items) == len(format), "Format length should be same as items"
        time_str = ""
        for idx, item in enumerate(items):
            if item != 0:
                time_str = format[idx] % item + " " + time_str
        if len(time_str) == 0:
            time_str = "0 ms"
        return time_str.strip()
