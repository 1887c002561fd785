"""Logger output formats + Timer (behavioral coverage mirroring the
reference tests/utils/test_logger.py and test_timer.py — log-line formats
matter: the reference's own tests parse them)."""

import logging
import os
import time

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.logger import (
    Timer,
    calculate_time_left,
    log_progress,
    setup_logger,
    summarize_report,
)


def test_setup_logger_writes_file(tmp_path):
    log_file = str(tmp_path / "train.log")
    logger = setup_logger(output=log_file, clear_handlers=False)
    try:
        logger.info("probe writer contents")
        for h in logger.handlers:
            h.flush()
        assert os.path.exists(log_file)
        content = open(log_file).read()
        assert "probe writer contents" in content
        # the `ts | LEVEL | name : msg` line shape log parsers rely on
        assert " | INFO | mmf_tpu : probe writer contents" in content
        assert registry.get("log_file", no_warning=True) == log_file
    finally:
        for h in list(logger.handlers):
            h.close()
            logger.removeHandler(h)


def _capture_mmf_log(caplog):
    caplog.set_level(logging.INFO, logger="mmf_tpu")
    # setup_logger (possibly run by an earlier test) sets propagate=False,
    # which would hide records from caplog's root-logger handler
    logging.getLogger("mmf_tpu").propagate = True
    return caplog


def test_log_progress_simple_format(caplog):
    _capture_mmf_log(caplog)
    log_progress({"progress": "3/10", "train/total_loss": 0.5},
                 log_format="simple")
    assert "progress: 3/10, train/total_loss: 0.5" in caplog.text


def test_log_progress_json_format(caplog):
    import json

    _capture_mmf_log(caplog)
    log_progress({"progress": "3/10", "loss": 0.5}, log_format="json")
    line = [r.message for r in caplog.records][-1]
    assert json.loads(line) == {"progress": "3/10", "loss": 0.5}


def test_log_progress_non_dict_passthrough(caplog):
    _capture_mmf_log(caplog)
    log_progress("plain string")
    assert "plain string" in caplog.text


def test_summarize_report_prints_progress_and_meter(caplog):
    class FakeMeter:
        def get_scalar_dict(self):
            return {"train/total_loss": 1.25}

        def get_log_dict(self):
            return {"train/total_loss": "1.2500"}

    _capture_mmf_log(caplog)
    summarize_report(
        current_iteration=7,
        num_updates=7,
        max_updates=100,
        meter=FakeMeter(),
        extra={"lr": "0.001"},
    )
    assert "progress: 7/100" in caplog.text
    assert "train/total_loss: 1.2500" in caplog.text
    assert "lr: 0.001" in caplog.text


def test_timer_formats():
    t = Timer()
    assert t.get_time_hhmmss(gap=0) == "0 ms"
    assert t.get_time_hhmmss(gap=1500) == "01 s 500 ms"
    assert t.get_time_hhmmss(gap=3600 * 1000) == "01 h"
    assert t.get_time_hhmmss(gap=61_250) == "01 m 01 s 250 ms"


def test_timer_reset_and_since_start():
    t = Timer()
    time.sleep(0.01)
    assert t.unix_time_since_start(in_seconds=False) >= 10
    t.reset()
    assert t.unix_time_since_start(in_seconds=True) >= 1  # floored min


def test_calculate_time_left_shape():
    t = Timer()
    t.start = time.time() * 1000 - 1000  # pretend the last log took 1s
    eta = calculate_time_left(
        max_updates=100,
        num_updates=50,
        timer=t,
        num_snapshot_iterations=10,
        log_interval=10,
        eval_interval=50,
    )
    assert isinstance(eta, str) and eta  # "Ns ..." style string
    assert calculate_time_left(None, None, t, 0, 1, None) == "Unknown"
