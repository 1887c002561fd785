"""mmf_serve end-to-end as a real subprocess: train a tiny checkpoint
through the mmf_run CLI, serve it, and exercise the HTTP surface
(predict + stats + dynamic batching)."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
USER_DIR = os.path.join(REPO, "tests", "data", "user_dir")

USER_YAML = """
model_config:
  plugin_linear:
    losses:
      - type: mse
dataset_config:
  plugin_numbers: {}
"""


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # pin 2 virtual devices (the session conftest exports 8, which the
    # tiny training batch can't split)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return env


def _wait_healthy(port, proc, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"mmf_serve exited rc={proc.returncode}:\n"
                f"{proc.stderr.read()[-3000:]}"
            )
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=2
            ) as r:
                if json.loads(r.read())["status"] == "ok":
                    return
        except (urllib.error.URLError, OSError):
            time.sleep(0.5)
    raise AssertionError("mmf_serve never became healthy")


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(USER_YAML)
    save = tmp_path / "save"
    train = subprocess.run(
        [sys.executable, "-m", "mmf_tpu.cli.run",
         f"config={cfg}", "model=plugin_linear",
         "datasets=plugin_numbers", f"env.user_dir={USER_DIR}",
         f"env.save_dir={save}", "training.max_updates=2",
         "training.max_epochs=null", "training.batch_size=4",
         "training.checkpoint_interval=2", "training.log_interval=1",
         "training.evaluation_interval=1000000",
         "training.num_workers=0", "training.seed=3",
         "optimizer.type=sgd", "optimizer.params.lr=0.01"],
        capture_output=True, text=True, timeout=420, env=_env(), cwd=REPO,
    )
    assert train.returncode == 0, train.stderr[-3000:]
    assert (save / "current.ckpt").exists()

    port = 18000 + os.getpid() % 2000
    proc = subprocess.Popen(
        [sys.executable, "-m", "mmf_tpu.cli.serve",
         f"checkpoint={save}", f"port={port}", "max_wait_ms=3",
         "max_batch_size=8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(), cwd=REPO,
    )
    try:
        _wait_healthy(port, proc)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=json.dumps({"fields": {"data": [2.0, 2.0]}}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            resp = json.loads(r.read())
        assert "scores" in resp and len(resp["scores"]) == 1
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=10
        ) as r:
            stats = json.loads(r.read())
        assert stats["batcher"]["requests"] == 1
        assert stats["engine"]["max_batch_size"] == 8
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
