"""End-to-end CLI integration: drive ``python -m mmf_tpu.cli.run`` as a
real subprocess — the reference's primary user surface (mmf_cli/run.py:69,
``mmf_run config=... model=... dataset=...``) — through train, resume,
and val, using the env.user_dir plugin's model+dataset.

Covers at once: flags/dotlist parsing, Configuration precedence with a
user yaml, user_dir plugin import, trainer.load/train, checkpoint
write+resume, run-folder layout, and log-file contents.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
USER_DIR = os.path.join(REPO, "tests", "data", "user_dir")

USER_YAML = """
model_config:
  plugin_linear:
    losses:
      - type: mse
dataset_config:
  plugin_numbers: {}
"""


def _run_cli(tmp_path, *extra_opts, timeout=420):
    cfg = tmp_path / "cli_test.yaml"
    if not cfg.exists():
        cfg.write_text(USER_YAML)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Pin PYTHONPATH to the repo alone: the image's sitecustomize (on the
    # inherited PYTHONPATH) registers a remote TPU backend and overrides
    # jax_platforms, which would silently run this "CPU" subprocess over
    # the device tunnel with ~50s remote compiles.
    env["PYTHONPATH"] = REPO
    # 2 virtual CPU devices: the CLI run exercises real dp=2 SPMD sharding.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    opts = [
        f"config={cfg}",
        "model=plugin_linear",
        "datasets=plugin_numbers",
        f"env.user_dir={USER_DIR}",
        f"env.save_dir={tmp_path / 'save'}",
        "training.max_updates=4",
        "training.max_epochs=null",
        "training.batch_size=4",
        "training.log_interval=2",
        "training.checkpoint_interval=2",
        "training.evaluation_interval=1000000",
        "training.num_workers=0",
        "training.seed=2",
        "optimizer.type=sgd",
        "optimizer.params.lr=0.01",
        *extra_opts,
    ]
    proc = subprocess.run(
        [sys.executable, "-m", "mmf_tpu.cli.run"] + opts,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"CLI failed rc={proc.returncode}\n--- stdout:\n{proc.stdout[-4000:]}"
        f"\n--- stderr:\n{proc.stderr[-4000:]}"
    )
    return proc


def _read_logs(tmp_path):
    log_dir = tmp_path / "save" / "logs"
    assert log_dir.is_dir(), "run folder must contain logs/"
    return "".join(
        open(os.path.join(log_dir, f)).read() for f in sorted(os.listdir(log_dir))
    )


@pytest.mark.slow
def test_cli_train_resume_val(tmp_path):
    # --- 1. train 4 updates ------------------------------------------
    _run_cli(tmp_path, "run_type=train")
    save = tmp_path / "save"
    assert (save / "current.ckpt").exists(), "rolling resume target written"
    assert (save / "config.yaml").exists(), "config snapshot written"
    assert (save / "models").is_dir(), "interval checkpoints written"
    assert any((save / "models").iterdir()), "checkpoint_interval=2 saved models"
    logs = _read_logs(tmp_path)
    assert "progress" in logs and "4/4" in logs

    # --- 2. resume to 6 updates --------------------------------------
    _run_cli(
        tmp_path, "run_type=train", "checkpoint.resume=true",
        "training.max_updates=6",
    )
    logs = _read_logs(tmp_path)
    assert "Loading checkpoint from" in logs, "resume picked up current.ckpt"
    assert "6/6" in logs, "training continued to the new max_updates"
    # resumed from update 4 rather than restarting: no fresh 2/6 line
    assert "2/6" not in logs

    # --- 3. val run over the trained checkpoint ----------------------
    _run_cli(
        tmp_path, "run_type=val", "checkpoint.resume=true",
        "training.max_updates=6",
    )
    logs = _read_logs(tmp_path)
    assert "val/plugin_numbers/mse" in logs or "val/total_loss" in logs


@pytest.mark.slow
def test_cli_predict_report(tmp_path):
    """mmf_predict (reference mmf_cli/predict.py): run_type=test with
    evaluation.predict=true must dump a prediction report under
    env.report_dir assembled from the dataset's format_for_prediction."""
    import json

    _run_cli(tmp_path, "run_type=train", "training.max_updates=2")

    cfg = tmp_path / "cli_test.yaml"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    report_dir = tmp_path / "reports"
    opts = [
        f"config={cfg}",
        "model=plugin_linear",
        "datasets=plugin_numbers",
        f"env.user_dir={USER_DIR}",
        f"env.save_dir={tmp_path / 'save'}",
        f"env.report_dir={report_dir}",
        "run_type=test",
        "checkpoint.resume=true",
        "training.batch_size=4",
        "training.num_workers=0",
        "optimizer.type=sgd",
        "optimizer.params.lr=0.01",
    ]
    proc = subprocess.run(
        [sys.executable, "-m", "mmf_tpu.cli.predict"] + opts,
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"predict failed rc={proc.returncode}\n--- stdout:\n"
        f"{proc.stdout[-4000:]}\n--- stderr:\n{proc.stderr[-4000:]}"
    )
    files = list(report_dir.rglob("*.json")) + list(report_dir.rglob("*.csv"))
    assert files, f"no report written under {report_dir}"
    f = [p for p in files if p.suffix == ".json"] or files
    entries = json.load(open(f[0])) if f[0].suffix == ".json" else None
    if entries is not None:
        assert len(entries) == 16, len(entries)
        ids = sorted(e["id"] for e in entries)
        assert ids == list(range(16)), ids
        assert all(isinstance(e["answer"], float) for e in entries)
