"""Sweep-lib depth (reference tools/sweeps/lib + slurm.py): run-state
detection, resume flags, code snapshotting, reproducibility dump,
sequential dependency chaining, requeue wrapper."""

import json
import os
import subprocess
import sys

import pytest

from tools.sweeps.lib import sweep
from tools.sweeps.lib.sweep import (
    get_args,
    has_failed,
    has_finished,
    hyperparam,
    main,
    run_state,
    snapshot_code,
)


def _grid(args):
    return [
        hyperparam("model", "visual_bert"),
        hyperparam("optimizer.params.lr", [1e-5, 5e-5],
                   save_dir_key=lambda v: f"lr{v}"),
        hyperparam("training.batch_size", [8],
                   save_dir_key=lambda v: f"bs{v}"),
    ]


def _args(tmp_path, *extra):
    return get_args([
        "--grid", "--dry_run",
        "--checkpoints_dir", str(tmp_path),
        "--prefix", "t", *extra,
    ])


def test_run_state_detection(tmp_path):
    d = tmp_path / "run"
    assert run_state(str(d)) == "fresh"
    logs = d / "logs"
    logs.mkdir(parents=True)
    (logs / "train_2026.log").write_text("progress: 1/4 ...\n")
    assert run_state(str(d)) == "started"
    (logs / "train_2026.log").write_text(
        "progress: 4/4 ...\nFinished run in 01 m 25 s\n"
    )
    assert run_state(str(d)) == "finished"
    assert has_finished(str(d))
    # a newer slurm stderr with content marks the run failed
    (logs / "train_2026.log").write_text("progress: 1/4 ...\n")
    (d / "train.stderr.17").write_text("Traceback (most recent call last)\n")
    assert has_failed(str(d))
    assert run_state(str(d)) == "failed"
    # empty stderr is NOT a failure (slurm always creates the file)
    (d / "train.stderr.19").write_text("")
    assert not has_failed(str(d))


def test_dry_run_emits_sbatch_with_requeue(tmp_path, capsys):
    main(_grid, args=_args(tmp_path))
    out = capsys.readouterr().out
    assert out.count("DRY RUN:") == 2  # 2 lr values x 1 bs
    assert "sbatch" in out
    assert "--signal B:USR1@180" in out
    assert "scontrol requeue" in out
    assert "checkpoint.resume=true" in out


def test_local_launch_writes_meta_and_resumes(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(
        subprocess, "check_call", lambda cli, **kw: calls.append(cli)
    )
    args = get_args([
        "--grid", "--local",
        "--checkpoints_dir", str(tmp_path), "--prefix", "t",
    ])
    main(_grid, args=args)
    assert len(calls) == 2
    # reproducibility dump exists and records resolved values + command
    metas = sorted(tmp_path.glob("*/sweep_meta.json"))
    assert len(metas) == 2
    meta = json.loads(metas[0].read_text())
    assert meta["hyperparams"]["model"] == "visual_bert"
    assert meta["hyperparams"]["optimizer.params.lr"] in (1e-5, 5e-5)
    assert any("env.save_dir=" in c for c in meta["command"])
    assert "checkpoint.resume=true" in meta["command"]


def test_finished_runs_skipped_unless_resume(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(
        subprocess, "check_call", lambda cli, **kw: calls.append(cli)
    )
    # mark one of the two combos finished
    done = tmp_path / "t.lr1e-05.bs8" / "logs"
    done.mkdir(parents=True)
    (done / "x.log").write_text("Finished run in 5 s\n")
    args = get_args([
        "--grid", "--local",
        "--checkpoints_dir", str(tmp_path), "--prefix", "t",
    ])
    main(_grid, args=args)
    assert len(calls) == 1  # only the fresh combo launched
    calls.clear()
    args = get_args([
        "--grid", "--local", "--resume_finished", "--resume_failed",
        "--checkpoints_dir", str(tmp_path), "--prefix", "t",
    ])
    main(_grid, args=args)
    assert len(calls) == 2


def test_sequential_chains_dependencies(tmp_path, monkeypatch):
    submitted = []

    def fake_launch(args, run_name, cli, save_dir, dep):
        submitted.append(dep)
        return 100 + len(submitted)

    monkeypatch.setattr(sweep, "_launch_slurm", fake_launch)
    args = get_args([
        "--grid", "--sequential", "--dep", "42",
        "--checkpoints_dir", str(tmp_path), "--prefix", "t",
    ])
    main(_grid, args=args)
    assert submitted == [42, 101]  # each job depends on the previous


def test_snapshot_code(tmp_path):
    src = tmp_path / "src"
    (src / "mmf_tpu" / "models").mkdir(parents=True)
    (src / "tools").mkdir()
    (src / "mmf_tpu" / "models" / "m.py").write_text("x = 1\n")
    (src / "tools" / "t.py").write_text("y = 2\n")
    (src / "setup.py").write_text("z = 3\n")
    (src / "mmf_tpu" / "ignored.txt").write_text("not python")
    dst = snapshot_code(str(src), str(tmp_path / "snap"), "h1")
    assert os.path.exists(os.path.join(dst, "mmf_tpu/models/m.py"))
    assert os.path.exists(os.path.join(dst, "tools/t.py"))
    assert os.path.exists(os.path.join(dst, "setup.py"))
    assert not os.path.exists(os.path.join(dst, "mmf_tpu/ignored.txt"))
    with pytest.raises(AssertionError):
        snapshot_code(str(src), str(tmp_path / "snap"), "h1")


def test_baseline_model_copied(tmp_path, monkeypatch):
    monkeypatch.setattr(subprocess, "check_call", lambda cli, **kw: None)
    baseline = tmp_path / "base.ckpt"
    baseline.write_bytes(b"ckpt")
    args = get_args([
        "--grid", "--local", "--baseline_model", str(baseline),
        "--checkpoints_dir", str(tmp_path), "--prefix", "t",
    ])
    main(_grid, args=args)
    copies = sorted(tmp_path.glob("t.*/current.ckpt"))
    assert len(copies) == 2
    assert copies[0].read_bytes() == b"ckpt"
