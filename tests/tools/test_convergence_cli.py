"""Drive the convergence-demo config through the real CLI for a few
updates (shrunk MMBT, CPU): guards the full path the TPU demonstration
uses — user_dir plugin import, synth_memes builder, raw-image encoder,
fused train step, loss logging. (The full 400-update TPU run is recorded
in BENCH_NOTES.md "End-to-end convergence".)
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONV = os.path.join(REPO, "tools", "benchmarks", "convergence")


@pytest.mark.slow
def test_cli_convergence_config_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    save = tmp_path / "save"
    proc = subprocess.run(
        [
            sys.executable, "-m", "mmf_tpu.cli.run",
            f"config={CONV}/mmbt_synth.yaml",
            "model=mmbt", "datasets=synth_memes",
            f"env.user_dir={CONV}/user_dir",
            f"env.save_dir={save}",
            "run_type=train",
            "training.max_updates=2", "training.log_interval=1",
            "training.evaluation_interval=1000",
            "training.checkpoint_interval=1000",
            "training.batch_size=4", "training.num_workers=0",
            "model_config.mmbt.text_encoder.params.num_hidden_layers=2",
            "model_config.mmbt.modal_encoder="
            "{type: torchvision_resnet, params: {name: resnet18}}",
            "model_config.mmbt.modal_hidden_size=512",
            "model_config.mmbt.dtype=float32",
        ],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    logs = "".join(
        open(os.path.join(save, "logs", f)).read()
        for f in sorted(os.listdir(save / "logs"))
    )
    assert "train/synth_memes/cross_entropy" in logs
    assert "2/2" in logs
