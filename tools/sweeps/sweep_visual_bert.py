"""VisualBERT hyperparameter sweep
(parity with mmf/tools/sweeps/sweep_visual_bert.py)."""

from __future__ import annotations

from tools.sweeps.lib import hyperparam, main


def get_grid(args):
    return [
        hyperparam("model", "visual_bert"),
        hyperparam("datasets", "vqa2"),
        hyperparam("config",
                   "projects/visual_bert/configs/vqa2/defaults.yaml"),
        hyperparam("training.batch_size", [512, 256],
                   save_dir_key=lambda v: f"bs{v}"),
        hyperparam("optimizer.params.lr", [5e-5, 1e-5],
                   save_dir_key=lambda v: f"lr{v}"),
        hyperparam("training.max_updates", [22000, 44000],
                   save_dir_key=lambda v: f"mu{v}"),
        hyperparam("scheduler.params.num_warmup_steps", 2000),
    ]


def postprocess_hyperparams(args, config):
    pass


if __name__ == "__main__":
    main(get_grid, postprocess_hyperparams)
