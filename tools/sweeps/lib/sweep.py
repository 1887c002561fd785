"""Sweep engine: declare hyperparams, expand grid/random combinations,
launch `mmf_run` jobs locally or via sbatch
(parity with mmf/tools/sweeps/lib)."""

from __future__ import annotations

import argparse
import itertools
import os
import random
import shlex
import subprocess
from typing import Any, List, Optional


class hyperparam:
    """One swept dimension: config key + candidate values."""

    def __init__(self, name: str, values: Any = None,
                 binary_flag: bool = False, save_dir_key=None):
        self.name = name
        if values is None:
            values = [True] if binary_flag else []
        if not isinstance(values, (list, tuple)):
            values = [values]
        self.values = list(values)
        self.binary_flag = binary_flag
        self.save_dir_key = save_dir_key
        self.current_value = None

    def get_cli_args(self) -> List[str]:
        if self.binary_flag:
            return [self.name] if self.current_value else []
        return [f"{self.name}={self.current_value}"]

    def get_save_dir_key(self):
        if self.save_dir_key is None or self.current_value is None:
            return None
        return self.save_dir_key(self.current_value)


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", action="store_true",
                        help="full grid instead of random sampling")
    parser.add_argument("--num_trials", type=int, default=8)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--local", action="store_true",
                        help="run locally instead of sbatch")
    parser.add_argument("--checkpoints_dir", default="./sweep_save")
    parser.add_argument("--prefix", default="sweep")
    parser.add_argument("--partition", default="learnfair")
    parser.add_argument("--num_gpus", type=int, default=8,
                        help="slurm resources per job (TPU hosts here)")
    parser.add_argument("--backend", default="slurm",
                        choices=["slurm", "local"])
    parser.add_argument("extra", nargs=argparse.REMAINDER)
    return parser.parse_args()


def _combinations(grid: List[hyperparam], full_grid: bool, num_trials: int,
                  seed: int = 0):
    if full_grid:
        value_lists = [hp.values for hp in grid]
        for combo in itertools.product(*value_lists):
            yield combo
    else:
        rng = random.Random(seed)
        for _ in range(num_trials):
            yield tuple(rng.choice(hp.values) for hp in grid)


def main(get_grid, postprocess_hyperparams=None, args=None):
    if args is None:
        args = get_args()
    grid = get_grid(args)

    launched = 0
    for combo in _combinations(grid, args.grid, args.num_trials):
        for hp, value in zip(grid, combo):
            hp.current_value = value
        if postprocess_hyperparams is not None:
            postprocess_hyperparams(args, {hp.name: hp for hp in grid})

        keys = [hp.get_save_dir_key() for hp in grid]
        run_name = ".".join([args.prefix] + [k for k in keys if k])
        save_dir = os.path.join(args.checkpoints_dir, run_name)

        cli = ["python", "-m", "mmf_tpu.cli.run"]
        for hp in grid:
            cli += hp.get_cli_args()
        cli += [f"env.save_dir={save_dir}"]
        cli += list(args.extra or [])

        if args.dry_run:
            print("DRY RUN:", " ".join(shlex.quote(c) for c in cli))
        elif args.local or args.backend == "local":
            subprocess.check_call(cli)
        else:
            sbatch = [
                "sbatch", f"--partition={args.partition}",
                f"--gres=gpu:{args.num_gpus}", f"--job-name={run_name}",
                "--wrap", " ".join(shlex.quote(c) for c in cli),
            ]
            subprocess.check_call(sbatch)
        launched += 1
    print(f"{'Would launch' if args.dry_run else 'Launched'} {launched} jobs")
