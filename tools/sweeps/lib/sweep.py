"""Sweep engine: declare hyperparams, expand grid/random combinations,
launch ``mmf_run`` jobs locally or via sbatch.

Parity surface: reference tools/sweeps/lib (__init__.py 270 LoC +
slurm.py 392 LoC). Matching capabilities, TPU-shaped:
  - run-state detection per save_dir (finished / failed / in-progress)
    with ``--resume_finished`` / ``--resume_failed`` overrides
    (reference slurm.py:127-141);
  - preemption requeue: sbatch jobs trap USR1 (sent 180 s before the
    limit via ``--signal B:USR1@180``) and ``scontrol requeue``
    themselves, with ``checkpoint.resume=true`` always set so the
    requeued job resumes from current.ckpt (slurm.py:381-392);
  - code snapshotting: ``--snapshot_code`` copies the repo's *.py into
    a timestamped dir and launches from there, so in-flight edits don't
    change queued jobs (slurm.py:49-75);
  - reproducibility dump: every launch writes sweep_meta.json (resolved
    hyperparams, full command, git commit, timestamp) into save_dir —
    the config-dump the reference keeps in train.log headers;
  - ``--sequential`` chains jobs with sbatch dependencies; ``--dep``
    seeds the first dependency (slurm.py:43-44);
  - ``--baseline_model`` copies a warm-start checkpoint to
    current.ckpt before the first launch (slurm.py:112-124).
"""

from __future__ import annotations

import argparse
import datetime
import itertools
import json
import os
import random
import shlex
import shutil
import subprocess
from glob import glob
from typing import Any, List, Optional

REQUEUE_WRAPPER = """\
trap_handler () {
  echo "Caught signal: " $1
  if [ "$1" = "TERM" ]; then
    echo "bypass sigterm"
  else
    echo "Requeuing " $SLURM_JOB_ID
    scontrol requeue $SLURM_JOB_ID
  fi
}
trap 'trap_handler USR1' USR1
trap 'trap_handler TERM' TERM
"""


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


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", action="store_true",
                        help="full grid instead of random sampling")
    parser.add_argument("--num_trials", type=int, default=8)
    parser.add_argument("--seed", type=int, default=1234)
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
    parser.add_argument("--resume_finished", action="store_true",
                        help="restart runs whose save_dir finished")
    parser.add_argument("--resume_failed", action="store_true",
                        help="resume runs whose save_dir failed")
    parser.add_argument("--sequential", action="store_true",
                        help="chain sbatch jobs with dependencies")
    parser.add_argument("--dep", type=int, default=None,
                        help="initial sbatch dependency job id")
    parser.add_argument("--time", default=None, help="sbatch time limit")
    parser.add_argument("--mem", default=None, help="sbatch memory")
    parser.add_argument("--constraint", default=None)
    parser.add_argument("--comment", default=None)
    parser.add_argument("--snapshot_code", action="store_true",
                        help="launch from a timestamped code snapshot")
    parser.add_argument("--snapshot_dir", default="slurm_snapshot_code")
    parser.add_argument("--baseline_model", default=None,
                        help="checkpoint copied to current.ckpt before "
                             "the first run")
    parser.add_argument("--tensorboard_logdir", default=None)
    parser.add_argument("extra", nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


# ---------------------------------------------------------------------------
# run-state detection (reference slurm.py:has_finished/has_failed/has_started)
# ---------------------------------------------------------------------------
def _latest_log(save_dir) -> Optional[str]:
    logs_dir = os.path.join(save_dir, "logs")
    candidates = sorted(glob(os.path.join(logs_dir, "*.log")))
    candidates += [p for p in (os.path.join(save_dir, "train.log"),)
                   if os.path.exists(p)]
    return candidates[-1] if candidates else None


def has_started(save_dir) -> bool:
    return _latest_log(save_dir) is not None


def has_finished(save_dir) -> bool:
    log = _latest_log(save_dir)
    if log is None:
        return False
    with open(log) as h:
        lines = h.readlines()
    # mmf_tpu's trainer logs "Finished run in ..." as its last line
    return bool(lines) and "Finished run" in lines[-1]


def has_failed(save_dir) -> bool:
    if not os.path.isdir(save_dir):
        return False
    stderrs = glob(os.path.join(save_dir, "train.stderr.*"))
    if not stderrs:
        return False
    # newest slurm job id wins
    def job_id(p):
        try:
            return int(p.rsplit(".", 1)[-1])
        except ValueError:
            return -1

    latest = max(stderrs, key=job_id)
    with open(latest) as h:
        return any(line.strip() for line in h)


def run_state(save_dir) -> str:
    if has_finished(save_dir):
        return "finished"
    if has_failed(save_dir):
        return "failed"
    if has_started(save_dir):
        return "started"
    return "fresh"


# ---------------------------------------------------------------------------
# code snapshot (reference slurm.py:copy_all_python_files)
# ---------------------------------------------------------------------------
def snapshot_code(source: str, snapshot_main_dir: str,
                  snapshot_hash: Optional[str] = None) -> str:
    """Copy mmf_tpu/**/*.py + tools/**/*.py + top-level *.py into
    ``snapshot_main_dir/<hash>`` so queued jobs run the code as-of-launch."""
    if snapshot_hash is None:
        snapshot_hash = datetime.datetime.now().isoformat()
    destination = os.path.join(snapshot_main_dir, snapshot_hash)
    assert not os.path.exists(destination), (
        f"code snapshot already exists: {destination}"
    )
    all_pys = (
        glob(os.path.join(source, "mmf_tpu/**/*.py"), recursive=True)
        + glob(os.path.join(source, "mmf_tpu/**/*.yaml"), recursive=True)
        + glob(os.path.join(source, "tools/**/*.py"), recursive=True)
        + glob(os.path.join(source, "*.py"))
    )
    for filepath in all_pys:
        rel = os.path.relpath(filepath, source)
        dst = os.path.join(destination, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(filepath, dst)
    return destination


def _git_commit(cwd=None) -> Optional[str]:
    try:
        return subprocess.check_output(
            ["git", "log", "-1", "--format=%H %s"], cwd=cwd,
            encoding="utf-8", stderr=subprocess.DEVNULL,
        ).strip()
    except Exception:
        return None


def _dump_meta(save_dir, grid, cli, args):
    """sweep_meta.json: the reproducibility record for this launch."""
    meta = {
        "timestamp": datetime.datetime.now().isoformat(),
        "hyperparams": {hp.name: hp.current_value for hp in grid},
        "command": cli,
        "git_commit": _git_commit(),
        "prefix": args.prefix,
        "backend": "local" if (args.local or args.backend == "local")
                   else "slurm",
    }
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "sweep_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _combinations(grid: List[hyperparam], full_grid: bool, num_trials: int,
                  seed: int = 0):
    if full_grid:
        value_lists = [hp.values for hp in grid]
        combos = list(itertools.product(*value_lists))
        random.Random(seed).shuffle(combos)  # reference shuffles the grid
        yield from combos
    else:
        rng = random.Random(seed)
        for _ in range(num_trials):
            yield tuple(rng.choice(hp.values) for hp in grid)


def _launch_slurm(args, run_name, cli, save_dir, dep):
    """Build + submit the sbatch command with requeue support. Returns
    the job id (or None under --dry_run / unparsable output)."""
    train_log = os.path.join(save_dir, "train.log")
    train_stderr = os.path.join(save_dir, "train.stderr.%j")
    wrapped = (
        REQUEUE_WRAPPER + "\n"
        + " ".join(shlex.quote(c) for c in cli)
        + " &\nwait $!"
    )
    sbatch = [
        "sbatch", f"--partition={args.partition}",
        f"--gres=gpu:{args.num_gpus}", f"--job-name={run_name}",
        "--output", train_log, "--error", train_stderr,
        "--open-mode", "append",
        "--signal", "B:USR1@180",
    ]
    if args.time:
        sbatch += ["--time", args.time]
    if args.mem:
        sbatch += ["--mem", args.mem]
    if args.constraint:
        sbatch += ["-C", args.constraint]
    if args.comment:
        sbatch += ["--comment", args.comment]
    if dep is not None:
        sbatch += ["-d", f"afterany:{dep}"]
    sbatch += ["--wrap", wrapped]
    if args.dry_run:
        print("DRY RUN:", " ".join(shlex.quote(c) for c in sbatch))
        return None
    out = subprocess.check_output(sbatch, encoding="utf-8")
    try:
        return int(out.rstrip().split()[-1])
    except (IndexError, ValueError):
        return None


def main(get_grid, postprocess_hyperparams=None, args=None):
    if args is None:
        args = get_args()
    grid = get_grid(args)

    run_root = "."
    if args.snapshot_code and not args.dry_run:
        run_root = snapshot_code(".", args.snapshot_dir)
        print(f"code snapshot: {run_root}")

    launched = 0
    dep = args.dep
    for combo in _combinations(grid, args.grid, args.num_trials, args.seed):
        for hp, value in zip(grid, combo):
            hp.current_value = value
        if postprocess_hyperparams is not None:
            postprocess_hyperparams(args, {hp.name: hp for hp in grid})

        keys = [hp.get_save_dir_key() for hp in grid]
        run_name = ".".join([args.prefix] + [k for k in keys if k])
        save_dir = os.path.join(args.checkpoints_dir, run_name)

        state = run_state(save_dir)
        if state == "finished" and not args.resume_finished:
            print(f"skip finished run (--resume_finished): {save_dir}")
            continue
        if state == "failed" and not args.resume_failed:
            print(f"skip failed run (--resume_failed): {save_dir}")
            continue
        if state == "started" and not (
            args.resume_finished or args.resume_failed
        ):
            print(f"skip in-progress run: {save_dir}")
            continue

        if args.baseline_model and not args.dry_run:
            ckpt = os.path.join(save_dir, "current.ckpt")
            if not os.path.exists(ckpt):
                if not os.path.exists(args.baseline_model):
                    raise FileNotFoundError(
                        f"baseline model not found: {args.baseline_model}"
                    )
                os.makedirs(save_dir, exist_ok=True)
                shutil.copyfile(args.baseline_model, ckpt)

        cli = ["python", "-m", "mmf_tpu.cli.run"]
        for hp in grid:
            cli += hp.get_cli_args()
        cli += [f"env.save_dir={save_dir}", "checkpoint.resume=true"]
        if args.tensorboard_logdir:
            cli += [
                "training.tensorboard=true",
                "env.tensorboard_logdir="
                + os.path.join(args.tensorboard_logdir, run_name),
            ]
        cli += list(args.extra or [])

        if not args.dry_run:
            _dump_meta(save_dir, grid, cli, args)

        if args.dry_run and not (args.local or args.backend == "local"):
            _launch_slurm(args, run_name, cli, save_dir, dep)
        elif args.dry_run:
            print("DRY RUN:", " ".join(shlex.quote(c) for c in cli))
        elif args.local or args.backend == "local":
            subprocess.check_call(cli, cwd=run_root if run_root != "." else None)
        else:
            job_id = _launch_slurm(args, run_name, cli, save_dir, dep)
            if job_id is not None:
                print(f"Launched {job_id}")
                if args.sequential:
                    dep = job_id
        launched += 1
    print(f"{'Would launch' if args.dry_run else 'Launched'} {launched} jobs")
