"""Hyperparameter sweep library (parity with mmf/tools/sweeps/lib):
fairseq-style grid/random sweeps launched over SLURM or locally."""

from tools.sweeps.lib.sweep import hyperparam, main  # noqa: F401
